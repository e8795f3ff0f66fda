#!/usr/bin/env python
"""The analysis layer end-to-end: FastQC-style panels, trimming, k-mers,
and local alignment over one FASTQ source — everything beyond the
reference parser that the TPU compute layer adds.

Pipeline: synthetic FASTQ (with planted adapter + duplicates) -> QCModel
with all panels on -> zero-copy quality trim -> k-mer spectrum before/after
trim -> Smith-Waterman local alignment against the adapter.

Usage: python examples/analysis_panels.py [num_reads]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import blazeseq_tpu as bt

NUM_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
ADAPTER = b"AGATCGGAAGAG"


def build_corpus(n):
    rng = np.random.default_rng(7)
    recs = []
    for i in range(n):
        s = bytes(rng.choice(list(b"ACGT"), 80).astype(np.uint8))
        if i % 5 == 0:  # plant the adapter in 20% of reads
            p = int(rng.integers(10, 80 - len(ADAPTER)))
            s = s[:p] + ADAPTER + s[p + len(ADAPTER):]
        if i % 50 == 0:  # plant exact duplicates (2%)
            s = b"ACGT" * 20
        q = bytes((rng.integers(35, 74, 80)).astype(np.uint8))
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, s, q))
    return b"".join(recs)


def main():
    import jax.numpy as jnp

    from blazeseq_tpu.models import NWAligner, QCModel
    from blazeseq_tpu.ops import bwa_trim, kmer_counts

    buf = build_corpus(NUM_READS)

    # 1. full QC with every panel on
    qc = QCModel(quality_schema="sanger", adapters=[ADAPTER],
                 track_duplicates=True)
    report = qc.run_parser(bt.FastqParser(bt.MemoryReader(buf)))
    print(report)
    ad = report.adapter_stats[ADAPTER]
    print("adapter hit rate : %.1f%%" % (100 * ad.cumulative_fraction()[-1]))
    print("unique reads     : %.1f%%" % (100 * report.frac_unique_reads))
    print("dup levels 1..10+:", report.duplication_levels[1:].tolist())
    for s, c in report.overrepresented[:3]:
        print("overrepresented (%dx): %s..." % (c, s[:40].decode()))

    # 2. zero-copy trimming: new lengths only, then re-run k-mer spectrum
    pb = bt.FastqParser(bt.MemoryReader(buf)).next_padded(
        1 << 16, max_len=128)
    seq = jnp.asarray(np.asarray(pb.seq))
    qual = jnp.asarray(np.asarray(pb.qual))
    lens = jnp.asarray(np.asarray(pb.lengths), jnp.int32)
    trimmed = bwa_trim(qual, lens, jnp.int32(33), jnp.int32(20))
    k_before = np.asarray(kmer_counts(seq, lens, jnp.int32(pb.n_records),
                                      k=4), np.int64)
    k_after = np.asarray(kmer_counts(seq, trimmed, jnp.int32(pb.n_records),
                                     k=4), np.int64)
    print("4-mers before/after trim: %d -> %d windows"
          % (k_before.sum(), k_after.sum()))

    # 3. local alignment of every read against the adapter (scores ~= 12
    # for reads that contain it, lower otherwise)
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(4096)
    scores = NWAligner(ADAPTER, mode="local").score_batch(batch)
    frac = float((scores >= len(ADAPTER)).mean())
    print("reads with full-score local adapter hit: %.1f%%" % (100 * frac))


if __name__ == "__main__":
    main()
