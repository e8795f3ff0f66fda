#!/usr/bin/env python
"""Batched Needleman-Wunsch on TPU — end-to-end flagship example
(≡ reference examples/nw_gpu/: synthetic reads -> SoA batches -> device ->
batched global-alignment DP -> scores -> CPU-twin verification,
examples/nw_gpu/main.mojo:36-87).

The reference runs 1M x 40bp reads against a 40bp reference with one GPU
block per read; here the TPU formulation is an anti-diagonal wavefront over
padded [batch, Lq] SoA tensors (blazeseq_tpu/ops/nw.py).

Usage: python examples/nw_tpu.py [num_reads] [read_len] [batch_size]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import blazeseq_tpu as bt
from blazeseq_tpu.models import NWAligner

NUM_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
READ_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 40
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 65_536
REFERENCE = b"GATTACAGATTACAGATTACAGATTACAGATTACAGATTA"[:READ_LEN]


def main():
    import jax

    print("Generating %d x %dbp synthetic reads..." % (NUM_READS, READ_LEN))
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        NUM_READS, READ_LEN, READ_LEN, 2, 40, "sanger"))
    print("Corpus: %.1f MB. Device: %s" % (len(buf) / 1e6, jax.devices()[0]))

    aligner = NWAligner(REFERENCE, max_query_len=max(READ_LEN, 64))

    # -- device pass ---------------------------------------------------------
    parser = bt.FastqParser(bt.MemoryReader(buf))
    t0 = time.perf_counter()
    device_scores = []
    for pb in parser.padded_batches(BATCH, max_len=max(READ_LEN, 64),
                                    pad_records_to=BATCH):
        device_scores.append(aligner.score_padded(pb))
    device_scores = np.concatenate(device_scores)
    t_dev = time.perf_counter() - t0
    print("TPU: %d alignments in %.3fs (%.2fM alignments/s)"
          % (len(device_scores), t_dev, len(device_scores) / t_dev / 1e6))

    # -- CPU twin on a sample (full CPU pass at 1M reads takes minutes) ------
    sample_n = min(NUM_READS, 2000)
    batch = bt.FastqParser(bt.MemoryReader(buf)).next_batch(sample_n)
    t0 = time.perf_counter()
    cpu_scores = aligner.score_cpu(batch)
    t_cpu = time.perf_counter() - t0
    cpu_rate = sample_n / t_cpu
    print("CPU twin: %d alignments in %.3fs (%.3fM alignments/s)"
          % (sample_n, t_cpu, cpu_rate / 1e6))
    est_cpu_total = NUM_READS / cpu_rate
    print("Estimated CPU time for all reads: %.1fs -> TPU speedup ~%.1fx"
          % (est_cpu_total, est_cpu_total / t_dev))

    # -- score equality (the reference's acceptance check) -------------------
    if np.array_equal(device_scores[:sample_n], cpu_scores):
        print("Scores match between TPU and CPU ✔")
        return 0
    print("SCORE MISMATCH between TPU and CPU ✘")
    return 1


if __name__ == "__main__":
    sys.exit(main())
