#!/usr/bin/env python
"""Headline benchmark: end-to-end FASTQ parse + validate throughput per chip.

Pipeline measured (the BASELINE.json "parse+validate" config): in-memory
synthetic FASTQ corpus (same generator model as the reference,
benchmark/README.md conventions) -> host bulk boundary scan with fused
structure+ASCII+quality validation -> padded SoA batches -> device upload ->
fused on-device validate/decode/QC step -> block_until_ready.

Prints exactly one JSON line:
  {"metric": ..., "value": GB/s, "unit": "GB/s", "vs_baseline": ratio}

vs_baseline is against the reference's single-core views-mode throughput with
full (ascii+quality) validation: 4.29 GB/s (BASELINE.md; reference
assets/throughput_validation_gbps.png).

Env knobs: BENCH_SIZE_MB (default 1024), BENCH_BATCH (default 4096),
BENCH_READ_LEN (default 100), BENCH_REPS (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_GBPS = 4.29  # reference views + ascii + quality validation


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import blazeseq_tpu as bt
    from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
    from blazeseq_tpu.ops.stats import QCAccumulator
    from blazeseq_tpu.parallel.pipeline import build_qc_align_step

    size_mb = int(os.environ.get("BENCH_SIZE_MB", "1024"))
    batch_n = int(os.environ.get("BENCH_BATCH", "4096"))
    read_len = int(os.environ.get("BENCH_READ_LEN", "100"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    max_len = ((read_len + 127) // 128) * 128

    target = size_mb * 1024 * 1024
    n_reads = bt.compute_num_reads_for_size(target, read_len, read_len)
    t0 = time.perf_counter()
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n_reads, read_len, read_len, 2, 40, "sanger"))
    gen_s = time.perf_counter() - t0
    total_bytes = len(buf)
    print("# corpus: %d reads, %.2f MB (generated in %.1fs)"
          % (n_reads, total_bytes / 1e6, gen_s), file=sys.stderr)

    step = build_qc_align_step(None, check_ascii=True, check_quality=True,
                               with_alignment=False)
    dev = jax.devices()[0]
    print("# device: %s" % (dev,), file=sys.stderr)
    lo = jnp.int32(SANGER_SCHEMA.LOWER)
    hi = jnp.int32(SANGER_SCHEMA.UPPER)
    off = jnp.int32(SANGER_SCHEMA.OFFSET)
    ref = jnp.zeros(128, jnp.uint8)

    def run_once():
        cfg = bt.ParserConfig(check_ascii=True, check_quality=True,
                              quality_schema="sanger")
        parser = bt.FastqParser(bt.MemoryReader(buf), config=cfg)
        acc = QCAccumulator()
        reads = 0
        last = None
        for pb in parser.padded_batches(batch_n, max_len=max_len,
                                        pad_records_to=batch_n):
            last = step(jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                        jnp.asarray(pb.lengths), jnp.int32(pb.n_records),
                        ref, lo, hi, off)
            reads += pb.n_records
        if last is not None:
            jax.block_until_ready(last)
            acc.add(last.stats)
        return reads

    # warmup (compile)
    run_once()
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        reads = run_once()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print("# run: %.3fs (%.2f GB/s, %d reads, %.1fM reads/s)"
              % (dt, total_bytes / dt / 1e9, reads, reads / dt / 1e6),
              file=sys.stderr)

    gbps = total_bytes / best / 1e9
    print(json.dumps({
        "metric": "fastq_parse_validate_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
