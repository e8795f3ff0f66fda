#!/usr/bin/env python
"""Measured step-time breakdown for the fused uniform QC kernel
(docs/perf_roofline_uniform_qc.md): slope-times

  * the full production step (ge_vpu histogram, 64 bins for sanger)
  * a 2-bin histogram ablation  (the kernel minus ~62/63 of pass P5 —
    schema bounds are static args, so q_hi=offset+1 compiles a 2-bin
    variant; the template verdict goes false on real data but the compiled
    work is otherwise identical, which is all timing needs)
  * the mxu_sums=True variant   (P2-P4 as i8 MXU contractions)

and prints the roofline table row-ready: ms/step, GB/s, implied HBM
bytes/input-byte at 819 GB/s. Run the histogram microbench separately:
AB_HIST=1 benchmark/scripts/ab_uniform_qc.py.

Usage: python benchmark/scripts/roofline_uniform_qc.py [SIZE_MB] [READ_LEN]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

HBM_GBPS = 819.0  # v5e


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import blazeseq_tpu as bt
    from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
    from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout
    from blazeseq_tpu.ops.uniform_qc import uniform_qc

    n_reads = bt.compute_num_reads_for_size(size_mb << 20, read_len,
                                            read_len)
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n_reads, read_len, read_len, 2, 40, "sanger"))
    lay = detect_uniform_layout(buf)
    assert lay is not None

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("# device:", dev, file=sys.stderr)
    total = len(buf) // lay.rs * lay.rs
    host = np.frombuffer(buf, np.uint8)[:total]
    c1 = jax.device_put(jnp.asarray(host), dev)
    # production layout since r4: 2-D [nrec, rs] upload (row-tiled resident)
    c2 = jax.device_put(jnp.asarray(host.reshape(-1, lay.rs)), dev)
    nv = jnp.int32(total)
    width = ((read_len + 127) // 128) * 128
    off = int(SANGER_SCHEMA.OFFSET)

    def make(q_hi, mxu, chunk=None, ablate=frozenset()):
        cc = c2 if chunk is None else chunk

        def step():
            ok, st = uniform_qc(
                cc, nv, rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3,
                width=width, q_lo=int(SANGER_SCHEMA.LOWER), q_hi=q_hi,
                offset=off, mxu_sums=mxu, _ablate=ablate)
            return st
        return step

    q_hi = int(SANGER_SCHEMA.UPPER)
    variants = [
        ("full_2d (production)", make(q_hi, False)),
        ("full_1d (pre-r4 layout)", make(q_hi, False, chunk=c1)),
        ("full_mxu_sums_2d", make(q_hi, True)),
    ]
    # sub-engine attribution by subtraction on the production 2-D step:
    # skip one logical pass at a time (stats intentionally WRONG);
    # full - ablated ~= that pass's cost. The final row is the leftover.
    for members in (("proof",), ("perpos",), ("gcread",), ("qsum",),
                    ("hist",), ("perread",),
                    ("proof", "perpos", "gcread", "qsum", "hist",
                     "perread")):
        variants.append(("2d -{%s}" % ",".join(members),
                         make(q_hi, False, ablate=frozenset(members))))
    only = os.environ.get("AB_ONLY", "")
    if only:
        # keep the full-2d row (the delta baseline) plus the filtered set
        variants = [variants[0]] + [
            (n, s) for n, s in variants[1:] if only in n]
    print("| configuration | ms/step (%d MB) | GB/s | implied HBM B/B "
          "| d vs full (ms) |" % size_mb, flush=True)
    print("|---|---|---|---|---|", flush=True)
    full_per = None
    for name, step in variants:
        _ = int(step().reads)  # compile + drain

        def drain(n):
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = step()
            _ = int(last.reads)
            return time.perf_counter() - t0

        drain(4)
        per = None
        for _ in range(3):
            t1 = drain(5)
            t2 = drain(15)
            p = (t2 - t1) / 10
            per = p if per is None else min(per, p)
        if full_per is None:
            full_per = per
        gbps = total / per / 1e9
        print("| %s | %.2f | %.2f | %.1f | %.2f |"
              % (name, per * 1e3, gbps, HBM_GBPS / gbps,
                 (full_per - per) * 1e3), flush=True)


if __name__ == "__main__":
    main()
