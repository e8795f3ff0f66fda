#!/usr/bin/env python
"""A/B slope-timing for the general (ragged-layout) device QC step
(`ops/ragged_qc.py`): 1-D chunk upload vs 2-D row-tiled [T, K] upload,
plus optional sub-engine ablations.

The uniform kernel's decisive round-4 win (17.9 -> 40 GB/s) was layout:
a 2-D-resident chunk carries XLA's (8,128) row tiling, so column slices
are lane-regular. This script answers whether the same move pays for the
ragged engine, whose every mask/cumsum is a column-wise op over [T, K].

Usage: python benchmark/scripts/ab_ragged_qc.py [SIZE_MB]
Env: AB_WIDTH (default 128 -> K=256), AB_ABLATE=1 adds sub-engine ablation
     timings on the 2-D layout: each of the kernel's `_ablate` members
     ({"win", "corr", "vals", "hist", "rhist", "slots"}) is skipped in turn
     (stats then WRONG by design); full-step minus ablated-step attributes
     time to that sub-engine. "slots" drops the whole rank-compaction
     engine (the roadmap's "base bucket"); "rhist" just its [T, B] bin
     compares, so slots-minus-rhist isolates the compaction/carry cost.

Slope-timed (drain N, drain 3N, divide the difference) because on
relay-attached devices block_until_ready can return early; see
benchmark/README.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def slope(step, reps=(6, 18), warm=4):
    def drain(n):
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = step()
        _ = int(last.stats.reads)
        return time.perf_counter() - t0

    drain(warm)
    per = None
    for _ in range(3):
        t1 = drain(reps[0])
        t2 = drain(reps[1])
        p = (t2 - t1) / (reps[1] - reps[0])
        per = p if per is None else min(per, p)
    return per


def main():
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    width = int(os.environ.get("AB_WIDTH", "128"))

    import blazeseq_tpu as bt
    from blazeseq_tpu.fastq.quality import SANGER_SCHEMA
    from blazeseq_tpu.ops.common import round_up
    from blazeseq_tpu.ops.ragged_qc import ragged_qc

    cache = "/tmp/blazeseq_ab_varid_%dmb.fastq" % size_mb
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            buf = f.read()
    else:
        n_r = bt.compute_num_reads_for_size(size_mb << 20, 90, 110) \
            * 160 // 190
        buf = bytes(bt.generate_variable_id_fastq_buffer(
            n_r, 90, 110, 2, 40, "sanger", seed=7))
        try:
            with open(cache, "wb") as f:
                f.write(buf)
        except OSError:
            pass

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("# device:", dev, "| corpus %.1f MB | width %d"
          % (len(buf) / 1e6, width), file=sys.stderr)

    K = 2 * round_up(width, 128)
    # one chunk = the whole (padded) corpus; cut at the last record end
    data = np.frombuffer(buf, np.uint8)
    nl = np.flatnonzero(data == 10)
    if len(nl) < 4:
        raise SystemExit("corpus has <1 complete record (%d newlines); "
                         "raise SIZE_MB" % len(nl))
    tail = int(nl[len(nl) - len(nl) % 4 - 1] + 1) if len(nl) % 4 else \
        int(nl[-1] + 1)
    total = -(-tail // K) * K
    arr = np.zeros(total, dtype=np.uint8)
    arr[:tail] = data[:tail]
    nv = jnp.int32(tail)

    def make(shape2d, ablate=frozenset()):
        host = arr.reshape(-1, K) if shape2d else arr
        c = jax.device_put(jnp.asarray(host), dev)

        def step():
            return ragged_qc(c, nv, width=width,
                             q_lo=int(SANGER_SCHEMA.LOWER),
                             q_hi=int(SANGER_SCHEMA.UPPER),
                             offset=int(SANGER_SCHEMA.OFFSET),
                             _ablate=ablate)
        return step

    ref = None
    for name, two_d in (("1d", False), ("2d", True)):
        try:
            step = make(two_d)
            r = step()
        except (AssertionError, TypeError) as e:
            print("%s: unsupported (%s)" % (name, e), file=sys.stderr)
            continue
        assert bool(r.ok) and not bool(r.fallback), name
        reads = int(r.stats.reads)
        if ref is None:
            ref = (reads, int(r.stats.bases))
        else:
            assert (reads, int(r.stats.bases)) == ref, \
                "stats diverge between layouts"
        per = slope(step)
        print("%s: %.3f ms/step = %.2f GB/s  (%d records)"
              % (name, per * 1e3, tail / per / 1e9, reads))
        if two_d:
            full_per = per

    if os.environ.get("AB_ABLATE", "0") == "1":
        # sub-engine attribution by subtraction: skip one engine at a time
        # (stats intentionally wrong), full - ablated ~= that engine's cost.
        # Combined rows bound interaction/fusion effects.
        for members in (("win",), ("corr",), ("vals",), ("hist",),
                        ("rhist",), ("slots",), ("vals", "hist"),
                        ("slots", "vals", "hist"),
                        ("win", "corr", "vals", "hist")):
            step = make(True, ablate=frozenset(members))
            step()  # compile
            per = slope(step)
            print("2d -{%s}: %.3f ms/step = %.2f GB/s (d=%.3f ms)"
                  % (",".join(members), per * 1e3, tail / per / 1e9,
                     (full_per - per) * 1e3))


if __name__ == "__main__":
    main()
