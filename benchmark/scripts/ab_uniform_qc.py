#!/usr/bin/env python
"""A/B slope-timing for the fused uniform QC step variants on the attached
device: VPU-reduction baseline vs MXU-contraction sum panels
(uniform_qc(mxu_sums=True)) and the raw-byte-sum decode shortcut.

Usage: python benchmark/scripts/ab_uniform_qc.py [SIZE_MB] [READ_LEN]

Slope-timed (N dispatches + one scalar fetch at two N values) because on
relay-attached devices block_until_ready can return early; see
benchmark/README.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


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
    arr = np.frombuffer(buf, np.uint8)[:total]
    c = jax.device_put(jnp.asarray(arr), dev)
    nv = jnp.int32(total)
    width = ((read_len + 127) // 128) * 128

    def make(mxu):
        def step():
            ok, st = uniform_qc(
                c, nv, rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3,
                width=width, q_lo=int(SANGER_SCHEMA.LOWER),
                q_hi=int(SANGER_SCHEMA.UPPER),
                offset=int(SANGER_SCHEMA.OFFSET), mxu_sums=mxu)
            return st
        return step

    for name, mxu in (("vpu", False), ("mxu", True)):
        step = make(mxu)
        r = step()
        assert int(r.reads) == total // lay.rs, (name, int(r.reads))

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
        print("%s: %.3f ms/step = %.2f GB/s" % (name, per * 1e3,
                                                total / per / 1e9))


def hist_ab():
    """Isolated histogram formulations over the same qual-byte matrix:
    which accumulation strategy is the device wall?

      ge_vpu   the production cumulative >= trick (VPU reduce per bin)
      ge_dot   same compares, accumulation as an i8 matmul with ones (MXU)
      eq_dot   64-value one-hot equality + one [N,nb] x [nb?] contraction

    Usage: AB_HIST=1 python benchmark/scripts/ab_uniform_qc.py [SIZE_MB]
    """
    import jax
    import jax.numpy as jnp

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_bins = 41
    off = 33
    rng = np.random.default_rng(0)
    q = rng.integers(35, 74, size=(size_mb << 20,), dtype=np.uint8)
    R = q.size // 512
    q2 = q[: R * 512].reshape(R, 512)
    dev = jax.devices()[0]
    print("# device:", dev, file=sys.stderr)
    qd = jax.device_put(jnp.asarray(q2), dev)

    @jax.jit
    def ge_vpu(qm):
        ge = [jnp.sum(qm >= jnp.uint8(off + k), dtype=jnp.int32)
              for k in range(1, n_bins)]
        return jnp.stack(ge)

    @jax.jit
    def ge_dot(qm):
        masks = [(qm >= jnp.uint8(off + k)).astype(jnp.int8)
                 for k in range(1, n_bins)]
        M = jnp.stack(masks, axis=-1).reshape(-1, n_bins - 1)  # [N, nb]
        ones = jnp.ones((1, M.shape[0]), jnp.int8)
        return jax.lax.dot_general(
            ones, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[0]

    @jax.jit
    def eq_dot(qm):
        vals = jnp.arange(off + 1, off + n_bins,
                          dtype=jnp.int32)  # bin byte values
        oh = (qm[..., None].astype(jnp.int32) == vals).astype(jnp.int8)
        M = oh.reshape(-1, n_bins - 1)
        ones = jnp.ones((1, M.shape[0]), jnp.int8)
        cnt = jax.lax.dot_general(
            ones, M, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[0]
        return cnt

    for name, fn in (("ge_vpu", ge_vpu), ("ge_dot", ge_dot),
                     ("eq_dot", eq_dot)):
        r = fn(qd)
        _ = np.asarray(r)

        def drain(n):
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = fn(qd)
            _ = int(last[0])
            return time.perf_counter() - t0

        drain(4)
        per = None
        for _ in range(3):
            t1 = drain(5)
            t2 = drain(15)
            p = (t2 - t1) / 10
            per = p if per is None else min(per, p)
        print("%s: %.3f ms = %.2f GB/s (qual bytes)"
              % (name, per * 1e3, q2.size / per / 1e9))


if __name__ == "__main__":
    if os.environ.get("AB_HIST") == "1":
        hist_ab()
    else:
        main()
