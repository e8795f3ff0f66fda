"""Device uniform-template parse (ops/uniform_parse.py) vs the host parser.

The device path must either PROVE the uniform layout and produce the exact
padded batch the host feed produces, or reject the chunk (template_ok=False)
so the caller falls back to the host parser. Parity is checked row-for-row
against parser.padded_batches on the same bytes.
"""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.ops.uniform_parse import (UniformLayout,
                                            detect_uniform_layout,
                                            uniform_parse)


def _device_parse(buf: bytes, width=128, check_quality=True,
                  q_lower=33, q_upper=126):
    import jax.numpy as jnp

    lay = detect_uniform_layout(buf)
    assert lay is not None
    n = len(buf)
    pad = (-n) % lay.rs
    arr = np.frombuffer(buf, dtype=np.uint8)
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    return lay, uniform_parse(
        jnp.asarray(arr), jnp.int32(n - (n % lay.rs)),
        jnp.int32(q_lower), jnp.int32(q_upper),
        rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3, width=width,
        check_quality=check_quality)


def _mk(n_reads, read_len):
    return bytes(bt.generate_synthetic_fastq_buffer(
        n_reads, read_len, read_len, 2, 40, "sanger"))


def test_layout_detection():
    buf = _mk(100, 80)
    lay = detect_uniform_layout(buf)
    assert lay is not None
    assert lay.seq_len == 80 and lay.qual_len == 80
    assert buf[lay.rs : lay.rs + 1] == b"@"


def test_parity_with_host_padded_feed():
    buf = _mk(1000, 100)
    lay, res = _device_parse(buf)
    assert bool(res.template_ok)
    assert not bool(res.bad_ascii) and not bool(res.bad_quality)
    p = bt.FastqParser(bt.MemoryReader(buf),
                       config=bt.ParserConfig(check_ascii=True,
                                              check_quality=True,
                                              quality_schema="sanger"))
    pb = p.next_padded(1000, max_len=128)
    assert int(res.n_records) == pb.n_records == 1000
    assert int(res.bases) == int(np.asarray(pb.lengths, np.int64).sum())
    np.testing.assert_array_equal(np.asarray(res.seq)[:1000],
                                  np.asarray(pb.seq)[:1000])
    np.testing.assert_array_equal(np.asarray(res.qual)[:1000],
                                  np.asarray(pb.qual)[:1000])
    np.testing.assert_array_equal(np.asarray(res.lengths)[:1000],
                                  np.asarray(pb.lengths)[:1000])


def test_zero_padded_tail_rows_excluded():
    buf = _mk(37, 60)
    lay = detect_uniform_layout(buf)
    import jax.numpy as jnp

    arr = np.frombuffer(buf, dtype=np.uint8)
    padded = np.concatenate([arr, np.zeros(10 * lay.rs, np.uint8)])
    res = uniform_parse(jnp.asarray(padded), jnp.int32(len(buf)),
                        jnp.int32(33), jnp.int32(126),
                        rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3, width=64)
    assert bool(res.template_ok)
    assert int(res.n_records) == 37
    assert np.asarray(res.lengths)[37:].sum() == 0
    assert np.asarray(res.seq)[37:].sum() == 0


def test_rejects_nonuniform_layout():
    # header widths jump at read 10 (r9 -> r10): layout is NOT uniform
    recs = b"".join(b"@r%d\nACGT\n+\nIIII\n" % i for i in range(20))
    lay = detect_uniform_layout(recs)
    if lay is None:
        return  # detection already refused — fine
    import jax.numpy as jnp

    arr = np.frombuffer(recs, dtype=np.uint8)
    pad = (-len(arr)) % lay.rs
    arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
    res = uniform_parse(jnp.asarray(arr),
                        jnp.int32(len(recs) - (len(recs) % lay.rs)),
                        jnp.int32(33), jnp.int32(126),
                        rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3, width=64)
    assert not bool(res.template_ok)


def test_rejects_corrupt_marker():
    buf = bytearray(_mk(50, 40))
    lay = detect_uniform_layout(bytes(buf))
    buf[20 * lay.rs] = ord("X")  # '@' of record 20
    _, res = _device_parse(bytes(buf), width=64)
    assert not bool(res.template_ok)


def test_flags_quality_violation():
    buf = bytearray(_mk(50, 40))
    lay = detect_uniform_layout(bytes(buf))
    buf[7 * lay.rs + lay.o3 + 3] = 0x20  # below sanger lower bound
    _, res = _device_parse(bytes(buf), width=64)
    assert bool(res.template_ok)  # structure is intact
    assert bool(res.bad_quality)  # but validation must trip


def test_flags_non_ascii():
    buf = bytearray(_mk(50, 40))
    lay = detect_uniform_layout(bytes(buf))
    buf[3 * lay.rs + lay.o1 + 2] = 0xC3
    _, res = _device_parse(bytes(buf), width=64)
    assert bool(res.template_ok)
    assert bool(res.bad_ascii)


def test_clamped_width():
    buf = _mk(64, 150)
    lay, res = _device_parse(buf, width=128)
    assert bool(res.template_ok)
    assert int(res.n_records) == 64
    assert np.asarray(res.lengths)[0] == 150  # true length kept
    p = bt.FastqParser(bt.MemoryReader(buf))
    pb = p.next_padded(64, max_len=128)
    np.testing.assert_array_equal(np.asarray(res.seq)[:64],
                                  np.asarray(pb.seq)[:64])


def test_fused_checks_parity_and_rejection():
    """fused_checks=True must accept exactly what the detailed mode accepts
    and reject every violation class (as template_ok=False)."""
    import jax.numpy as jnp

    buf = _mk(200, 60)
    lay = detect_uniform_layout(buf)

    def parse(b, fused):
        arr = np.frombuffer(b, dtype=np.uint8)
        pad = (-len(arr)) % lay.rs
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
        return uniform_parse(jnp.asarray(arr),
                             jnp.int32(len(b) - (len(b) % lay.rs)),
                             jnp.int32(33), jnp.int32(126),
                             rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3,
                             width=64, fused_checks=fused)

    good = parse(buf, True)
    assert bool(good.template_ok)
    assert int(good.n_records) == 200
    np.testing.assert_array_equal(np.asarray(good.seq),
                                  np.asarray(parse(buf, False).seq))

    for mutate in ("marker", "newline", "quality", "ascii"):
        b = bytearray(buf)
        if mutate == "marker":
            b[17 * lay.rs] = ord("X")
        elif mutate == "newline":
            b[11 * lay.rs + lay.o1] = ord("A")  # newline overwritten
        elif mutate == "quality":
            b[9 * lay.rs + lay.o3 + 2] = 0x20
        else:
            b[5 * lay.rs + lay.o1 + 3] = 0xC8
        res = parse(bytes(b), True)
        assert not bool(res.template_ok), mutate


def test_qc_stats_from_uniform_parse_match_host_pipeline():
    """End-to-end pipeline B parity: device-parsed batch through qc_stats
    equals the host-fed batch through the same step."""
    import jax.numpy as jnp

    from blazeseq_tpu.ops import stats as stats_ops

    buf = _mk(500, 100)
    lay, res = _device_parse(buf)
    p = bt.FastqParser(bt.MemoryReader(buf))
    pb = p.next_padded(500, max_len=128)
    st_dev = stats_ops.qc_stats(res.seq, res.qual, res.lengths, jnp.int32(33),
                                n_records=res.n_records)
    st_host = stats_ops.qc_stats(jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                                 jnp.asarray(pb.lengths, dtype=jnp.int32),
                                 jnp.int32(33),
                                 n_records=jnp.int32(pb.n_records))
    for a, b in zip(st_dev, st_host):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_uniform_qc_matches_single_device():
    """build_uniform_qc_step over a dp mesh: sharded device parsing + psum
    QC must equal the single-device step exactly. Runs in a clean
    subprocess (the axon harness binds the real single TPU at interpreter
    start; the virtual 8-CPU mesh needs a fresh interpreter)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    code = """
import numpy as np, jax, jax.numpy as jnp
import blazeseq_tpu as bt
from blazeseq_tpu.fastq.quality import parse_schema
from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout
from blazeseq_tpu.parallel.mesh import make_mesh
from blazeseq_tpu.parallel.pipeline import build_uniform_qc_step

n_dev = 4
mesh = make_mesh(n_dev)
schema = parse_schema("generic")
buf = bytes(bt.generate_synthetic_fastq_buffer(640, 72, 72, 2, 40, "sanger"))
lay = detect_uniform_layout(buf)
unit = lay.rs * n_dev
pad = (-len(buf)) % unit
arr = np.concatenate([np.frombuffer(buf, np.uint8), np.zeros(pad, np.uint8)])
n_valid = jnp.int32(len(buf))
args = (jnp.asarray(arr), n_valid)
single = build_uniform_qc_step(None, lay, schema, width=128)
n1, b1, ok1, st1 = single(*args)
sharded = build_uniform_qc_step(mesh, lay, schema, width=128)
n2, b2, ok2, st2 = sharded(*args)
assert bool(ok1) and bool(ok2)
assert int(n1) == int(n2) == 640
assert int(b1) == int(b2) == 640 * 72
for a, b in zip(st1, st2):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
bad = bytearray(buf)
bad[500 * lay.rs] = ord("X")
arr2 = np.concatenate([np.frombuffer(bytes(bad), np.uint8),
                       np.zeros(pad, np.uint8)])
_, _, ok3, _ = sharded(jnp.asarray(arr2), n_valid)
assert not bool(ok3)
print("SHARDED-UNIFORM-OK")
"""
    r = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SHARDED-UNIFORM-OK" in r.stdout
