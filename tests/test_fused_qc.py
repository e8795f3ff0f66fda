"""Parity: the single-pass Pallas fused QC kernel vs the XLA oracle
(uniform_parse(fused_checks=True) + qc_stats), bit-exact on every panel.

Runs in interpret mode on the CPU test mesh (tests/conftest.py); the same
code path compiles natively on TPU (bench.py stage B2 re-checks counts
against the host engine there).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import blazeseq_tpu as bt  # noqa: E402
from blazeseq_tpu.fastq.quality import parse_schema  # noqa: E402
from blazeseq_tpu.ops.fused_qc import fused_uniform_qc  # noqa: E402
from blazeseq_tpu.ops.stats import qc_stats  # noqa: E402
from blazeseq_tpu.ops.uniform_qc import uniform_qc  # noqa: E402
from blazeseq_tpu.ops.uniform_parse import (  # noqa: E402
    detect_uniform_layout,
    uniform_parse,
)


def _uniform_corpus(n_reads, read_len, schema="sanger"):
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n_reads, read_len, read_len, 2, 40, schema))
    return np.frombuffer(buf, dtype=np.uint8)


def _oracle(chunk, n_valid, lay, width, schema, check_ascii, check_quality):
    r = uniform_parse(
        jnp.asarray(chunk), jnp.int32(n_valid), jnp.int32(schema.LOWER),
        jnp.int32(schema.UPPER), rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3,
        width=width, check_ascii=check_ascii, check_quality=check_quality,
        fused_checks=True)
    st = qc_stats(r.seq, r.qual, r.lengths, jnp.int32(schema.OFFSET),
                  n_records=r.n_records)
    return bool(r.template_ok), st


import functools  # noqa: E402

IMPLS = {"pallas": fused_uniform_qc, "xla": uniform_qc,
         # MXU-contraction variant: integer sum panels as i8 matmuls
         "xla_mxu": functools.partial(uniform_qc, mxu_sums=True)}


def _fused(chunk, n_valid, lay, width, schema, check_ascii, check_quality,
           impl="pallas"):
    ok, st = IMPLS[impl](
        jnp.asarray(chunk), jnp.int32(n_valid), rs=lay.rs, o1=lay.o1,
        o2=lay.o2, o3=lay.o3, width=width, q_lo=schema.LOWER,
        q_hi=schema.UPPER, offset=schema.OFFSET, check_ascii=check_ascii,
        check_quality=check_quality)
    return bool(ok), st


def _assert_stats_equal(a, b):
    for name, x, y in zip(a._fields, a, b):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=f"panel {name}")


def _run_case(chunk, lay, width, schema_name="sanger", check_ascii=True,
              check_quality=True, pad_records=0, impl="pallas"):
    schema = parse_schema(schema_name)
    n_valid = len(chunk)
    if pad_records:
        chunk = np.concatenate(
            [chunk, np.zeros(pad_records * lay.rs, np.uint8)])
    ok_o, st_o = _oracle(chunk, n_valid, lay, width, schema, check_ascii,
                         check_quality)
    ok_f, st_f = _fused(chunk, n_valid, lay, width, schema, check_ascii,
                        check_quality, impl)
    assert ok_f == ok_o
    if ok_o:
        _assert_stats_equal(st_f, st_o)
    return ok_o


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("read_len", [25, 100, 151])
def test_parity_clean_corpus(read_len, impl):
    chunk = _uniform_corpus(301, read_len)
    lay = detect_uniform_layout(chunk)
    assert lay is not None
    assert _run_case(chunk, lay, 256, pad_records=5, impl=impl)


@pytest.mark.parametrize("impl", list(IMPLS))
def test_parity_width_truncation(impl):
    # reads longer than the stats window: in-window masking semantics
    chunk = _uniform_corpus(64, 200)
    lay = detect_uniform_layout(chunk)
    assert _run_case(chunk, lay, 128, impl=impl)


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("schema_name", ["sanger", "illumina_1.3",
                                         "illumina_1.8", "generic"])
def test_parity_schemas(schema_name, impl):
    schema = parse_schema(schema_name)
    rng = np.random.default_rng(7)
    # synthesize under the schema's own quality range
    n, L = 97, 60
    recs = []
    for i in range(n):
        q = rng.integers(schema.LOWER, schema.UPPER + 1, L).astype(np.uint8)
        recs.append(b"@r%07d\n" % i
                    + bytes(rng.choice(list(b"ACGT"), L).astype(np.uint8))
                    + b"\n+\n" + q.tobytes() + b"\n")
    chunk = np.frombuffer(b"".join(recs), np.uint8)
    lay = detect_uniform_layout(chunk)
    assert lay is not None
    assert _run_case(chunk, lay, 64, schema_name, impl=impl)


@pytest.mark.parametrize("impl", list(IMPLS))
def test_parity_no_quality_check_full_hist(impl):
    # with check_quality=False out-of-schema bytes are accepted and must
    # clamp into the 64-bin histogram exactly like the host
    chunk = _uniform_corpus(50, 80).copy()
    lay = detect_uniform_layout(chunk)
    qcol = lay.o3 + 1
    chunk[qcol] = 126  # above sanger UPPER (73): clamps to bin 63
    chunk[lay.rs + qcol] = 33  # OFFSET: bin 0
    assert _run_case(chunk, lay, 128, check_quality=False, impl=impl)


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("mutate", ["newline", "at", "plus", "ascii",
                                    "quality"])
def test_rejects_violations(mutate, impl):
    chunk = _uniform_corpus(40, 50).copy()
    lay = detect_uniform_layout(chunk)
    r = 17 * lay.rs  # somewhere in the middle
    if mutate == "newline":
        chunk[r + lay.o1] = ord("x")  # missing newline
    elif mutate == "at":
        chunk[r] = ord("#")
    elif mutate == "plus":
        chunk[r + lay.o2 + 1] = ord("-")
    elif mutate == "ascii":
        chunk[r + lay.o1 + 2] = 0x80 | ord("A")
    elif mutate == "quality":
        chunk[r + lay.o3 + 2] = 1  # below sanger LOWER
    assert _run_case(chunk, lay, 128, impl=impl) is False


@pytest.mark.parametrize("impl", list(IMPLS))
def test_violation_beyond_n_valid_ignored(impl):
    chunk = _uniform_corpus(30, 50).copy()
    lay = detect_uniform_layout(chunk)
    n_valid = 20 * lay.rs
    chunk[25 * lay.rs] = ord("#")  # corrupt a record past n_valid
    schema = parse_schema("sanger")
    ok_f, st_f = _fused(chunk, n_valid, lay, 128, schema, True, True, impl)
    ok_o, st_o = _oracle(chunk, n_valid, lay, 128, schema, True, True)
    assert ok_f and ok_o
    _assert_stats_equal(st_f, st_o)
    assert int(st_f.reads) == 20
