"""Adaptive (eq-mode) Phred histogram for the device pipelines.

The dominant pass of the fused uniform kernel is the Phred histogram, and
its cost is linear in the number of reductions. Real corpora are
quality-BINNED (NovaSeq emits 4 distinct values), so QCModel peeks the
head's distinct-phred set and compiles one equality reduction per member
plus a free remainder bin at max+1; a nonzero remainder in the final
report triggers ONE exact full-bin re-run (run_file_device), so the
result never depends on the peek. Reference behavior spec: the histogram
panel semantics of blazeseq's per-record quality accounting — identical
counts, every corpus.
"""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.models import QCModel
from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout

LUT = np.array([2, 12, 23, 37])
EDGES = np.array([7, 18, 30])


def _binned_corpus(n=4000, L=100):
    buf = bytes(bt.generate_synthetic_fastq_buffer(n, L, L, 2, 40,
                                                   "sanger"))
    lay = detect_uniform_layout(buf)
    arr = np.frombuffer(buf, np.uint8).reshape(-1, lay.rs).copy()
    q = arr[:, lay.o3 + 1:lay.rs - 1].astype(np.int32) - 33
    arr[:, lay.o3 + 1:lay.rs - 1] = (LUT[np.searchsorted(EDGES, q)]
                                     + 33).astype(np.uint8)
    return arr, lay


def _check(raw, tmp_path, chunk_mb=1):
    p = str(tmp_path / "c.fastq")
    with open(p, "wb") as f:
        f.write(raw)
    host = QCModel(quality_schema="sanger", max_read_len=128).run_file(p)
    m = QCModel(quality_schema="sanger", max_read_len=128)
    dev = m.run_file_device(p, chunk_mb=chunk_mb)
    h, d = host.to_dict(), dev.to_dict()
    assert h == d, {k: (h[k], d[k]) for k in h if h[k] != d[k]}
    return m, host


def test_eq_mode_parity_and_peek(tmp_path):
    arr, _ = _binned_corpus()
    m, rep = _check(arr.tobytes(), tmp_path)
    assert (2, 12, 23, 37) in m._hist_his  # eq-mode actually engaged
    assert rep.qual_hist[LUT].sum() == rep.qual_hist.sum()


def test_overflow_triggers_exact_rerun(tmp_path):
    arr, lay = _binned_corpus()
    arr = arr.copy()
    # tail records carry a phred OUTSIDE the head-peeked set
    arr[-40:, lay.o3 + 1:lay.rs - 1] = 33 + 8
    m, rep = _check(arr.tobytes(), tmp_path)
    assert rep.qual_hist[8] > 0  # the out-of-set value is exactly counted


def test_full_range_corpus_stays_exact(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(3000, 100, 100, 2, 40,
                                                   "sanger"))
    _check(buf, tmp_path)


def test_eq_mode_on_semi_uniform_tier(tmp_path):
    # variable-width ids (normalized tier) with binned quality
    raw = bytes(bt.generate_variable_id_fastq_buffer(
        2000, 100, 100, 2, 40, "sanger", seed=5))
    data = np.frombuffer(raw, np.uint8)
    nl = np.flatnonzero(data == 10)
    out = bytearray(raw)
    sep_nl, qual_nl = nl[2::4], nl[3::4]
    for s, e in zip(sep_nl, qual_nl):
        q = data[s + 1:e].astype(np.int32) - 33
        out[s + 1:e] = (LUT[np.searchsorted(EDGES, q)] + 33).astype(
            np.uint8).tobytes()
    m, _ = _check(bytes(out), tmp_path)
    assert (2, 12, 23, 37) in m._hist_his


def _rebin_quals(raw):
    data = np.frombuffer(raw, np.uint8)
    nl = np.flatnonzero(data == 10)
    out = bytearray(raw)
    for s, e in zip(nl[2::4], nl[3::4]):
        q = data[s + 1:e].astype(np.int32) - 33
        out[s + 1:e] = (LUT[np.searchsorted(EDGES, q)] + 33).astype(
            np.uint8).tobytes()
    return bytes(out)


def test_eq_mode_on_ragged_tier(tmp_path):
    # MIXED read lengths (not semi-uniform) with binned quality: the
    # general ragged engine must engage eq-mode and stay byte-exact
    raw = _rebin_quals(bytes(bt.generate_variable_id_fastq_buffer(
        2000, 60, 110, 2, 40, "sanger", seed=9)))
    m, _ = _check(raw, tmp_path)
    assert (2, 12, 23, 37) in m._hist_his


def test_ragged_overflow_triggers_exact_rerun(tmp_path):
    raw = bytearray(_rebin_quals(bytes(bt.generate_variable_id_fastq_buffer(
        2000, 60, 110, 2, 40, "sanger", seed=10))))
    data = np.frombuffer(bytes(raw), np.uint8)
    nl = np.flatnonzero(data == 10)
    # last record's quality line gets an out-of-set phred
    raw[int(nl[-2]) + 1] = 33 + 8
    m, rep = _check(bytes(raw), tmp_path)
    assert rep.qual_hist[8] > 0


def test_eq_mode_lengths_on_ragged_tier(tmp_path):
    # mixed lengths whose head covers the set: the ragged engine's
    # eq-mode LENGTH histogram engages and stays byte-exact
    raw = bytes(bt.generate_variable_id_fastq_buffer(
        3000, 90, 110, 2, 40, "sanger", seed=21))
    m, rep = _check(raw, tmp_path)
    sets = getattr(m, "_len_his", set())
    assert any(90 in s and 110 in s for s in sets), sets
    assert rep.length_hist[90:111].sum() == rep.reads


def test_unseen_length_triggers_exact_rerun(tmp_path):
    # the tail introduces a read length the head never saw: the remainder
    # bin fires and the model re-runs full-bins — still byte-exact
    v = bytes(bt.generate_variable_id_fastq_buffer(
        3000, 90, 110, 2, 40, "sanger", seed=22))
    w = bytes(bt.generate_variable_id_fastq_buffer(
        40, 55, 55, 2, 40, "sanger", seed=23))
    m, rep = _check(v + w, tmp_path)
    assert rep.length_hist[55] == 40
    assert getattr(m, "_len_his", None) == set()  # cleared by the re-run


def test_kernel_eq_mode_equals_full_bins():
    import jax.numpy as jnp

    from blazeseq_tpu.fastq.quality import SANGER_SCHEMA as S
    from blazeseq_tpu.ops.uniform_qc import uniform_qc

    arr, lay = _binned_corpus(512)
    kw = dict(rs=lay.rs, o1=lay.o1, o2=lay.o2, o3=lay.o3, width=128,
              q_lo=int(S.LOWER), q_hi=int(S.UPPER), offset=int(S.OFFSET))
    c = jnp.asarray(arr)
    nv = jnp.int32(arr.size)
    ok_a, st_a = uniform_qc(c, nv, **kw)
    ok_b, st_b = uniform_qc(c, nv, hist_vals=(2, 12, 23, 37), **kw)
    assert bool(ok_a) and bool(ok_b)
    assert np.array_equal(np.asarray(st_a.qual_hist),
                          np.asarray(st_b.qual_hist))
    # remainder bin flags out-of-set values instead of mis-binning them
    arr2 = arr.copy()
    arr2[0, lay.o3 + 1] = 33 + 9
    _, st_c = uniform_qc(jnp.asarray(arr2), nv, hist_vals=(2, 12, 23, 37),
                         **kw)
    assert int(np.asarray(st_c.qual_hist)[38]) == 1  # max(vals)+1
