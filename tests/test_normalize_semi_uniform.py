"""Semi-uniform (id-normalized) device tier.

Real corpora are overwhelmingly fixed read length with variable-width
coordinate ids — the one shape the uniform template rejects. The host
normalizer (native bs_normalize_semi_uniform / numpy twin) rewrites ids to
a fixed stride with trailing spaces (QC reads no id bytes), and the device
runs the uniform one-pass kernel on the result; the template proof
re-verifies every produced chunk, so the report stays byte-identical to
the host engine. Reference behavior spec: blazeseq/fastq/parser.mojo
record iteration + Validator — same records, same panels, same errors.
"""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import native
from blazeseq_tpu.models import QCModel


def _var_corpus(n=3000, L=100, seed=1):
    return bytes(bt.generate_variable_id_fastq_buffer(
        n, L, L, 2, 40, "sanger", seed=seed))


def _reports(raw, tmp_path, chunk_mb=4):
    p = str(tmp_path / "c.fastq")
    with open(p, "wb") as f:
        f.write(raw)
    host = QCModel(quality_schema="sanger", max_read_len=128).run_file(p)
    dev = QCModel(quality_schema="sanger",
                  max_read_len=128).run_file_device(p, chunk_mb=chunk_mb)
    return host.to_dict(), dev.to_dict()


# ------------------------------------------------------------- normalizer

def test_native_and_numpy_normalizers_agree():
    buf = np.frombuffer(_var_corpus(500), np.uint8)
    L, idw = QCModel._peek_semi_uniform(buf)[0], 64
    rs = idw + 2 * L + 6
    out_a = np.zeros(600 * rs, np.uint8)
    out_b = np.zeros(600 * rs, np.uint8)
    na, ca = native._normalize_semi_uniform_np(buf, 0, out_a, idw, L)
    if native.has_native():
        nb, cb = native.normalize_semi_uniform(buf, 0, out_b, idw, L)
        assert (na, ca) == (nb, cb)
        assert np.array_equal(out_a[: na * rs], out_b[: nb * rs])
    assert na == 500 and ca == len(buf)


def test_normalized_bytes_reparse_identically():
    buf = np.frombuffer(_var_corpus(400), np.uint8)
    L = QCModel._peek_semi_uniform(buf)[0]
    idw = 64
    rs = idw + 2 * L + 6
    out = np.zeros(500 * rs, np.uint8)
    n, _ = native.normalize_semi_uniform(buf, 0, out, idw, L)
    from blazeseq_tpu.ops.uniform_parse import detect_uniform_layout

    lay = detect_uniform_layout(out[: n * rs])
    assert lay is not None and lay.rs == rs
    recs_a = [(r.id(), r.sequence(), r.quality()) for r in bt.FastqParser(
        bt.MemoryReader(bytes(buf))).records()]
    recs_b = [(r.id(), r.sequence(), r.quality()) for r in bt.FastqParser(
        bt.MemoryReader(bytes(out[: n * rs]))).records()]
    # ids gain trailing spaces only; seq/qual byte-identical
    assert len(recs_a) == len(recs_b)
    for (ia, sa, qa), (ib, sb, qb) in zip(recs_a, recs_b):
        assert ib.rstrip() == ia.rstrip() and ib.startswith(ia)
        assert sb == sa and qb == qa


def test_normalizer_stops_at_mismatch_boundary():
    a = _var_corpus(50, L=100)
    b = _var_corpus(50, L=60, seed=2)  # length change mid-stream
    buf = np.frombuffer(a + b, np.uint8)
    idw, L = 64, 100
    rs = idw + 2 * L + 6
    out = np.zeros(200 * rs, np.uint8)
    n, consumed = native.normalize_semi_uniform(buf, 0, out, idw, L)
    assert n == 50 and consumed == len(a)


def test_peek_semi_uniform():
    buf = np.frombuffer(_var_corpus(100), np.uint8)
    L, idw = QCModel._peek_semi_uniform(buf)
    assert L == 100 and idw > 0
    # uniform-width ids still peek fine (the uniform tier just wins first)
    u = np.frombuffer(bytes(bt.generate_synthetic_fastq_buffer(
        50, 80, 80, 2, 40, "sanger")), np.uint8)
    assert QCModel._peek_semi_uniform(u)[0] == 80
    # mixed lengths in the head: not this tier
    m = np.frombuffer(bytes(bt.generate_variable_id_fastq_buffer(
        50, 60, 110, 2, 40, "sanger", seed=3)), np.uint8)
    assert QCModel._peek_semi_uniform(m) is None


# ------------------------------------------------- end-to-end exactness

def test_device_report_matches_host_on_semi_uniform(tmp_path):
    h, d = _reports(_var_corpus(), tmp_path)
    assert h == d
    assert h["reads"] == 3000


def test_mid_file_wide_id_repeeks(tmp_path):
    v = _var_corpus()
    big = b"@" + b"X" * 120 + b"\n" + b"A" * 100 + b"\n+\n" + b"I" * 100 \
        + b"\n"
    nl = np.flatnonzero(np.frombuffer(v, np.uint8) == 10)
    cut = int(nl[(np.searchsorted(nl, len(v) // 2) // 4) * 4 - 1]) + 1
    h, d = _reports(v[:cut] + big + v[cut:], tmp_path)
    assert h == d
    assert h["reads"] == 3001


def test_block_length_change_restarts_tier(tmp_path):
    v = _var_corpus()
    w = _var_corpus(1000, L=60, seed=2)
    h, d = _reports(v + w, tmp_path)
    assert h == d
    assert h["reads"] == 4000


def test_invalid_quality_byte_counts_one_error(tmp_path):
    v = bytearray(_var_corpus())
    nl = np.flatnonzero(np.frombuffer(bytes(v), np.uint8) == 10)
    v[int(nl[2]) + 3] = 0x08  # below sanger '!': validation error
    h, d = _reports(bytes(v), tmp_path)
    assert h == d
    assert h["error_reads"] == 1


def test_trailing_partial_record_goes_to_host(tmp_path):
    v = _var_corpus(200)
    h, d = _reports(v[: len(v) - 30], tmp_path)
    assert h == d


def test_numpy_fallback_end_to_end(tmp_path, monkeypatch):
    import blazeseq_tpu.native as nat

    monkeypatch.setattr(nat, "_lib", None)
    monkeypatch.setattr(nat, "_tried", True)
    h, d = _reports(_var_corpus(800), tmp_path)
    assert h == d
