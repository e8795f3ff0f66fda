"""QCModel.run_file_device (pipeline B as a product API) must produce a
report byte-identical to the host path, including under fallback."""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.models import QCModel


def _mk_file(tmp_path, n=3000, L=80, name="u.fastq"):
    buf = bytes(bt.generate_synthetic_fastq_buffer(n, L, L, 2, 40, "sanger"))
    p = tmp_path / name
    p.write_bytes(buf)
    return str(p), buf


def _reports_equal(a, b):
    da, db = a.to_dict(), b.to_dict()
    assert set(da) == set(db)
    for k in da:
        va, vb = da[k], db[k]
        if isinstance(va, float):
            assert va == pytest.approx(vb), k
        else:
            assert va == vb, k


def test_device_report_matches_host(tmp_path):
    path, _ = _mk_file(tmp_path)
    m = QCModel(quality_schema="sanger", check_ascii=True,
                check_quality=True, max_read_len=128)
    host = m.run_file(path)
    dev = m.run_file_device(path, chunk_mb=1)  # several chunks
    assert dev.reads == 3000
    _reports_equal(host, dev)


def test_device_fallback_on_nonuniform(tmp_path):
    # varying read lengths: the layout proof fails immediately and the
    # whole file takes the host path inside run_file_device
    buf = bytes(bt.generate_synthetic_fastq_buffer(500, 40, 120, 2, 40,
                                                   "sanger"))
    p = tmp_path / "ragged.fastq"
    p.write_bytes(buf)
    m = QCModel(quality_schema="sanger", max_read_len=128)
    host = m.run_file(str(p))
    dev = m.run_file_device(str(p))
    _reports_equal(host, dev)


def test_device_fallback_midfile_quality_error(tmp_path):
    path, buf = _mk_file(tmp_path, n=2000, L=60, name="bad.fastq")
    b = bytearray(buf)
    # corrupt a quality byte deep in the file (below sanger lower bound):
    # the owning chunk fails the proof; the remainder goes through the host
    # engine where the device step COUNTS the record as an error
    lines = bytes(buf).split(b"\n")
    qpos = sum(len(l) + 1 for l in lines[: 1500 * 4 + 3])
    b[qpos + 5] = 0x20
    p = tmp_path / "bad2.fastq"
    p.write_bytes(bytes(b))
    m = QCModel(quality_schema="sanger", check_quality=True,
                max_read_len=64)
    host = m.run_file(str(p))
    dev = m.run_file_device(str(p), chunk_mb=1)
    assert host.error_reads == 1
    _reports_equal(host, dev)


def test_device_rejects_unsupported_features(tmp_path):
    path, _ = _mk_file(tmp_path, n=50, L=40, name="f.fastq")
    m = QCModel(adapters=[b"AGATCGGAAGAG"])
    with pytest.raises(ValueError):
        m.run_file_device(path)


def test_device_gzip_stream_matches_host(tmp_path):
    import gzip as _gz

    path, buf = _mk_file(tmp_path, n=2500, L=64, name="z.fastq")
    gz_path = str(tmp_path / "z.fastq.gz")
    with open(gz_path, "wb") as f:
        f.write(_gz.compress(buf, 5))
    m = QCModel(quality_schema="sanger", check_quality=True,
                max_read_len=64)
    host = m.run_file(gz_path)
    dev = m.run_file_device(gz_path, chunk_mb=1)
    assert dev.reads == 2500
    _reports_equal(host, dev)


def test_device_gzip_nonuniform_falls_back(tmp_path):
    import gzip as _gz

    buf = bytes(bt.generate_synthetic_fastq_buffer(400, 30, 90, 2, 40,
                                                   "sanger"))
    gz_path = str(tmp_path / "r.fastq.gz")
    with open(gz_path, "wb") as f:
        f.write(_gz.compress(buf, 5))
    m = QCModel(quality_schema="sanger", max_read_len=128)
    host = m.run_file(gz_path)
    dev = m.run_file_device(gz_path)
    _reports_equal(host, dev)
