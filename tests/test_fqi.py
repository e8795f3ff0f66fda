"""FASTQ record index (.fqi): build / serialize / fetch / shard_ranges.

Random access into FASTQ is an open item upstream (reference
README.md:129-134, docs/TODO.md:5-8 — "end-to-end, no seek"); the oracle
here is always the full sequential parse.
"""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import ParseError


def _mk(tmp_path, n=500, lo=20, hi=90, name="r.fastq", variable=True):
    if variable:
        buf = bytes(bt.generate_variable_id_fastq_buffer(
            n, lo, hi, 2, 40, "sanger", seed=7))
    else:
        buf = bytes(bt.generate_synthetic_fastq_buffer(n, lo, hi, 2, 40,
                                                       "sanger"))
    p = tmp_path / name
    p.write_bytes(buf)
    return str(p), buf


def _all_records(path):
    return list(bt.FastqParser(bt.open_reader(path)).records())


@pytest.mark.parametrize("stride", [1, 7, 100, 10_000])
def test_build_counts_and_checkpoints(tmp_path, stride):
    path, buf = _mk(tmp_path)
    ix = bt.build_fqi(path, stride=stride)
    recs = _all_records(path)
    assert ix.n_records == len(recs) == 500
    assert ix.n_bases == sum(len(r.sequence_bytes()) for r in recs)
    assert ix.n_bytes == len(buf)
    assert len(ix.offsets) == -(-500 // stride)
    # every checkpoint must point at the '@' of record k*stride
    for k, off in enumerate(ix.offsets):
        assert buf[off : off + 1] == b"@"
        tail = list(bt.FastqParser(
            bt.MemoryReader(buf[off:])).views(reuse=True))
        assert len(tail) == 500 - k * stride


def test_roundtrip_file_format(tmp_path):
    path, _ = _mk(tmp_path, n=123)
    ix = bt.build_fqi(path, stride=10)
    side = tmp_path / "r.fastq.fqi"
    bt.write_fqi(ix, side)
    ix2 = bt.read_fqi(side)
    assert (ix2.stride, ix2.n_records, ix2.n_bases, ix2.n_bytes) == (
        ix.stride, ix.n_records, ix.n_bases, ix.n_bytes)
    assert np.array_equal(ix2.offsets, ix.offsets)


def test_fetch_matches_sequential(tmp_path):
    path, _ = _mk(tmp_path, n=400)
    recs = _all_records(path)
    with bt.IndexedFastq(path, stride=37) as ix:
        assert len(ix) == 400
        for start, count in [(0, 1), (0, 5), (36, 2), (37, 1), (38, 3),
                             (395, 10), (399, 1), (123, 50)]:
            got = ix.fetch(start, count)
            want = recs[start : start + count]
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert g.id_bytes() == w.id_bytes()
                assert g.sequence_bytes() == w.sequence_bytes()
                assert g.quality_bytes() == w.quality_bytes()
        with pytest.raises(IndexError):
            ix.fetch(400)
        assert ix.fetch(10, 0) == []


def test_sidecar_reuse_and_stale_rebuild(tmp_path):
    path, _ = _mk(tmp_path, n=60)
    with bt.IndexedFastq(path, stride=8) as ix:
        assert ix.index.n_records == 60
    side = tmp_path / "r.fastq.fqi"
    assert side.exists()
    # loading again trusts the sidecar (same stride recorded inside)
    with bt.IndexedFastq(path) as ix2:
        assert ix2.index.stride == 8
    # a stale sidecar (file changed size) is rebuilt, not trusted
    more = bytes(bt.generate_synthetic_fastq_buffer(10, 20, 30, 2, 40,
                                                    "sanger"))
    with open(path, "ab") as f:
        f.write(more)
    with bt.IndexedFastq(path, stride=9) as ix3:
        assert ix3.index.n_records == 70
        assert ix3.index.stride == 9
        r = ix3.fetch(69)[0]
        assert r.id_bytes()  # the appended tail is reachable


def test_shard_ranges_cover_exactly(tmp_path):
    path, buf = _mk(tmp_path, n=997)
    recs = _all_records(path)
    with bt.IndexedFastq(path, stride=50) as ix:
        for n in [1, 2, 3, 8, 64]:
            ranges = ix.shard_ranges(n)
            assert ranges[0][0] == 0 and ranges[-1][1] == len(buf)
            total = 0
            for lo, hi in ranges:
                assert buf[lo : lo + 1] == b"@"
                part = list(bt.FastqParser(
                    bt.MemoryReader(buf[lo:hi])).views(reuse=True))
                total += len(part)
            assert total == 997
    # contiguity
    with bt.IndexedFastq(path) as ix:
        rs = ix.shard_ranges(4)
        assert all(rs[i][1] == rs[i + 1][0] for i in range(len(rs) - 1))


def test_gzip_rejected_with_guidance(tmp_path):
    import gzip

    p = tmp_path / "r.fastq.gz"
    p.write_bytes(gzip.compress(
        bytes(bt.generate_synthetic_fastq_buffer(5, 20, 30, 2, 40,
                                                 "sanger"))))
    with pytest.raises(ParseError, match="BGZF"):
        bt.build_fqi(str(p))


def test_validation_honored_during_build(tmp_path):
    bad = b"@r1\nACGT\n+\n!!!!\n@r2\nAC\x07T\n+\n!!!\n"
    p = tmp_path / "bad.fastq"
    p.write_bytes(bad)
    cfg = bt.ParserConfig(check_ascii=True)
    with pytest.raises(Exception):
        bt.build_fqi(str(p), config=cfg)


def test_offset_chunks_primitive(tmp_path):
    path, buf = _mk(tmp_path, n=64, variable=False)
    parser = bt.FastqParser(bt.open_reader(path))
    firsts, starts, lens = [], [], []
    for first, st, ln in parser.offset_chunks():
        firsts.append(first)
        starts.append(st)
        lens.append(ln)
    starts = np.concatenate(starts)
    lens = np.concatenate(lens)
    assert firsts[0] == 0 and len(starts) == 64
    assert parser.records_served() == 64
    recs = _all_records(path)
    for off, ln, r in zip(starts, lens, recs):
        assert buf[off : off + 1] == b"@"
        assert ln == len(r.sequence_bytes())


def test_cli_fqidx(tmp_path, capsys):
    from blazeseq_tpu.__main__ import main

    path, _ = _mk(tmp_path, n=30)
    assert main(["fqidx", "--stride", "4", path]) == 0
    out = capsys.readouterr().out
    assert "30 records" in out and "8 checkpoints" in out
    assert main(["fqidx", "--fetch", "17", "--count", "2", path]) == 0
    # records 17..18 of the sequential parse, serialized 4-line
    recs = _all_records(path)
    want = b"".join(r.to_bytes() for r in recs[17:19])
    got = capsys.readouterr().out.encode()
    assert got == want
