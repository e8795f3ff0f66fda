"""BGZF virtual-offset FASTQ indexing: random access into compressed FASTQ.

Random access into FASTQ is an open item upstream (reference
README.md:129-134, docs/TODO.md:5-8); the reference has no compressed-seek
story at all. Here a ``.fqi`` over a BGZF file stores htslib-style virtual
offsets ``(block_coffset << 16) | in_block_offset`` resolved by a
header-only block scan; the oracle in every test is the full sequential
parse of the same bytes.
"""

import gzip
import os

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import ParseError


def _mk_bgzf(tmp_path, n=500, lo=20, hi=90, name="r.fastq.gz",
             variable=True, level=6):
    if variable:
        buf = bytes(bt.generate_variable_id_fastq_buffer(
            n, lo, hi, 2, 40, "sanger", seed=11))
    else:
        buf = bytes(bt.generate_synthetic_fastq_buffer(n, lo, hi, 2, 40,
                                                       "sanger"))
    p = str(tmp_path / name)
    w = bt.BGZFWriter(p, level=level)
    w.write(buf)
    w.close()
    return p, buf


def _all_records(buf):
    return list(bt.FastqParser(bt.MemoryReader(buf)).records())


def test_scan_bgzf_blocks_table(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=3000)
    coffs, ustarts, total_u = bt.scan_bgzf_blocks(path)
    assert total_u == len(buf)
    assert len(coffs) == len(ustarts) >= 2  # >64 KiB of payload
    assert coffs[0] == 0 and ustarts[0] == 0
    assert np.all(np.diff(coffs) > 0) and np.all(np.diff(ustarts) > 0)
    # each block's decompressed span must reassemble the original bytes
    spans = list(ustarts[1:]) + [total_u]
    with open(path, "rb") as f:
        raw = f.read()
    out = b""
    for c, u0, u1 in zip(coffs, ustarts, spans):
        piece = gzip.decompress(raw[c:])  # gzip stops at first member? no —
        # gzip.decompress concatenates members; take just this block's span
        out += piece[: u1 - u0]
        if len(out) >= total_u:
            break
    assert out[:total_u] == buf


def test_scan_rejects_plain_gzip(tmp_path):
    p = tmp_path / "s.fastq.gz"
    p.write_bytes(gzip.compress(b"@r\nAC\n+\n!!\n"))
    with pytest.raises(ValueError, match="BGZF"):
        bt.scan_bgzf_blocks(str(p))


def test_bgzf_reader_from_virtual_offsets(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=2000)
    coffs, ustarts, total_u = bt.scan_bgzf_blocks(path)
    # from every block start, and from interior offsets, the stream must
    # continue byte-exact to EOF
    probes = [(int(c) << 16 | 0, int(u)) for c, u in zip(coffs, ustarts)]
    probes += [(int(coffs[0]) << 16 | 777, 777),
               (int(coffs[-1]) << 16 | 5, int(ustarts[-1]) + 5)]
    for voff, u in probes:
        r = bt.BgzfReader(path, voffset=voff)
        out = bytearray()
        chunk = bytearray(1 << 16)
        while True:
            n = r.readinto(memoryview(chunk))
            if n == 0:
                break
            out += chunk[:n]
        r.close()
        assert bytes(out) == buf[u:]


def test_bgzf_reader_rejects_past_end(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=50)
    coffs, ustarts, total_u = bt.scan_bgzf_blocks(path)
    with pytest.raises(ValueError, match="past the decompressed"):
        bt.BgzfReader(path, voffset=(int(coffs[-1]) << 16)
                      | (total_u - int(ustarts[-1]) + 10))


@pytest.mark.parametrize("stride", [1, 7, 100])
def test_build_fqi_bgzf_checkpoints(tmp_path, stride):
    path, buf = _mk_bgzf(tmp_path, n=600)
    ix = bt.build_fqi(path, stride=stride)
    recs = _all_records(buf)
    assert ix.bgzf
    assert ix.n_records == len(recs) == 600
    assert ix.n_bases == sum(len(r.sequence_bytes()) for r in recs)
    assert ix.n_bytes == os.path.getsize(path)  # compressed size
    assert len(ix.offsets) == -(-600 // stride)
    # every checkpoint virtual offset must land on the '@' of record
    # k*stride and parse out exactly the residual tail
    for k in [0, len(ix.offsets) // 2, len(ix.offsets) - 1]:
        voff = int(ix.offsets[k])
        tail = list(bt.FastqParser(
            bt.BgzfReader(path, voffset=voff)).views(reuse=True))
        assert len(tail) == 600 - k * stride


def test_fqi_roundtrip_preserves_bgzf_flag(tmp_path):
    path, _ = _mk_bgzf(tmp_path, n=80)
    ix = bt.build_fqi(path, stride=9)
    side = tmp_path / "r.fastq.gz.fqi"
    bt.write_fqi(ix, side)
    ix2 = bt.read_fqi(side)
    assert ix2.bgzf and ix2.stride == 9
    assert np.array_equal(ix2.offsets, ix.offsets)
    # and a plain index still reads back as bgzf=False
    header = side.read_text().splitlines()[0]
    assert "bgzf=1" in header


def test_indexed_fastq_fetch_bgzf_matches_sequential(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=400)
    recs = _all_records(buf)
    with bt.IndexedFastq(path, stride=37) as ix:
        assert len(ix) == 400
        for start, count in [(0, 1), (0, 5), (36, 2), (37, 1), (38, 3),
                             (395, 10), (399, 1), (123, 50)]:
            got = ix.fetch(start, count)
            want = recs[start: start + count]
            assert len(got) == len(want)
            for g, w in zip(got, want):
                assert g.id_bytes() == w.id_bytes()
                assert g.sequence_bytes() == w.sequence_bytes()
                assert g.quality_bytes() == w.quality_bytes()
        with pytest.raises(IndexError):
            ix.fetch(400)
        assert ix.fetch(10, 0) == []


def test_shard_records_cover_exactly_bgzf(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=997)
    recs = _all_records(buf)
    with bt.IndexedFastq(path, stride=50) as ix:
        for n in [1, 2, 3, 8, 64]:
            shards = ix.shard_records(n)
            assert shards[0][0] == 0
            assert sum(c for _, c in shards) == 997
            # contiguity
            for i in range(len(shards) - 1):
                assert shards[i][0] + shards[i][1] == shards[i + 1][0]
            # each shard streams exactly its records
            seen = 0
            for start, count in shards:
                got = list(ix.stream_records(start, count))
                assert len(got) == count
                assert got[0].id_bytes() == recs[start].id_bytes()
                assert got[-1].id_bytes() == \
                    recs[start + count - 1].id_bytes()
                seen += count
            assert seen == 997
        with pytest.raises(ParseError, match="shard_records"):
            ix.shard_ranges(4)


def test_shard_records_plain_matches_bgzf(tmp_path):
    # the format-agnostic sharding API returns identical record cuts for
    # the same content, compressed or not
    pp, buf = _mk_bgzf(tmp_path, n=300, name="a.fastq.gz")
    plain = tmp_path / "a.fastq"
    plain.write_bytes(buf)
    with bt.IndexedFastq(str(plain), stride=17) as ixp, \
            bt.IndexedFastq(pp, stride=17) as ixg:
        assert ixp.shard_records(5) == ixg.shard_records(5)
        a = [r.sequence_bytes() for r in ixp.stream_records(100, 40)]
        b = [r.sequence_bytes() for r in ixg.stream_records(100, 40)]
        assert a == b


def test_stale_bgzf_sidecar_rebuilt(tmp_path):
    path, buf = _mk_bgzf(tmp_path, n=60)
    with bt.IndexedFastq(path, stride=8) as ix:
        assert ix.index.n_records == 60
    # a plain-offset sidecar for a .gz (e.g. written by an older build)
    # must not be trusted: flag mismatch forces a rebuild
    side = tmp_path / "r.fastq.gz.fqi"
    ix0 = bt.read_fqi(side)
    stale = bt.FastqIndex(stride=8, n_records=60, n_bases=ix0.n_bases,
                          n_bytes=ix0.n_bytes, offsets=ix0.offsets,
                          bgzf=False)
    bt.write_fqi(stale, side)
    with bt.IndexedFastq(path, stride=8) as ix2:
        assert ix2.index.bgzf
        assert ix2.fetch(59)[0].id_bytes()


def test_cli_fqidx_bgzf(tmp_path, capsys):
    from blazeseq_tpu.__main__ import main

    path, buf = _mk_bgzf(tmp_path, n=30)
    assert main(["fqidx", "--stride", "4", path]) == 0
    assert os.path.exists(path + ".fqi")
    capsys.readouterr()
    assert main(["fqidx", "--fetch", "27", "--count", "2", path]) == 0
    out = capsys.readouterr().out
    recs = _all_records(buf)
    assert recs[27].id_bytes().decode() in out
    assert recs[28].id_bytes().decode() in out
