"""Multi-host input sharding tests: record-boundary splits, shard coverage,
merged results identical regardless of shard count."""

import os

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.parallel.sharding import (
    RangeReader,
    find_record_boundary,
    open_shard,
    shard_file,
)
from blazeseq_tpu.tracing import Tracer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shard") / "corpus.fastq")
    buf = bt.generate_synthetic_fastq_buffer(5000, 30, 150, 2, 40, "sanger")
    with open(path, "wb") as f:
        f.write(buf)
    return path


def test_boundary_is_record_start(corpus):
    size = os.path.getsize(corpus)
    with open(corpus, "rb") as f:
        data = f.read()
    # golden record starts
    starts = {0}
    pos = 0
    while True:
        count = 0
        p = pos
        for _ in range(4):
            nl = data.find(b"\n", p)
            if nl < 0:
                break
            p = nl + 1
            count += 1
        if count < 4:
            break
        pos = p
        starts.add(pos)
    for probe in [0, 1, 100, size // 3, size // 2, size - 10, size + 5]:
        b = find_record_boundary(corpus, probe)
        assert b == size or b in starts
        assert b >= min(probe, size)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 8])
def test_shards_cover_and_agree(corpus, n):
    ranges = shard_file(corpus, n)
    size = os.path.getsize(corpus)
    # exact coverage, no overlap
    assert ranges[0][0] == 0 and ranges[-1][1] == size
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0
    total_records = 0
    total_bases = 0
    for i in range(n):
        p = bt.FastqParser(open_shard(corpus, n, i))
        r, b = p.count()
        total_records += r
        total_bases += b
    whole_r, whole_b = bt.FastqParser(bt.FileReader(corpus)).count()
    assert (total_records, total_bases) == (whole_r, whole_b) == (5000, whole_b)


def test_shard_records_match_sequential(corpus):
    seq_ids = [r.id_bytes() for r in
               bt.FastqParser(bt.FileReader(corpus)).records()]
    got = []
    for i in range(4):
        got.extend(r.id_bytes() for r in
                   bt.FastqParser(open_shard(corpus, 4, i)).records())
    assert got == seq_ids


def test_quality_line_at_boundary_not_mistaken(tmp_path):
    """A quality line starting with '@' must not be picked as a record start."""
    # record whose quality line starts with '@'
    data = (b"@r1\nACGT\n+\n@@@@\n" * 50)
    path = str(tmp_path / "tricky.fastq")
    with open(path, "wb") as f:
        f.write(data)
    ranges = shard_file(path, 3)
    tot = 0
    for a, b in ranges:
        p = bt.FastqParser(RangeReader(path, a, b))
        r, _ = p.count()
        tot += r
    assert tot == 50


def test_fqi_sidecar_gives_exact_cuts(corpus, tmp_path):
    """With a fresh .fqi sidecar, shard_file cuts exactly on indexed record
    starts (no probe heuristic), still covering the file; a stale sidecar is
    ignored, falling back to the heuristic path."""
    import shutil

    path = str(tmp_path / "c.fastq")
    shutil.copy(corpus, path)
    ix = bt.build_fqi(path, stride=100)
    bt.write_fqi(ix, path + ".fqi")
    size = os.path.getsize(path)
    for n in [2, 5, 8]:
        ranges = shard_file(path, n)
        assert ranges[0][0] == 0 and ranges[-1][1] == size
        offs = set(int(o) for o in ix.offsets)
        for lo, _ in ranges[1:]:
            assert lo == size or lo in offs  # cut is a PROVEN record start
        tot = 0
        for a, b in ranges:
            tot += bt.FastqParser(RangeReader(path, a, b)).count()[0]
        assert tot == 5000
    # stale sidecar: append a record, size no longer matches -> heuristic
    with open(path, "ab") as f:
        f.write(b"@x\nAC\n+\n!!\n")
    ranges = shard_file(path, 3)
    tot = sum(bt.FastqParser(RangeReader(path, a, b)).count()[0]
              for a, b in ranges)
    assert tot == 5001


def test_tracer_sections():
    tr = Tracer()
    with tr.section("a"):
        with tr.section("b"):
            tr.count("items", 5)
    rep = tr.report()
    assert "a" in rep and "b" in rep and "items" in rep
    assert tr.calls["a"] == 1 and tr.counters["items"] == 5
