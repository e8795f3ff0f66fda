"""Multi-core host feed (parallel/feed.py): shard-parallel parsing must agree
exactly with the serial parser on counts, bases, and per-record content."""

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.errors import FastxError
from blazeseq_tpu.parallel import parallel_count, parallel_padded_batches


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    buf = bytes(bt.generate_synthetic_fastq_buffer(5000, 40, 160, 2, 40,
                                                   "sanger"))
    p = tmp_path_factory.mktemp("feed") / "corpus.fastq"
    p.write_bytes(buf)
    return str(p), buf


def test_parallel_count_matches_serial(corpus_file):
    path, buf = corpus_file
    serial = bt.FastqParser(bt.MemoryReader(buf)).count()
    for workers in (1, 2, 3, 7):
        assert parallel_count(path, workers=workers) == serial


def test_parallel_padded_batches_content(corpus_file):
    path, buf = corpus_file
    golden = {}
    p = bt.FastqParser(bt.MemoryReader(buf))
    for v in p.views():
        golden[bytes(v.sequence_bytes())] = bytes(v.quality_bytes())
    seen = 0
    bases = 0
    for shard_id, pb in parallel_padded_batches(path, workers=3,
                                                max_records=257, max_len=192):
        assert 0 <= shard_id < 3
        for i in range(pb.n_records):
            L = int(pb.lengths[i])
            seq = bytes(pb.seq[i, :L].tobytes())
            assert golden[seq] == bytes(pb.qual[i, :L].tobytes())
            bases += L
        seen += pb.n_records
    assert seen == len(golden) == 5000
    assert bases == sum(len(s) for s in golden)


def test_parallel_feed_error_propagates(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(1000, 50, 50, 2, 40,
                                                   "sanger"))
    bad = bytearray(buf)
    # corrupt a separator deep in the file (lands in a later shard)
    lines = bytes(bad).split(b"\n")
    lines[900 * 4 + 2] = b"*"
    path = tmp_path / "bad.fastq"
    path.write_bytes(b"\n".join(lines))
    with pytest.raises(FastxError):
        for _ in parallel_padded_batches(str(path), workers=3):
            pass
    with pytest.raises(FastxError):
        parallel_count(str(path), workers=3)


def test_single_worker_passthrough(corpus_file):
    path, buf = corpus_file
    serial = bt.FastqParser(bt.MemoryReader(buf)).count()
    n = 0
    for shard_id, pb in parallel_padded_batches(path, workers=1):
        assert shard_id == 0
        n += pb.n_records
    assert n == serial[0]


def test_abandonment_stress_no_deadlock(corpus_file):
    """Random mid-iteration abandonment across worker counts must neither
    deadlock (producers stuck on full queues / empty pools) nor corrupt a
    subsequent full run."""
    import random
    path, buf = corpus_file
    rng = random.Random(3)
    for _ in range(8):
        gen = parallel_padded_batches(path, workers=rng.choice([2, 3, 5]),
                                      max_records=257, max_len=192,
                                      reuse_buffers=True)
        stop_after = rng.randint(0, 10)
        for i, (sid, pb) in enumerate(gen):
            if i >= stop_after:
                break
        gen.close()
    total = sum(pb.n_records for _sid, pb in parallel_padded_batches(
        path, workers=5, max_records=257, max_len=192, reuse_buffers=True))
    assert total == 5000
