"""IO round-trip integration tests (port of tests/fastq/test_fastq_integration.mojo
and tests/io/test_readers.mojo / test_writers.mojo essentials):
read -> parse -> write -> re-parse full-record equality across
{plain, gzip} x {plain, gzip}."""

import os

import pytest

import blazeseq_tpu as bt

DATA = os.path.join(os.path.dirname(__file__), "data", "fastq_parser")


def _records(parser):
    return [(r.id_bytes(), r.sequence_bytes(), r.quality_bytes())
            for r in parser.records()]


def _write_fastq(records, writer):
    for rid, seq, qual in records:
        writer.write_bytes(b"@%s\n%s\n+\n%s\n" % (rid, seq, qual))
    writer.flush()


@pytest.mark.parametrize("src_gz", [False, True])
@pytest.mark.parametrize("dst_gz", [False, True])
def test_fastq_roundtrip_matrix(tmp_path, src_gz, dst_gz):
    src = os.path.join(DATA, "example.fastq.gz" if src_gz else "example.fastq")
    reader = bt.ParallelGzipReader(src) if src_gz else bt.FileReader(src)
    recs = _records(bt.FastqParser(reader))
    assert len(recs) == 3

    out = str(tmp_path / ("out.fastq.gz" if dst_gz else "out.fastq"))
    w = (bt.buffered_writer_for_gzip(out) if dst_gz
         else bt.buffered_writer_for_file(out))
    _write_fastq(recs, w)
    w.close()

    reader2 = bt.ParallelGzipReader(out) if dst_gz else bt.FileReader(out)
    assert _records(bt.FastqParser(reader2)) == recs


def test_fastq_roundtrip_synthetic_1000(tmp_path):
    buf = bytes(bt.generate_synthetic_fastq_buffer(1000, 50, 150, 2, 40,
                                                   "sanger"))
    recs = _records(bt.FastqParser(bt.MemoryReader(buf)))
    out = str(tmp_path / "synthetic.fastq.gz")
    w = bt.buffered_writer_for_gzip(out)
    for v in bt.FastqParser(bt.MemoryReader(buf)).views():
        v.write(w)
    w.close()
    assert _records(bt.FastqParser(bt.ParallelGzipReader(out))) == recs


def test_record_write_serialization():
    r = bt.FastqRecord("id1 desc", "ACGT", "IIII")
    assert r.to_bytes() == b"@id1 desc\nACGT\n+\nIIII\n"
    assert r.byte_len() == len(r.to_bytes())


def test_gzwriter_produces_valid_gzip(tmp_path):
    import gzip

    out = str(tmp_path / "x.gz")
    w = bt.buffered_writer_for_gzip(out)
    w.write_bytes(b"hello world\n" * 100)
    w.close()
    with gzip.open(out, "rb") as f:
        assert f.read() == b"hello world\n" * 100


def test_buffered_writer_autoflush(tmp_path):
    out = str(tmp_path / "x.bin")
    w = bt.BufferedWriter(bt.FileWriter(out), capacity=16)
    w.write_bytes(b"A" * 40)  # exceeds capacity: auto-flush
    assert os.path.getsize(out) >= 40
    w.close()


def test_memory_writer():
    w = bt.buffered_writer_for_memory()
    w.write(b"abc", "def")
    w.flush()
    assert w._backend.getvalue() == b"abcdef"


def test_file_reader_short_reads(tmp_path):
    p = str(tmp_path / "f.bin")
    with open(p, "wb") as f:
        f.write(b"x" * 1000)
    r = bt.FileReader(p)
    mv = memoryview(bytearray(64))
    total = 0
    while True:
        n = r.readinto(mv)
        if n == 0:
            break
        total += n
    assert total == 1000
    r.close()


def test_memory_reader_reset():
    r = bt.MemoryReader(b"hello")
    mv = memoryview(bytearray(10))
    assert r.readinto(mv) == 5
    assert r.readinto(mv) == 0
    r.reset()
    assert r.readinto(mv) == 5


def test_gzfile_multimember():
    """bgzip files are multi-member gzip; GZFile must cross member bounds."""
    p = os.path.join(DATA, "example.fastq.bgz")
    recs = _records(bt.FastqParser(bt.GZFile(p)))
    assert len(recs) == 3


def test_parallel_gzip_bgzf_detection():
    from blazeseq_tpu.io.readers import _is_bgzf

    with open(os.path.join(DATA, "example.fastq.bgz"), "rb") as f:
        assert _is_bgzf(f.read(64))
    with open(os.path.join(DATA, "example.fastq.gz"), "rb") as f:
        head = f.read(64)
    # plain gzip may or may not have extra fields; just must not crash
    _is_bgzf(head)
