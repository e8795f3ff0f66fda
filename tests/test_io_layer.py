"""Buffered-IO layer invariants (reference test model: tests/io/
test_iostream.mojo, test_line_iterator.mojo, test_readers.mojo,
test_writers.mojo, test_delimited.mojo — consume/position invariants,
line-ending matrix, tiny-capacity refill boundaries, writer flush semantics,
delimited field handling)."""

import gzip as _gzip
import zlib

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import LineIterator
from blazeseq_tpu.errors import FastxEOFError, ParseError
from blazeseq_tpu.io.buffered import ByteStream
from blazeseq_tpu.io.delimited import DelimitedReader, LineAction


class Chunky:
    def __init__(self, data, size):
        self._d = memoryview(bytes(data))
        self._i = 0
        self._size = size

    def readinto(self, mv):
        n = min(len(mv), self._size, len(self._d) - self._i)
        mv[:n] = self._d[self._i : self._i + n]
        self._i += n
        return n

    def close(self):
        pass


# ---------------------------------------------------------------------------
# ByteStream
# ---------------------------------------------------------------------------

def test_bytestream_consume_and_stream_position():
    s = ByteStream(Chunky(b"0123456789", 4), chunk_size=4)
    assert s.stream_position() == 0
    s.fill()
    assert s.available() == 4
    s.consume(2)
    assert s.stream_position() == 2
    assert s.available() == 2
    s.fill()
    s.consume(s.available())
    while s.fill():
        s.consume(s.available())
    assert s.stream_position() == 10
    assert s.is_eof() and not s.has_more()


def test_bytestream_compaction_reanchors_offsets():
    """After a fill that compacts, last_shift reports how far absolute
    offsets moved."""
    s = ByteStream(Chunky(bytes(range(100)) * 10, 8), chunk_size=8)
    s.fill()
    s.consume(6)
    shifts = 0
    while not s.is_eof():
        before = s._head
        s.fill()
        if s.last_shift:
            shifts += 1
            assert s.last_shift == before - s._head
        s.consume(min(3, s.available()))
    assert shifts > 0  # compaction happened at least once


def test_bytestream_memory_source_zero_copy():
    s = ByteStream(bt.MemoryReader(b"hello world"))
    assert s.is_eof()  # whole stream addressable upfront
    assert bytes(s.window().tobytes()) == b"hello world"
    assert s.fill() == 0


# ---------------------------------------------------------------------------
# LineIterator: line-ending matrix + capacity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data,expect", [
    (b"a\nb\nc\n", [b"a", b"b", b"c"]),
    (b"a\r\nb\r\n", [b"a", b"b"]),                 # CRLF trimmed
    (b"a\rb\nc\n", [b"a\rb", b"c"]),               # bare CR is content
    (b"a\nb", [b"a", b"b"]),                       # no trailing newline
    (b"\n\na\n", [b"", b"", b"a"]),                # empty lines preserved
    (b"", []),
])
def test_line_endings_matrix(data, expect):
    for chunk in (None, 3):
        reader = bt.MemoryReader(data) if chunk is None else Chunky(data, chunk)
        it = LineIterator(reader)
        assert [bytes(l) for l in it] == expect


def test_line_number_and_position_tracking():
    data = b"one\ntwo\nthree\n"
    it = LineIterator(Chunky(data, 5), chunk_size=8)
    assert it.get_line_number() == 0
    next(it)
    assert it.get_line_number() == 1
    assert it.get_file_position() == 0  # position of the line just served
    next(it)
    assert it.get_file_position() == 4
    next(it)
    assert it.stream_position() == len(data)


def test_line_exceeding_capacity_raises():
    it = LineIterator(Chunky(b"x" * 100 + b"\n", 8), capacity=16, chunk_size=8)
    with pytest.raises(ParseError) as ei:
        next(it)
    assert "capacity" in str(ei.value)


def test_line_exceeding_capacity_grows_when_enabled():
    it = LineIterator(Chunky(b"x" * 100 + b"\nrest\n", 8), capacity=16,
                      growth_enabled=True, chunk_size=8)
    assert bytes(it.next_line()) == b"x" * 100
    assert bytes(it.next_line()) == b"rest"


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------

def test_gzfile_reads_and_eof(tmp_path):
    raw = b"@r1\nACGT\n+\nIIII\n" * 100
    p = tmp_path / "x.fastq.gz"
    p.write_bytes(_gzip.compress(raw))
    r = bt.GZFile(str(p))
    out = bytearray()
    buf = bytearray(64)
    while True:
        n = r.readinto(memoryview(buf))
        if n == 0:
            break
        out += buf[:n]
    assert bytes(out) == raw
    r.close()


def test_parallel_gzip_plain_stream(tmp_path):
    raw = bytes(bt.generate_synthetic_fastq_buffer(500, 60, 60, 2, 40,
                                                   "sanger"))
    p = tmp_path / "c.fastq.gz"
    p.write_bytes(_gzip.compress(raw))
    parser = bt.FastqParser(bt.ParallelGzipReader(str(p), parallelism=2))
    assert parser.count() == (500, 500 * 60)


def test_parallel_gzip_multimember(tmp_path):
    raw1 = b"@a\nAC\n+\nII\n"
    raw2 = b"@b\nGT\n+\nII\n"
    p = tmp_path / "m.fastq.gz"
    p.write_bytes(_gzip.compress(raw1) + _gzip.compress(raw2))
    parser = bt.FastqParser(bt.ParallelGzipReader(str(p)))
    ids = [r.id() for r in parser.records()]
    assert ids == ["a", "b"]


def test_open_reader_suffix_dispatch(tmp_path):
    raw = b"@a\nAC\n+\nII\n"
    plain = tmp_path / "a.fastq"
    plain.write_bytes(raw)
    gz = tmp_path / "a.fastq.gz"
    gz.write_bytes(_gzip.compress(raw))
    assert isinstance(bt.open_reader(str(plain)), bt.FileReader)
    assert isinstance(bt.open_reader(str(gz)), bt.ParallelGzipReader)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

def test_buffered_writer_flush_on_capacity_and_close(tmp_path):
    mw = bt.MemoryWriter()
    w = bt.BufferedWriter(mw, capacity=8)
    w.write_bytes(b"1234")
    assert mw.getvalue() == b""          # below capacity: buffered
    w.write_bytes(b"56789")
    assert mw.getvalue() == b"123456789"  # auto-flush on overflow
    w.write_bytes(b"ab")
    w.close()                             # destructor-flush analog
    assert mw.getvalue() == b"123456789ab"


def test_buffered_writer_context_manager_flushes():
    mw = bt.MemoryWriter()
    with bt.BufferedWriter(mw, capacity=1024) as w:
        w.write("text-", b"bytes")
    assert mw.getvalue() == b"text-bytes"


def test_gzwriter_roundtrip_via_gzfile(tmp_path):
    p = tmp_path / "w.gz"
    w = bt.GZWriter(str(p))
    payload = b"@q\nACGTACGT\n+\nIIIIIIII\n" * 50
    w.write(payload)
    w.close()
    assert _gzip.decompress(p.read_bytes()) == payload
    # and parseable through the framework's own gzip reader
    parser = bt.FastqParser(bt.GZFile(str(p)))
    assert parser.count() == (50, 400)


def test_buffered_writer_for_gzip_factory(tmp_path):
    p = tmp_path / "f.gz"
    with bt.buffered_writer_for_gzip(str(p), capacity=32) as w:
        for i in range(10):
            w.write_bytes(b"@x%d\nAC\n+\nII\n" % i)
    assert _gzip.decompress(p.read_bytes()).count(b"@x") == 10


# ---------------------------------------------------------------------------
# DelimitedReader
# ---------------------------------------------------------------------------

def test_delimited_views_and_records():
    data = b"a\t1\tx\nb\t2\ty\n"
    r = DelimitedReader(bt.MemoryReader(data))
    v = r.next_view()
    assert v.num_fields() == 3
    assert v.get_bytes(0) == b"a" and v[1] == b"1"
    rec = v.to_record()
    assert rec.to_bytes() == b"a\t1\tx"
    assert [row[0] for row in r.records()] == [b"b"]


def test_delimited_field_count_consistency_error():
    data = b"a\t1\nb\t2\t3\n"
    r = DelimitedReader(bt.MemoryReader(data))
    r.next_view()
    with pytest.raises(ParseError):
        r.next_view()


def test_delimited_skip_and_header_policy():
    class Policy:
        def classify(self, line: bytes) -> LineAction:
            if line.startswith(b"#"):
                return LineAction.SKIP
            if line.startswith(b"HDR"):
                return LineAction.HEADER
            return LineAction.YIELD

    data = b"#comment\nHDR\tname\na\t1\n"
    r = DelimitedReader(bt.MemoryReader(data), policy=Policy())
    rows = [row.to_bytes() for row in r.views()]
    assert rows == [b"a\t1"]
    assert r.header() is not None
    assert r.header()[1] == b"name"


def test_delimited_custom_delimiter():
    r = DelimitedReader(bt.MemoryReader(b"a,b,c\n"), delimiter=b",")
    assert r.next_view().num_fields() == 3


def test_bgzf_writer_roundtrip(tmp_path):
    """BGZF output: standard-gzip-decodable, BGZF-detected, parallel-read
    block pool gives identical parse results, bgzip EOF marker present."""
    import gzip as _gz

    payload = b"".join(b"@r%d\nACGTACGT\n+\nIIIIIIII\n" % i
                       for i in range(20000))  # > one 64KB block
    p = tmp_path / "out.fastq.gz"
    w = bt.BGZFWriter(str(p))
    w.write(payload[: 100_000])
    w.write(payload[100_000:])
    w.close()
    raw = p.read_bytes()
    assert raw.endswith(bt.io.writers.BGZFWriter._EOF)
    assert _gz.decompress(raw) == payload
    from blazeseq_tpu.io.readers import _is_bgzf
    assert _is_bgzf(raw[:64])
    parser = bt.FastqParser(bt.ParallelGzipReader(str(p), parallelism=3))
    assert parser.count() == (20000, 160000)
