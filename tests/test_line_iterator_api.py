"""LineIterator non-refilling API: next_complete_line / peek / read_exact
(reference: blazeseq/io/buffered.mojo:641-705, tests/io/test_line_iterator.mojo)."""

import pytest

import blazeseq_tpu as bt
from blazeseq_tpu import LineIterator, LineIteratorError
from blazeseq_tpu.errors import FastxEOFError


class Chunky:
    """File-like yielding at most `size` bytes per readinto (forces refills)."""

    def __init__(self, data, size):
        self._d = memoryview(data)
        self._i = 0
        self._size = size

    def readinto(self, mv):
        n = min(len(mv), self._size, len(self._d) - self._i)
        mv[:n] = self._d[self._i : self._i + n]
        self._i += n
        return n

    def close(self):
        pass


def test_next_complete_line_happy_path():
    it = LineIterator(bt.MemoryReader(b"abc\ndef\r\nghi"))
    assert bytes(it.next_complete_line()) == b"abc"
    assert bytes(it.next_complete_line()) == b"def"  # CR trimmed
    # unterminated final line is returned at EOF (memory source is at EOF)
    assert bytes(it.next_complete_line()) == b"ghi"
    with pytest.raises(LineIteratorError) as ei:
        it.next_complete_line()
    assert ei.value.code == LineIteratorError.EOF


def test_next_complete_line_incomplete_without_refill():
    # chunk size 4: after 'ab\nc' is buffered, 'c...' has no newline yet
    it = LineIterator(Chunky(b"ab\ncdef\n", 4), chunk_size=4)
    assert bytes(it.next_complete_line()) == b"ab"
    with pytest.raises(LineIteratorError) as ei:
        it.next_complete_line()
    assert ei.value.code == LineIteratorError.INCOMPLETE_LINE
    # fallback contract: next_line() refills and succeeds
    assert bytes(it.next_line()) == b"cdef"


def test_peek_does_not_consume():
    it = LineIterator(bt.MemoryReader(b"hello\nworld\n"))
    assert bytes(it.peek(5)) == b"hello"
    assert bytes(it.peek(7)) == b"hello\nw"
    assert bytes(it.next_line()) == b"hello"
    assert bytes(it.next_line()) == b"world"


def test_read_exact_across_refills():
    it = LineIterator(Chunky(b"0123456789ABCDEF", 3), chunk_size=4)
    assert bytes(it.read_exact(10)) == b"0123456789"
    assert bytes(it.read_exact(6)) == b"ABCDEF"
    with pytest.raises(FastxEOFError):
        it.read_exact(1)


def test_read_exact_short_stream_raises():
    it = LineIterator(bt.MemoryReader(b"abc"))
    with pytest.raises(FastxEOFError):
        it.read_exact(4)


def test_read_exact_then_line_numbers_stay_consistent():
    it = LineIterator(bt.MemoryReader(b"a\nb\nc\nrest\n"))
    it.read_exact(4)  # consumes "a\nb\n" = two lines
    assert it.get_line_number() == 2
    assert bytes(it.next_line()) == b"c"
    assert bytes(it.next_line()) == b"rest"
