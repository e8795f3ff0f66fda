"""Byte sinks (reference: blazeseq/io/writers.mojo, blazeseq/io/buffered.mojo:330-506).

The reference WriterBackend trait has one method
``write_from_buffer(span, amt, pos)`` (writers.mojo:13-41); here a writer is any
object with ``write(bytes-like) -> int`` and ``close()``. `BufferedWriter`
accumulates into a bytearray and auto-flushes on overflow, flushes on close and
on context-manager exit (destructor-flush analog, buffered.mojo:475-482).
"""

from __future__ import annotations

import zlib

from ..constants import DEFAULT_CAPACITY


class FileWriter:
    def __init__(self, path):
        self._f = open(path, "wb", buffering=0)

    def write(self, data) -> int:
        return self._f.write(data)

    def close(self) -> None:
        self._f.close()


class MemoryWriter:
    def __init__(self):
        self._buf = bytearray()

    def write(self, data) -> int:
        self._buf += data
        return len(data)

    def getvalue(self) -> bytes:
        return bytes(self._buf)

    def close(self) -> None:
        pass


class GZWriter:
    """Gzip sink (reference: writers.mojo:159-225)."""

    def __init__(self, path, level: int = 6):
        self._f = open(path, "wb", buffering=0)
        self._comp = zlib.compressobj(level, zlib.DEFLATED, 31)
        self._closed = False

    def write(self, data) -> int:
        out = self._comp.compress(bytes(data))
        if out:
            self._f.write(out)
        return len(data)

    def close(self) -> None:
        if not self._closed:
            self._f.write(self._comp.flush())
            self._f.close()
            self._closed = True


class BufferedWriter:
    """Buffered sink with auto-flush on full (reference: buffered.mojo:330-506)."""

    def __init__(self, backend, capacity: int = DEFAULT_CAPACITY):
        self._backend = backend
        self._capacity = capacity
        self._buf = bytearray()

    def write_bytes(self, data) -> None:
        self._buf += data
        if len(self._buf) >= self._capacity:
            self.flush()

    def write(self, *parts) -> None:
        for p in parts:
            if isinstance(p, str):
                p = p.encode()
            self.write_bytes(p)

    def flush(self) -> None:
        if self._buf:
            self._backend.write(self._buf)
            self._buf.clear()

    def close(self) -> None:
        self.flush()
        self._backend.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def buffered_writer_for_file(path, capacity: int = DEFAULT_CAPACITY) -> BufferedWriter:
    return BufferedWriter(FileWriter(path), capacity)


def buffered_writer_for_memory(capacity: int = DEFAULT_CAPACITY) -> BufferedWriter:
    return BufferedWriter(MemoryWriter(), capacity)


def buffered_writer_for_gzip(path, capacity: int = DEFAULT_CAPACITY) -> BufferedWriter:
    return BufferedWriter(GZWriter(path), capacity)
