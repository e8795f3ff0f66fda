"""Scale-proof for the parallel-inflate pools (VERDICT-r3 item 7).

This dev box has ONE vCPU, so real-core speedups cannot be observed here.
These tests instead prove the *pool structure* parallelizes — i.e. that the
dispatch discipline, queue depths, and result ordering allow W workers to
overlap work — by injecting GIL-releasing synthetic stage delays (sleeps)
and asserting the wall time scales like N*d/W, not N*d. A sleep releases
the GIL exactly like zlib/pinflate native calls do, so a pool that passes
with synthetic delays will scale on real cores unless the native stage
itself serializes (it cannot: zlib documents GIL release during
(de)compression, and pinflate chunks are independent C calls).

Covers:
* BGZF block pool (io/readers.ParallelGzipReader._produce_bgzf)
* pugz-style marker-inflate pool (io/pugz.parallel_inflate_stream)
"""

import threading
import time
import zlib

import numpy as np
import pytest

import blazeseq_tpu as bt
from blazeseq_tpu.io import pugz as pugz_mod
from blazeseq_tpu.io import readers as readers_mod
from blazeseq_tpu.io.writers import BGZFWriter


BGZF_BLOCK = 65280  # BGZFWriter's fixed uncompressed block payload


def _mk_bgzf(tmp_path, n_blocks=32):
    n_reads = bt.compute_num_reads_for_size(n_blocks * BGZF_BLOCK, 100, 100)
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        n_reads, 100, 100, 2, 40, "sanger"))
    path = str(tmp_path / "pool.fastq.bgz")
    w = BGZFWriter(path)
    w.write(buf)
    w.close()
    return path, buf


def _timed_read(path, parallelism):
    r = readers_mod.ParallelGzipReader(path, parallelism=parallelism)
    out = bytearray()
    scratch = bytearray(1 << 20)
    t0 = time.perf_counter()
    while True:
        n = r.readinto(memoryview(scratch))
        if n == 0:
            break
        out += scratch[:n]
    dt = time.perf_counter() - t0
    r.close()
    return dt, bytes(out)


def test_bgzf_pool_overlaps_workers(tmp_path, monkeypatch):
    """With a d-second GIL-releasing delay injected per block, W workers
    must finish ~N*d/W, not N*d: proves submit-ahead depth + FIFO result
    collection actually overlap block work."""
    path, buf = _mk_bgzf(tmp_path)
    delay = 0.02

    class SlowZlib:
        compress = staticmethod(zlib.compress)
        compressobj = staticmethod(zlib.compressobj)
        decompressobj = staticmethod(zlib.decompressobj)
        crc32 = staticmethod(zlib.crc32)

        @staticmethod
        def decompress(data, wbits=15, bufsize=16384):
            time.sleep(delay)  # releases the GIL like native inflate
            return zlib.decompress(data, wbits, bufsize)

    monkeypatch.setattr(readers_mod, "zlib", SlowZlib)
    t1, out1 = _timed_read(path, parallelism=2)
    t8, out8 = _timed_read(path, parallelism=8)
    assert out1 == buf and out8 == buf
    n_blocks = -(-len(buf) // BGZF_BLOCK)
    serial_floor = n_blocks * delay
    # 8 workers must beat the 2-worker run decisively, and the 2-worker run
    # must itself beat the serial floor (some overlap even at depth 2)
    assert t8 < serial_floor / 2.5, (t8, serial_floor, n_blocks)
    assert t8 < t1 / 2.0, (t1, t8)


class _Probe:
    """Concurrency high-water tracker for executor-submitted tasks."""

    def __init__(self):
        self.lock = threading.Lock()
        self.cur = 0
        self.peak = 0

    def wrap(self, fn):
        def inner(*a, **k):
            with self.lock:
                self.cur += 1
                self.peak = max(self.peak, self.cur)
            time.sleep(0.005)  # GIL-releasing synthetic stage time
            try:
                return fn(*a, **k)
            finally:
                with self.lock:
                    self.cur -= 1
        return inner


def test_pugz_pool_runs_chunks_concurrently(monkeypatch):
    """The marker-inflate pool must have >= 2 chunk tasks in flight at once
    (probe/decode futures are submitted ahead of consumption)."""
    if pugz_mod.native.pinflate_lib() is None:
        pytest.skip("no native pinflate library")
    buf = bytes(bt.generate_synthetic_fastq_buffer(
        24_000, 100, 100, 2, 40, "sanger"))
    comp = zlib.compressobj(5, zlib.DEFLATED, 31)
    gz = comp.compress(buf) + comp.flush()

    probe = _Probe()
    real_tpe = pugz_mod.ThreadPoolExecutor

    class ProbedExecutor(real_tpe):
        def submit(self, fn, *a, **k):
            return super().submit(probe.wrap(fn), *a, **k)

    monkeypatch.setattr(pugz_mod, "ThreadPoolExecutor", ProbedExecutor)
    out = b"".join(pugz_mod.parallel_inflate_stream(
        gz, parallelism=4, chunk_bytes=256 * 1024))
    assert out == buf
    assert probe.peak >= 2, "pool never had two chunk tasks in flight"


def test_bgzf_pool_worker_sweep_is_monotone(tmp_path, monkeypatch):
    """Worker-count sweep under synthetic delay: wall time must not grow
    with more workers (the scaling claim, minus real cores)."""
    path, buf = _mk_bgzf(tmp_path, n_blocks=32)
    delay = 0.015

    class SlowZlib:
        compress = staticmethod(zlib.compress)
        compressobj = staticmethod(zlib.compressobj)
        decompressobj = staticmethod(zlib.decompressobj)
        crc32 = staticmethod(zlib.crc32)

        @staticmethod
        def decompress(data, wbits=15, bufsize=16384):
            time.sleep(delay)
            return zlib.decompress(data, wbits, bufsize)

    monkeypatch.setattr(readers_mod, "zlib", SlowZlib)
    times = {}
    for w in (2, 4, 8):
        dt, out = _timed_read(path, parallelism=w)
        assert out == buf
        times[w] = dt
    # allow generous scheduler noise; the trend must hold
    assert times[8] <= times[2] * 0.75, times
