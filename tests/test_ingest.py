"""Overlapped host->HBM ingest (parallel/ingest.py).

Covers the deferred-sync queue itself (dispatch-order delivery, buffer
recycling, early-sync stashing), a wall-clock proof that host fill and
device compute genuinely overlap (async dispatch), and QCModel end-to-end
parity when a chunk deep inside a multi-chunk overlapped run fails the
device proof — the late-failure stream-reconstruction paths of
models/qc.py. Spec: SURVEY §7.3 (host-to-HBM ingest is the critical path);
reference analog blazeseq/fastq/record_batch.mojo:308-401 staged uploads.
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import blazeseq_tpu as bt
from blazeseq_tpu.models import QCModel
from blazeseq_tpu.parallel.ingest import OverlappedIngest


# ---------------------------------------------------------------- unit level

def test_deferred_order_and_drain():
    csize = 64

    @jax.jit
    def _s(c, nv):
        return c.astype(jnp.int32).sum() + nv

    ing = OverlappedIngest(lambda c, nv: _s(c, jnp.int32(nv)), csize,
                           depth=2)
    got = []
    for k in range(7):
        arr = np.full(csize, k, np.uint8)
        ready = ing.feed(arr, k + 1, meta=k, owned=False)
        # a chunk's result is withheld until it is `depth` dispatches old
        assert len(ready) == (1 if k >= 2 else 0)
        got += ready
    got += ing.drain()
    assert [m for m, _ in got] == list(range(7))
    for k, (_m, out) in enumerate(got):
        assert int(out) == csize * k + k + 1


def test_acquire_recycles_and_early_sync():
    # fewer buffers than depth+1: acquire() must sync the oldest in-flight
    # chunk to free its buffer, and its result must still arrive, in order,
    # through the next feed()/drain()
    csize = 32

    @jax.jit
    def _s(c, nv):
        return c[:1].astype(jnp.int32)[0] * 0 + nv

    ing = OverlappedIngest(lambda c, nv: _s(c, jnp.int32(nv)), csize,
                           depth=3, n_buffers=2)
    got = []
    for k in range(8):
        b = ing.acquire()
        b[:] = k
        got += ing.feed(b, k, meta=k)
    got += ing.drain()
    assert [m for m, _ in got] == list(range(8))
    assert [int(o) for _m, o in got] == list(range(8))


def test_acquire_without_recyclable_buffer_raises():
    ing = OverlappedIngest(lambda c, nv: None, 8, depth=2, n_buffers=1)
    ing.acquire()  # the only buffer, never fed back
    with pytest.raises(RuntimeError):
        ing.acquire()


def test_owned_false_never_recycled_into_free_pool():
    @jax.jit
    def _s(c, nv):
        return c.astype(jnp.int32).sum() + nv

    ing = OverlappedIngest(lambda c, nv: _s(c, jnp.int32(nv)), 16,
                           depth=1, n_buffers=1)
    ro = np.arange(16, dtype=np.uint8)
    ing.feed(ro, 1, owned=False)
    ing.drain()
    mine = ing.acquire()  # must be the staging buffer, not the caller's
    assert mine is not ro
    mine[:] = 0
    assert ro.sum() > 0


# ------------------------------------------------------------ overlap proof

@pytest.mark.skipif((os.cpu_count() or 1) < 2, reason=
                    "overlap is physically impossible when the host fill "
                    "and the CPU-backend device step share one core")
def test_ingest_overlaps_host_fill_and_device_compute():
    """Wall-clock: overlapped feed must beat serial fill+sync. The host
    'fill' is a sleep (holds no core), the device step is real XLA compute,
    so any speedup can only come from async dispatch overlapping the two."""
    csize = 256

    @jax.jit
    def _s(c, nv):
        a = jnp.full((512, 512), 1e-6, jnp.float32) + c[0] * 0.0
        for _ in range(4):
            a = a @ a
        return a.sum() + nv

    step = lambda c, nv: _s(c, jnp.int32(nv))
    arr = np.zeros(csize, np.uint8)
    jax.block_until_ready(step(jnp.asarray(arr), 1))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(step(jnp.asarray(arr), 1))
    dt = max(time.perf_counter() - t0, 0.02)
    fill = 1.5 * dt
    N = 5

    def serial():
        t0 = time.perf_counter()
        for k in range(N):
            time.sleep(fill)
            jax.block_until_ready(step(jnp.asarray(arr), k))
        return time.perf_counter() - t0

    def overlapped():
        ing = OverlappedIngest(step, csize, depth=2)
        t0 = time.perf_counter()
        for k in range(N):
            time.sleep(fill)
            ing.feed(arr, k, owned=False)
        ing.drain()
        return time.perf_counter() - t0

    # Ideal ratio here is ~(N*fill + dt) / (N*(fill + dt)) ~= 0.68. The
    # dev host is a 1-vCPU VM with ~2x scheduling noise, so a single pair
    # of timings can invert under load; overlap is proven by ANY clean
    # measurement round, so retry the pair a few times.
    last = None
    for _ in range(4):
        s = min(serial(), serial())
        o = min(overlapped(), overlapped())
        last = (o, s)
        if o < 0.9 * s:
            break
    else:
        raise AssertionError("no overlap in any round: o=%.3fs s=%.3fs"
                             % last)


# ------------------------------------- end-to-end: late failures, full pipe

def _reports_equal(a, b):
    da, db = a.to_dict(), b.to_dict()
    assert set(da) == set(db)
    for k in da:
        va, vb = da[k], db[k]
        if isinstance(va, float):
            assert va == pytest.approx(vb), k
        else:
            assert va == vb, k


def _uniform_corpus(n, L=60):
    return bytes(bt.generate_synthetic_fastq_buffer(n, L, L, 2, 40,
                                                    "sanger"))


def _corrupt_quality(buf, rec_idx):
    """A below-schema quality byte in record rec_idx: the owning device
    chunk rejects; the host engine counts it as one error read."""
    lines = bytes(buf).split(b"\n")
    qpos = sum(len(ln) + 1 for ln in lines[: rec_idx * 4 + 3])
    b = bytearray(buf)
    b[qpos + 2] = 0x20
    return bytes(b)


def _corrupt_structure(buf, rec_idx):
    """Break the '@' header marker: the layout/template proof itself fails
    for the owning chunk (host engine raises -> counted via its own rules)."""
    lines = bytes(buf).split(b"\n")
    hpos = sum(len(ln) + 1 for ln in lines[: rec_idx * 4])
    b = bytearray(buf)
    b[hpos] = ord("X")
    return bytes(b)


_N = 60_000  # ~8 MB at 60 bp -> ~8 chunks at chunk_mb=1, so failures land
# while later chunks are already dispatched (in flight)


@pytest.mark.parametrize("frac", [0.02, 0.55, 0.99])
def test_mmap_quality_failure_with_chunks_in_flight(tmp_path, frac):
    buf = _uniform_corpus(_N)
    assert len(buf) > 6 << 20
    bad = _corrupt_quality(buf, int(_N * frac))
    p = tmp_path / "mid.fastq"
    p.write_bytes(bad)
    m = QCModel(quality_schema="sanger", check_quality=True, max_read_len=64)
    host = m.run_file(str(p))
    dev = m.run_file_device(str(p), chunk_mb=1)
    assert host.error_reads == 1
    assert host.reads == _N
    _reports_equal(host, dev)


@pytest.mark.parametrize("frac", [0.03, 0.60])
def test_gzip_stream_failure_with_chunks_in_flight(tmp_path, frac):
    import gzip as _gz

    buf = _uniform_corpus(_N)
    bad = _corrupt_quality(buf, int(_N * frac))
    p = tmp_path / "mid.fastq.gz"
    p.write_bytes(_gz.compress(bad, 1))
    m = QCModel(quality_schema="sanger", check_quality=True, max_read_len=64)
    host = m.run_file(str(p))
    dev = m.run_file_device(str(p), chunk_mb=1)
    assert host.error_reads == 1
    assert host.reads == _N
    _reports_equal(host, dev)


def test_gzip_stream_structural_failure_mid_stream(tmp_path):
    import gzip as _gz

    buf = _uniform_corpus(20_000)
    bad = _corrupt_structure(buf, 11_000)
    p = tmp_path / "s.fastq.gz"
    p.write_bytes(_gz.compress(bad, 1))
    m = QCModel(quality_schema="sanger", max_read_len=64)
    with pytest.raises(Exception):
        m.run_file(str(p))
    with pytest.raises(Exception):
        m.run_file_device(str(p), chunk_mb=1)


def test_mmap_clean_multichunk_overlapped_parity(tmp_path):
    buf = _uniform_corpus(_N)
    p = tmp_path / "clean.fastq"
    p.write_bytes(buf)
    m = QCModel(quality_schema="sanger", check_quality=True, max_read_len=64)
    host = m.run_file(str(p))
    dev = m.run_file_device(str(p), chunk_mb=1)
    assert dev.reads == _N
    _reports_equal(host, dev)
