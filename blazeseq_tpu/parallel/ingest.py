"""Overlapped host->HBM ingest: the double-buffered chunk feed under the
device parse pipelines.

SURVEY §7.3 names host-to-HBM ingest — not the kernel — as the critical path
for a sustained >1 GB/s/chip pipeline: the feed (read / inflate / memcpy),
the host->device transfer, and the device step must overlap so steady-state
throughput is min(stage rates) rather than their sum. The reference's analog
is the staged upload in blazeseq/fastq/record_batch.mojo:308-401 (pinned
host staging buffers + enqueued async copies); the TPU-native version below
leans on JAX's asynchronous dispatch instead of explicit queues: every
`device_put` and jitted step call returns immediately, and the host only
blocks when it *reads* a result.

The scheme is deferred-sync with rotating host buffers:

  fill buf[k+1]  |  transfer chunk k   |  compute chunk k-1
  (host memcpy / |  (DMA / PCIe; on    |  (TPU; XLA queue)
   readinto)     |   CPU tests, alias) |

A dispatched chunk's result is materialized (synced) only once it is `depth`
dispatches old, so the device works through a queue that the host keeps
non-empty. A host buffer is recycled only after its chunk's result has been
synced: on the CPU test backend `device_put` may alias the numpy buffer
(zero-copy), and on TPU the copy is asynchronous — either way the buffer
must stay untouched while its chunk is in flight, hence `depth + 1` rotating
buffers rather than one.

HBM footprint is bounded by `depth` resident chunks (+1 being transferred);
outputs of the QC steps are KB-scale, so no donation is needed to stay flat.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, List, Optional, Tuple

import numpy as np


class OverlappedIngest:
    """Deferred-sync dispatch queue for chunked device steps.

    step(chunk u8[csize] on device, n_valid: int) -> result pytree. The
    result is returned to the caller only `depth` dispatches later (or at
    drain), at which point reading its leaves no longer stalls the pipe.

    Protocol per chunk::

        buf = ing.acquire()            # rotating host buffer (may sync one)
        n = fill(buf)                  # memcpy / readinto, pad tail
        for meta, out in ing.feed(buf, n, meta=pos):
            consume(out)               # ready results, dispatch order
        ...
        for meta, out in ing.drain():  # flush the queue at EOF
            consume(out)

    Read-only arrays the caller owns for the whole run (an mmap'd file's
    full-size slices) can be fed directly — `feed(arr, n, owned=False)` —
    skipping the staging copy entirely: the zero-copy path a pinned-memory
    staging scheme can never reach.
    """

    def __init__(self, step: Callable, csize: int, *, depth: int = 2,
                 n_buffers: Optional[int] = None,
                 keep_bytes: bool = False, row_bytes: Optional[int] = None):
        import jax

        self._jax = jax
        self.step = step
        self.csize = int(csize)
        # With row_bytes=rs, each chunk uploads as u8[csize//rs, rs] (a free
        # numpy reshape) so the device buffer carries XLA's 2-D (8,128)
        # tiling — the uniform-QC kernel's column slices are then
        # lane-regular reads instead of fused strided gathers over a 1-D
        # buffer (measured 17.9 -> 40 GB/s on v5e; ops/uniform_qc.py).
        self.row_bytes = int(row_bytes) if row_bytes else None
        if self.row_bytes and self.csize % self.row_bytes:
            raise ValueError("csize must be a multiple of row_bytes")
        self.depth = max(0, int(depth))
        nb = n_buffers if n_buffers is not None else self.depth + 1
        # Recycling contract: when acquire() has to early-sync the oldest
        # in-flight chunk (every buffer busy, i.e. n_buffers <= depth), that
        # chunk's BUFFER is recycled immediately while its RESULT is only
        # delivered by the next feed()/drain() — so by delivery time the
        # buffer bytes may be overwritten. Consumers that read a delivered
        # chunk's buffer contents (the QC failure path reconstructs the
        # unconsumed stream from them) must pass keep_bytes=True, which
        # pins n_buffers above depth so a chunk is always synced through
        # feed() BEFORE its buffer re-enters rotation. Byte-independent
        # consumers (scalar results, owned=False zero-copy feeds) may
        # under-provision freely.
        if keep_bytes and nb <= self.depth:
            raise ValueError(
                "OverlappedIngest(keep_bytes=True): n_buffers (%d) must "
                "exceed depth (%d); a delivered result's buffer would "
                "otherwise be recycled before the caller could read it"
                % (nb, self.depth))
        # buffers materialize on first acquire(): the zero-copy mmap path
        # needs at most one (for the trailing partial chunk)
        self._unallocated = max(1, nb)
        self._free: List[np.ndarray] = []
        # (meta, out, buf-or-None) in dispatch order
        self._inflight: deque = deque()
        # results acquire() had to sync early; handed out by next feed/drain
        self._early: List[Tuple[Any, Any]] = []

    # -- producer side --------------------------------------------------------
    def acquire(self) -> np.ndarray:
        """A host buffer safe to overwrite. Syncs the oldest in-flight chunk
        first if every buffer is busy; its result is delivered (in order) by
        the next feed()/drain() call."""
        while not self._free:
            if self._unallocated:
                from .. import native

                self._unallocated -= 1
                return native.aligned_empty(self.csize)
            if not self._inflight:
                raise RuntimeError("no free buffer and nothing in flight "
                                   "(a fed owned buffer was never returned)")
            self._early.append(self._sync_oldest())
        return self._free.pop()

    def feed(self, buf: np.ndarray, n_valid: int, meta: Any = None,
             owned: bool = True) -> List[Tuple[Any, Any]]:
        """Dispatch one chunk (async) and return any results that became
        ready, oldest first. `owned=True` marks `buf` as an acquire()d buffer
        to recycle after sync; pass owned=False for caller-owned read-only
        arrays (never written again during the run)."""
        host = buf.reshape(-1, self.row_bytes) if self.row_bytes else buf
        dev = self._jax.device_put(host)
        out = self.step(dev, int(n_valid))
        self._inflight.append((meta, out, buf if owned else None))
        ready, self._early = self._early, []
        while len(self._inflight) > self.depth:
            ready.append(self._sync_oldest())
        return ready

    def drain(self) -> List[Tuple[Any, Any]]:
        """Sync and return every remaining in-flight result, oldest first."""
        ready, self._early = self._early, []
        while self._inflight:
            ready.append(self._sync_oldest())
        return ready

    # -- internals -------------------------------------------------------------
    def _sync_oldest(self) -> Tuple[Any, Any]:
        meta, out, buf = self._inflight.popleft()
        out = self._jax.block_until_ready(out)
        if buf is not None:
            self._free.append(buf)
        return meta, out
