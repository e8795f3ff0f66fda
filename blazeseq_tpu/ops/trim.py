"""Quality trimming over padded batches — zero-copy, lengths-only.

Beyond the reference (a parser; SURVEY.md §2 has no trimming). Because every
downstream op in this framework (QC, alignment, hashing) masks by the
`lengths` vector, trimming is just computing NEW lengths — no byte movement,
no re-layout. All three classic policies are vectorized row reductions:

* leading/trailing clip (Trimmomatic LEADING/TRAILING): drop bases below a
  threshold from each end
* sliding-window (Trimmomatic SLIDINGWINDOW:w:q): cut where the w-base
  window mean first falls below q
* BWA-style 3' trim (bwa aln -q / seqtk trimfq): cut at the argmax of the
  running sum of (q_thresh - q) from the 3' end

Each has a scalar CPU twin used by the tests. Positions past the padded
width cannot be inspected; reads clamped by the batch width trim within the
window (lengths are first clipped to the width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import length_mask

# plain int (a module-level jnp constant would initialise the XLA backend
# at import time and break jax.distributed.initialize in multi-process use)
_BIG = 1 << 30


def _phred(qual, offset):
    # int32 arithmetic: the all-uint8 subtraction is miscompiled by XLA
    # (jax 0.9.0) on fused strided producers — see stats._masked_phred
    q = qual.astype(jnp.int32)
    off = offset.astype(jnp.int32)
    return jnp.where(q >= off, q - off, 0)


@jax.jit
def clip_ends(qual, lengths, offset, leading=3,
              trailing=3):
    """Trimmomatic LEADING/TRAILING: returns (start i32[n], new_len i32[n]):
    the kept slice is [start, start+new_len) of each read. Bases with
    quality < leading are dropped from the 5' end, < trailing from the 3'."""
    n, L = qual.shape
    lens = jnp.minimum(lengths.astype(jnp.int32), L)
    mask = length_mask(lens, L, 0)
    q = _phred(qual, offset)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    keep_lead = mask & (q >= leading)
    # first kept index (L if none)
    start = jnp.min(jnp.where(keep_lead, j, _BIG), axis=1)
    start = jnp.minimum(start, lens)
    keep_trail = mask & (q >= trailing)
    # last kept index + 1 (0 if none)
    end = jnp.max(jnp.where(keep_trail, j + 1, 0), axis=1)
    new_len = jnp.maximum(end - start, 0)
    return start, new_len


def clip_ends_cpu(qual: bytes, offset: int, leading=3, trailing=3):
    q = [max(b - offset, 0) for b in qual]
    start = 0
    while start < len(q) and q[start] < leading:
        start += 1
    end = len(q)
    while end > start and q[end - 1] < trailing:
        end -= 1
    return start, end - start


@functools.partial(jax.jit, static_argnames=("window",))
def sliding_window_trim(qual, lengths, offset, mean_q=15, *,
                        window: int = 4):
    """Trimmomatic SLIDINGWINDOW:window:mean_q — scan 5'->3'; at the first
    window whose mean quality drops below mean_q, cut the read at the
    window's start. Returns new lengths i32[n]."""
    n, L = qual.shape
    lens = jnp.minimum(lengths.astype(jnp.int32), L)
    mask = length_mask(lens, L, 0)
    q = jnp.where(mask, _phred(qual, offset), 0)
    # windowed sums via cumsum difference; window j covers [j, j+window)
    c = jnp.cumsum(q, axis=1)
    c = jnp.concatenate([jnp.zeros((n, 1), c.dtype), c], axis=1)
    wsum = c[:, window:] - c[:, :-window]  # [n, L-window+1]
    j = jax.lax.broadcasted_iota(jnp.int32, wsum.shape, 1)
    # windows fully inside the read; comparison in integers: sum < mean*w
    in_read = j + window <= lens[:, None]
    bad = in_read & (wsum < mean_q * window)
    cut = jnp.min(jnp.where(bad, j, _BIG), axis=1)
    return jnp.minimum(cut, lens)


def sliding_window_trim_cpu(qual: bytes, offset: int, mean_q=15, window=4):
    q = [max(b - offset, 0) for b in qual]
    for j in range(0, len(q) - window + 1):
        if sum(q[j:j + window]) < mean_q * window:
            return j
    return len(q)


@jax.jit
def bwa_trim(qual, lengths, offset, threshold=20):
    """BWA -q / seqtk trimfq 3' trimming: cut at the position maximizing the
    running sum of (threshold - q) scanned from the 3' end (ties keep the
    longer read). Returns new lengths i32[n]."""
    n, L = qual.shape
    lens = jnp.minimum(lengths.astype(jnp.int32), L)
    mask = length_mask(lens, L, 0)
    q = _phred(qual, offset)
    d = jnp.where(mask, threshold - q, 0)
    # s(k) = sum of d over positions [k, len); cut at argmax_k s(k) when the
    # max is positive, else keep the full read. s via reversed cumsum:
    c = jnp.cumsum(d, axis=1)
    total = c[:, -1:]
    s = total - c + d  # s[:, k] = sum_{j>=k} d[j]
    j = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    s = jnp.where(mask, s, -_BIG)
    best = jnp.max(s, axis=1)
    # the LARGEST k achieving the max keeps the most bases
    best_k = jnp.max(jnp.where(s == best[:, None], j, -1), axis=1)
    return jnp.where(best > 0, jnp.maximum(best_k, 0), lens)


def bwa_trim_cpu(qual: bytes, offset: int, threshold=20):
    q = [max(b - offset, 0) for b in qual]
    best, best_k, s = 0, len(q), 0
    for k in range(len(q) - 1, -1, -1):
        s += threshold - q[k]
        if s > best:
            best, best_k = s, k
    return best_k if best > 0 else len(q)
