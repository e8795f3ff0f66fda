"""Read-duplication profiling (FastQC's "sequence duplication levels" panel).

Beyond the reference (a parser — SURVEY.md §2 has no analysis ops). The
bandwidth-heavy part — hashing every read — runs on the TPU as a masked
polynomial reduction over the padded batch; the combinatorics — counting how
often each hash repeats across the (FastQC-style, capped) tracked sample —
is host-side numpy over a few hundred KB.

Two independent 32-bit wrapping polynomial hashes (jax runs in 32-bit mode)
are combined into a 64-bit key, making collisions over a <=1M-read sample
negligible (~n^2/2^65). The true read length is mixed in, so two reads only
collide-by-construction if they share their first `width` bytes AND their
length (exact for reads that fit the padded width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import length_mask

# plain ints, converted inside traced code: a module-level jnp constant
# would initialise the XLA backend at import time, which breaks
# jax.distributed.initialize() in multi-process programs
_BASE_A = 1000003
_BASE_B = 0x01000193  # FNV prime
_LEN_SALT_A = np.uint32(2654435761)
_LEN_SALT_B = np.uint32(0x9E3779B1)


def _powers(base: int, L: int) -> jnp.ndarray:
    p = jnp.concatenate([jnp.ones((1,), jnp.uint32),
                         jnp.full((L - 1,), base, jnp.uint32)])
    return jnp.cumprod(p)  # [1, b, b^2, ...] mod 2^32


@jax.jit
def read_hashes(seq, lengths, n_records=None) -> jnp.ndarray:
    """Hash each read of a padded batch [n, L] -> u32[n, 2].

    Masked beyond the true length, true length mixed in; padding rows
    (row >= n_records) hash to an all-ones sentinel the host side drops."""
    n, L = seq.shape
    if n_records is None:
        n_records = jnp.int32(n)
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    mask = length_mask(lengths, L, 0) & row_valid[:, None]
    s = jnp.where(mask, seq, jnp.uint8(0)).astype(jnp.uint32)
    lens32 = lengths.astype(jnp.uint32)
    ha = jnp.sum(s * _powers(_BASE_A, L)[None, :], axis=1,
                 dtype=jnp.uint32) + lens32 * _LEN_SALT_A
    hb = jnp.sum(s * _powers(_BASE_B, L)[None, :], axis=1,
                 dtype=jnp.uint32) + lens32 * _LEN_SALT_B
    sentinel = jnp.uint32(0xFFFFFFFF)
    ha = jnp.where(row_valid, ha, sentinel)
    hb = jnp.where(row_valid, hb, sentinel)
    return jnp.stack([ha, hb], axis=1)


def read_hashes_cpu(reads) -> np.ndarray:
    """Scalar host twin of `read_hashes` (padding-free)."""
    out = np.empty((len(reads), 2), np.uint64)
    for i, r in enumerate(reads):
        b = np.frombuffer(bytes(r), np.uint8).astype(np.uint64)
        pa = np.uint64(1)
        pb = np.uint64(1)
        ha = np.uint64(0)
        hb = np.uint64(0)
        m = np.uint64(0xFFFFFFFF)
        for x in b:
            ha = (ha + x * pa) & m
            hb = (hb + x * pb) & m
            pa = (pa * np.uint64(1000003)) & m
            pb = (pb * np.uint64(0x01000193)) & m
        out[i, 0] = (ha + np.uint64(len(b)) * np.uint64(2654435761)) & m
        out[i, 1] = (hb + np.uint64(len(b)) * np.uint64(0x9E3779B1)) & m
    return out.astype(np.uint32)


def duplication_levels(hashes: np.ndarray, max_level: int = 10):
    """FastQC duplication histogram from stacked u32[n, 2] hash batches.

    Returns (levels, frac_unique_reads): levels[k] (1 <= k < max_level) is
    the number of DISTINCT sequences seen exactly k times; levels[max_level]
    is distinct sequences seen >= max_level times; levels[0] unused."""
    h = np.ascontiguousarray(np.asarray(hashes, dtype=np.uint32))
    key = (h[:, 0].astype(np.uint64) << np.uint64(32)) \
        | h[:, 1].astype(np.uint64)
    n = key.shape[0]
    if n == 0:
        return np.zeros(max_level + 1, np.int64), 1.0
    _, counts = np.unique(key, return_counts=True)
    levels = np.bincount(np.minimum(counts, max_level),
                         minlength=max_level + 1).astype(np.int64)
    frac_unique = float((counts == 1).sum()) / n
    return levels, frac_unique


def overrepresented_sequences(hashes: np.ndarray, prefixes: np.ndarray,
                              min_fraction: float = 0.001,
                              top_k: int = 20) -> list:
    """FastQC's overrepresented-sequences table: sequences making up more
    than `min_fraction` of the tracked sample.

    `prefixes` are representative leading bytes (u8[n, <=50]) aligned
    row-for-row with `hashes`; the first occurrence's prefix labels each
    group. Returns [(prefix_bytes, count)] sorted most-frequent-first."""
    h = np.ascontiguousarray(np.asarray(hashes, dtype=np.uint32))
    key = (h[:, 0].astype(np.uint64) << np.uint64(32)) \
        | h[:, 1].astype(np.uint64)
    n = key.shape[0]
    if n == 0:
        return []
    _, first_idx, counts = np.unique(key, return_index=True,
                                     return_counts=True)
    hot = counts.astype(np.float64) / n > min_fraction
    hot &= counts > 1
    order = np.argsort(counts[hot])[::-1][:top_k]
    out = []
    for i in np.flatnonzero(hot)[order]:
        row = prefixes[first_idx[i]]
        out.append((row.tobytes().rstrip(b"\x00"), int(counts[i])))
    return out
