"""Adapter-content scanning over padded read batches (FastQC's adapter panel).

Beyond the reference (which is a parser; SURVEY.md §2 has no analysis ops):
for a short adapter a[0..la), find where it occurs in each read. The match
matrix m[i, j] = all_k(seq[i, j+k] == a[k]) is computed as `la` statically
unrolled shifted compares fused by XLA into one vectorized pass — no gathers,
no scatters, TPU-friendly. FastQC's cumulative "% of reads with adapter at or
before position j" curve is the prefix sum of the first-occurrence counts.

Case-insensitive (reads and adapter are uppercased with the & 0xDF ASCII
trick, as in ops/stats.py base classing).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AdapterStats(NamedTuple):
    """Additive per-batch adapter occurrence statistics."""

    first_occurrence: jnp.ndarray  # i32 [L] reads whose FIRST hit starts at j
    reads_with_adapter: jnp.ndarray  # i32 [] reads with >= 1 full occurrence
    reads_scanned: jnp.ndarray  # i32 []

    def merge(self, other: "AdapterStats") -> "AdapterStats":
        return jax.tree.map(lambda a, b: a + b, self, other)

    def cumulative_fraction(self) -> np.ndarray:
        """FastQC curve: fraction of reads with a hit at or before column j."""
        tot = max(int(self.reads_scanned), 1)
        return np.cumsum(np.asarray(self.first_occurrence),
                         dtype=np.float64) / tot


def _adapter_matches(seq, lengths, adapter_host: bytes, col_offset=0):
    n, L = seq.shape
    la = len(adapter_host)
    upper = seq & jnp.uint8(0xDF)
    hit = jnp.ones((n, L), dtype=bool)
    for k, byte in enumerate(adapter_host):
        # seq column j+k compared against adapter byte k; columns that would
        # read past the row are padded with a never-matching sentinel
        if k:
            shifted = jnp.pad(upper[:, k:], ((0, 0), (0, k)),
                              constant_values=0x00)
        else:
            shifted = upper
        hit &= shifted == jnp.uint8(byte & 0xDF)
    # the full match must sit inside the true read: j + la <= len
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1) + col_offset
    in_read = j_idx + la <= jnp.minimum(lengths[:, None].astype(jnp.int32),
                                        L + col_offset)
    return hit & in_read


@partial(jax.jit, static_argnames=("adapter_host",))
def adapter_content(seq, lengths, n_records=None, *,
                    adapter_host: bytes) -> AdapterStats:
    """Scan one padded batch [n, L] for a short adapter (passed as a static
    Python bytes so the compare chain unrolls at trace time).

    Returns first-occurrence counts per start column, the number of reads
    with at least one occurrence, and the number of genuine reads scanned."""
    n, L = seq.shape
    if n_records is None:
        n_records = jnp.int32(n)
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    hit = _adapter_matches(seq, lengths, adapter_host) & row_valid[:, None]
    # first occurrence: a hit at j with no hit strictly before j
    earlier = jnp.cumsum(hit.astype(jnp.int32), axis=1)
    first = hit & (earlier == 1)
    return AdapterStats(
        first_occurrence=jnp.sum(first, axis=0, dtype=jnp.int32),
        reads_with_adapter=jnp.sum(jnp.any(hit, axis=1), dtype=jnp.int32),
        reads_scanned=n_records.astype(jnp.int32),
    )


def adapter_content_cpu(reads, adapter: bytes, max_len=None):
    """Scalar host twin: (first_occurrence list, reads_with_adapter)."""
    ad = bytes(adapter).upper()
    L = max_len if max_len is not None else max(
        (len(r) for r in reads), default=0)
    first = [0] * L
    with_hit = 0
    for r in reads:
        pos = bytes(r).upper().find(ad)
        if pos >= 0 and pos < L:
            first[pos] += 1
            with_hit += 1
    return first, with_hit
