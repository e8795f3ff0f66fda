"""k-mer spectrum over padded read batches.

Beyond the reference (a parser; SURVEY.md §2 has no analysis ops). Computes
exact counts of all 4^k DNA k-mers (k <= 8) in one device pass:

1. 2-bit base encoding (A=0 C=1 G=2 T=3; anything else poisons the window)
   as a vectorized where-chain.
2. Rolling k-mer codes via k statically unrolled shift-adds (same pattern as
   the adapter scanner — XLA fuses the chain, no gathers).
3. Histogram over 4^k bins. A one-hot reduction (the qc_stats pattern) would
   materialize [n*L, 4^k] work, and scatter-adds serialize on TPU — so the
   histogram is sort-based instead: flatten, `jnp.sort`, then one
   `searchsorted` over the bin boundaries; counts are adjacent differences.

N-containing and out-of-read windows are excluded exactly (they encode to a
sentinel that sorts past the last bin).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import length_mask


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_counts(seq, lengths, n_records=None, *, k: int = 4) -> jnp.ndarray:
    """Count all 4^k k-mers in a padded batch [n, L] -> i32[4^k].

    Windows must lie inside the true read length (clipped to the padded
    width) and contain only ACGT (case-insensitive)."""
    if not 1 <= k <= 8:
        raise ValueError("k must be in 1..8 (4^k histogram bins)")
    n, L = seq.shape
    if n_records is None:
        n_records = jnp.int32(n)
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    mask = length_mask(lengths, L, 0) & row_valid[:, None]

    upper = seq & jnp.uint8(0xDF)
    b2 = jnp.full(seq.shape, 4, jnp.int32)  # 4 = invalid base
    for v, b in enumerate(b"ACGT"):
        b2 = jnp.where(upper == jnp.uint8(b), v, b2)
    b2 = jnp.where(mask, b2, 4)

    n_bins = 4 ** k
    code = jnp.zeros(seq.shape, jnp.int32)
    ok = jnp.ones(seq.shape, dtype=bool)
    for t in range(k):
        if t:
            sh = jnp.pad(b2[:, t:], ((0, 0), (0, t)), constant_values=4)
        else:
            sh = b2
        ok &= sh < 4
        code = code + (sh << (2 * (k - 1 - t)))
    codes = jnp.where(ok, code, n_bins)  # sentinel sorts past the last bin
    flat = jnp.sort(codes.reshape(-1))
    bounds = jnp.searchsorted(flat, jnp.arange(n_bins + 1, dtype=jnp.int32))
    return jnp.diff(bounds).astype(jnp.int32)


def kmer_counts_cpu(reads, k: int = 4) -> np.ndarray:
    """Scalar host twin of `kmer_counts` (padding-free)."""
    tr = {65: 0, 67: 1, 71: 2, 84: 3, 97: 0, 99: 1, 103: 2, 116: 3}
    out = np.zeros(4 ** k, np.int64)
    for r in reads:
        b = bytes(r)
        for j in range(len(b) - k + 1):
            code = 0
            for t in range(k):
                v = tr.get(b[j + t])
                if v is None:
                    code = None
                    break
                code = (code << 2) | v
            if code is not None:
                out[code] += 1
    return out
