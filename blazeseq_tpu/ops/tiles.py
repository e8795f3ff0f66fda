"""Per-tile sequence quality (FastQC's "per tile sequence quality" panel) —
beyond the reference's scope.

Illumina read ids carry the flowcell tile as the 5th colon-separated field
of the first whitespace token (`instr:run:flowcell:lane:tile:x:y`). Tile
numbers are parsed host-side from the id SoA; the [tile, position] quality
surface is then ONE MXU contraction per batch: a tile one-hot matrix
contracted against the decoded Phred scores (einsum 'nt,nl->tl') — no
scatters, no per-tile loops. Accumulate across batches with
PerTileAccumulator (int64 host sums) and read `mean()` / `deviation()` for
the FastQC-style heatmap (per-tile mean minus the per-position mean over
all tiles).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stats import MAX_PHRED


def parse_illumina_tiles(ids: np.ndarray, id_ends: np.ndarray) -> np.ndarray:
    """Tile numbers from a concatenated-id SoA (FastqBatch layout).

    Returns int32[n]; -1 where the id is not Illumina-coordinate-shaped.
    Host-side parsing (ids never go to the device; SURVEY §7.1)."""
    n = len(id_ends)
    out = np.full(n, -1, dtype=np.int32)
    flat = ids.tobytes()
    start = 0
    for i in range(n):
        end = int(id_ends[i])
        tok = flat[start:end]
        start = end
        sp = tok.find(b" ")
        if sp >= 0:
            tok = tok[:sp]
        parts = tok.split(b":")
        if len(parts) >= 7:
            t = parts[4]
            if t.isdigit():
                out[i] = int(t)
    return out


@jax.jit
def _tile_contract(onehot_f, phred_f, count_f):
    sums = jnp.einsum("nt,nl->tl", onehot_f, phred_f,
                      preferred_element_type=jnp.float32)
    counts = jnp.einsum("nt,nl->tl", onehot_f, count_f,
                        preferred_element_type=jnp.float32)
    return sums, counts


def per_tile_qual_sums(tiles: np.ndarray, qual, lengths, offset: int,
                       unique_tiles: Optional[np.ndarray] = None,
                       n_records: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One batch's per-tile per-position Phred sums and base counts.

    tiles: int32[n] (host), qual u8[n, L], lengths i32[n].
    Returns (unique_tiles i64[T], sums f32[T, L], counts f32[T, L]) — exact
    in f32 for per-batch magnitudes (< 2^24)."""
    tiles = np.asarray(tiles)
    n, L = np.asarray(qual).shape
    if n_records is None:
        n_records = n
    valid = np.arange(n) >= 0
    valid &= np.arange(n) < n_records
    if unique_tiles is None:
        unique_tiles = np.unique(tiles[valid & (tiles >= 0)])
    t_idx = np.searchsorted(unique_tiles, tiles)
    t_idx = np.clip(t_idx, 0, max(len(unique_tiles) - 1, 0))
    hit = valid & (tiles >= 0)
    if len(unique_tiles):
        hit &= unique_tiles[t_idx] == tiles
    onehot = np.zeros((n, max(len(unique_tiles), 1)), dtype=np.float32)
    onehot[np.arange(n)[hit], t_idx[hit]] = 1.0

    qual_j = jnp.asarray(np.asarray(qual))
    lens_j = jnp.asarray(np.asarray(lengths), dtype=jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    mask = j < lens_j[:, None]
    off = jnp.uint8(offset)
    phred = jnp.where(mask & (qual_j >= off), qual_j - off, jnp.uint8(0))
    phred = jnp.minimum(phred, jnp.uint8(MAX_PHRED - 1))
    sums, counts = _tile_contract(jnp.asarray(onehot),
                                  phred.astype(jnp.float32),
                                  mask.astype(jnp.float32))
    return (unique_tiles.astype(np.int64), np.asarray(sums),
            np.asarray(counts))


class PerTileAccumulator:
    """Cross-batch per-tile accumulation (int64 host sums, like
    QCAccumulator)."""

    def __init__(self):
        self._sums = {}    # tile -> int64[L]
        self._counts = {}  # tile -> int64[L]

    @staticmethod
    def _add_ragged(store, t, v):
        """Accumulate v into store[t], zero-extending either side — batch
        pad widths may differ batch-to-batch (to_padded sizes to the
        longest read of each batch)."""
        old = store.get(t)
        if old is None:
            store[t] = v
        elif len(old) == len(v):
            old += v
        else:
            L = max(len(old), len(v))
            out = np.zeros(L, np.int64)
            out[: len(old)] = old
            out[: len(v)] += v
            store[t] = out

    def add_batch(self, tiles, qual, lengths, offset: int,
                  n_records: Optional[int] = None) -> None:
        uniq, sums, counts = per_tile_qual_sums(tiles, qual, lengths, offset,
                                                n_records=n_records)
        for k, t in enumerate(uniq.tolist()):
            self._add_ragged(self._sums, t,
                             np.rint(sums[k]).astype(np.int64))
            self._add_ragged(self._counts, t,
                             np.rint(counts[k]).astype(np.int64))

    @property
    def tiles(self):
        return sorted(self._sums)

    def _stacked(self, store, ts):
        """[T, Lmax] int64 matrix, rows zero-extended to the widest tile."""
        L = max(len(store[t]) for t in ts)
        out = np.zeros((len(ts), L), np.int64)
        for k, t in enumerate(ts):
            v = store[t]
            out[k, : len(v)] = v
        return out

    def mean(self) -> Tuple[np.ndarray, np.ndarray]:
        """(tiles i64[T], mean_phred f64[T, L]; NaN where a tile has no
        bases at a position)."""
        ts = self.tiles
        if not ts:
            return np.empty(0, np.int64), np.empty((0, 0))
        sums = self._stacked(self._sums, ts).astype(np.float64)
        counts = self._stacked(self._counts, ts).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.asarray(ts, np.int64), sums / counts

    def deviation(self) -> Tuple[np.ndarray, np.ndarray]:
        """FastQC heatmap values: per-tile mean minus the all-tile
        per-position mean."""
        ts, mean = self.mean()
        if not len(ts):
            return ts, mean
        tot_s = self._stacked(self._sums, ts).sum(axis=0).astype(np.float64)
        tot_c = self._stacked(self._counts, ts).sum(axis=0).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            overall = tot_s / tot_c
        return ts, mean - overall[None, :]
