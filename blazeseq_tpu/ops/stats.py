"""On-device QC statistics over padded read batches.

The reference's only "stats" are the reads/bases counters every benchmark
runner prints (benchmark/fastq-parser/run_blazeseq.mojo:3-5); the TPU build
extends this into a proper FastQC-style QC pass computed on device, because
that is the point of putting reads in HBM. Everything is one fused XLA pass:
elementwise compares + reductions on the VPU, one-hot contractions for the
histograms.

Device leaves are int32 (single-batch magnitudes are small and jax runs in
32-bit mode); cross-batch totals are accumulated host-side in int64 by
`QCAccumulator`. All device outputs form an additive pytree so they psum
cleanly across a device mesh (blazeseq_tpu/parallel/pipeline.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import length_mask

MAX_PHRED = 64  # histogram bins [0, 64)
LEN_BINS = 512  # read-length distribution bins; longer reads clip to 511
GC_BINS = 101  # per-read GC%% bins 0..100

_BASES = b"ACGT"  # base classes: A C G T other


class QCStats(NamedTuple):
    """Additive per-batch QC statistics (every leaf sums across shards)."""

    reads: jnp.ndarray  # i32 []
    bases: jnp.ndarray  # i32 []
    base_counts: jnp.ndarray  # i32 [5]  A C G T other
    per_pos_base_counts: jnp.ndarray  # i32 [5, L]
    per_pos_qual_sum: jnp.ndarray  # i32 [L]
    per_pos_count: jnp.ndarray  # i32 [L]
    qual_hist: jnp.ndarray  # i32 [MAX_PHRED]
    gc_count: jnp.ndarray  # i32 []  total G+C bases
    error_reads: jnp.ndarray  # i32 [] reads with validation errors
    # FastQC-style per-read distribution panels (one count per read)
    length_hist: jnp.ndarray  # i32 [LEN_BINS] reads by true length (clipped)
    gc_hist: jnp.ndarray  # i32 [GC_BINS] reads by GC%% of in-window bases
    mean_qual_hist: jnp.ndarray  # i32 [MAX_PHRED] reads by rounded mean Phred
    # optional full per-position quality distribution [MAX_PHRED, L] —
    # the mergeable form behind FastQC's per-base quality boxplot
    # (median/quartiles/deciles need the distribution, not the sum). None
    # when not tracked; jax pytrees treat None as an empty subtree, so
    # merge/psum/accumulation all work unchanged either way.
    per_pos_qual_hist: jnp.ndarray = None

    def merge(self, other: "QCStats") -> "QCStats":
        return jax.tree.map(lambda a, b: a + b, self, other)


def zero_stats(max_len: int, qual_hist_2d: bool = False) -> QCStats:
    z = lambda *s: jnp.zeros(s, jnp.int32)
    return QCStats(z(), z(), z(5), z(5, max_len), z(max_len), z(max_len),
                   z(MAX_PHRED), z(), z(), z(LEN_BINS), z(GC_BINS),
                   z(MAX_PHRED),
                   per_pos_qual_hist=(z(MAX_PHRED, max_len)
                                      if qual_hist_2d else None))


def _base_class(seq: jnp.ndarray) -> jnp.ndarray:
    """Map ASCII bytes to {0:A 1:C 2:G 3:T 4:other}, case-insensitive."""
    upper = seq & 0xDF
    cls = jnp.full(seq.shape, 4, dtype=jnp.int32)
    for k, b in enumerate(_BASES):
        cls = jnp.where(upper == b, k, cls)
    return cls


def _row_partials_impl(mask, qual_phred, seq):
    """Per-read reductions over this column slice from precomputed mask and
    masked phred scores: (gc_bases, phred_sum, in_window_count), each i32[n].
    Under 'sp' (position) sharding these psum across shards before binning."""
    upper = seq & jnp.uint8(0xDF)
    isgc = mask & ((upper == jnp.uint8(ord("C")))
                   | (upper == jnp.uint8(ord("G"))))
    gc = jnp.sum(isgc, axis=1, dtype=jnp.int32)
    qsum = jnp.sum(jnp.where(mask, qual_phred, jnp.uint8(0)), axis=1,
                   dtype=jnp.int32)
    cnt = jnp.sum(mask, axis=1, dtype=jnp.int32)
    return gc, qsum, cnt


def _masked_phred(qual, mask, offset):
    # COMPILER NOTE: the obvious all-uint8 formulation
    # (min(where(mask & (qual >= off), qual - off, 0), 63) in u8) is
    # miscompiled by XLA (jax 0.9.0) on BOTH cpu and tpu when `qual` is a
    # fused strided producer (e.g. a column slice of a reshaped chunk, the
    # device-parse pipeline): the subtraction is dropped and every masked
    # lane clamps to MAX_PHRED-1. Doing the arithmetic in int32 and casting
    # back compiles correctly everywhere; XLA still fuses it, and TPU VPU
    # lanes are 32-bit anyway.
    q = qual.astype(jnp.int32)
    off = offset.astype(jnp.int32)
    ph = jnp.minimum(jnp.where(mask & (q >= off), q - off, 0),
                     MAX_PHRED - 1)
    return ph.astype(jnp.uint8)


@jax.jit
def row_partials(seq, qual, lengths, offset, n_records=None, col_offset=0):
    """Public entry: per-read (gc, phred_sum, in_window_count) partials for
    this column slice (see qc_stats for the masking semantics)."""
    n, L = seq.shape
    if n_records is None:
        n_records = jnp.int32(n)
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    mask = length_mask(lengths, L, col_offset) & row_valid[:, None]
    return _row_partials_impl(mask, _masked_phred(qual, mask, offset), seq)


def _one_hot_hist(values, n_bins):
    """hist[k] = #(values == k); excluded rows carry -1 and match no bin.
    Dense compare+reduce — scatter-free (TPU scatters serialize)."""
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    return jnp.sum(values[:, None] == bins[None, :], axis=0,
                   dtype=jnp.int32)


def row_histograms(gc, qsum, cnt, lengths, n_records):
    """Bin (possibly psum-merged) per-read partials into the three
    distribution panels: (length_hist, gc_hist, mean_qual_hist). Lengths are
    the TRUE lengths (may exceed the padded width; clipped into the last
    bin); GC%% and mean quality are over the in-window bases `cnt`."""
    n = gc.shape[0]
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    lens = jnp.where(row_valid,
                     jnp.minimum(lengths.astype(jnp.int32), LEN_BINS - 1),
                     -1)
    nonempty = row_valid & (cnt > 0)
    safe = jnp.maximum(cnt, 1)
    # round-half-up integer percent / mean: floor((100*gc + cnt/2) / cnt)
    gc_bin = jnp.where(nonempty, (200 * gc + cnt) // (2 * safe), -1)
    mq_bin = jnp.where(
        nonempty,
        jnp.minimum((2 * qsum + cnt) // (2 * safe), MAX_PHRED - 1), -1)
    return (_one_hot_hist(lens, LEN_BINS), _one_hot_hist(gc_bin, GC_BINS),
            _one_hot_hist(mq_bin, MAX_PHRED))


@functools.partial(jax.jit, static_argnames=("count_scalars", "row_stats",
                                              "qual_hist_2d"))
def qc_stats(seq, qual, lengths, offset, n_records=None,
             error_codes=None, col_offset=0,
             count_scalars: bool = True, row_stats: bool = True,
             qual_hist_2d: bool = False) -> QCStats:
    """Compute QCStats for one padded batch [n, L].

    `n_records` distinguishes genuine records from padding rows when the
    record dimension is padded to a static batch size. Under 'sp'
    (position-dimension) sharding, pass this shard's starting column as
    `col_offset`, and count_scalars=False on every sp shard but the first —
    reads/bases/error counts are per-record quantities that every sp shard
    would otherwise duplicate (position-local leaves still accumulate)."""
    n, L = seq.shape
    if n_records is None:
        n_records = jnp.int32(n)
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < n_records
    mask = length_mask(lengths, L, col_offset) & row_valid[:, None]
    # stay in uint8 until the final reductions: 32-bit intermediates (and
    # [n, L, bins] broadcasts) multiply the traffic of every pass
    phred_u8 = _masked_phred(qual, mask, offset)
    phred_u8 = jnp.where(mask, phred_u8, jnp.uint8(MAX_PHRED))  # excluded

    upper = seq & jnp.uint8(0xDF)
    per_pos_rows = []
    for b in _BASES:
        m = mask & (upper == jnp.uint8(b))
        per_pos_rows.append(jnp.sum(m, axis=0, dtype=jnp.int32))
    known = per_pos_rows[0] + per_pos_rows[1] + per_pos_rows[2] \
        + per_pos_rows[3]
    per_pos_count = jnp.sum(mask, axis=0, dtype=jnp.int32)
    per_pos_rows.append(per_pos_count - known)  # "other" by subtraction
    per_pos_base = jnp.stack(per_pos_rows)  # [5, L]
    base_counts = jnp.sum(per_pos_base, axis=1, dtype=jnp.int32)

    if qual_hist_2d:
        # full per-position distribution: one compare+row-reduce per bin
        # (scatter-free). The 1-D hist and the per-position sum are exact
        # column/moment reductions of it — no extra passes for those.
        pp_qual_hist = jnp.stack([
            jnp.sum(phred_u8 == jnp.uint8(k), axis=0, dtype=jnp.int32)
            for k in range(MAX_PHRED)
        ])  # [MAX_PHRED, L]
        qual_hist = jnp.sum(pp_qual_hist, axis=1, dtype=jnp.int32)
        per_pos_qual_sum = jnp.sum(
            pp_qual_hist * jnp.arange(MAX_PHRED, dtype=jnp.int32)[:, None],
            axis=0, dtype=jnp.int32)
    else:
        pp_qual_hist = None
        qual_hist = jnp.stack([
            jnp.sum(phred_u8 == jnp.uint8(k), dtype=jnp.int32)
            for k in range(MAX_PHRED)
        ])

        per_pos_qual_sum = jnp.sum(
            jnp.where(mask, phred_u8, jnp.uint8(0)).astype(jnp.int32), axis=0,
            dtype=jnp.int32)

    gc = base_counts[1] + base_counts[2]
    err = (jnp.sum((error_codes != 0) & row_valid, dtype=jnp.int32)
           if error_codes is not None else jnp.zeros((), jnp.int32))
    scale = jnp.int32(1 if count_scalars else 0)
    if row_stats:
        gcr, qsr, cntr = _row_partials_impl(mask, phred_u8, seq)
        len_h, gc_h, mq_h = row_histograms(gcr, qsr, cntr, lengths, n_records)
        len_h, gc_h, mq_h = len_h * scale, gc_h * scale, mq_h * scale
    else:
        # per-read panels need full rows; under 'sp' sharding the pipeline
        # psums row_partials across position shards and bins them itself
        len_h = jnp.zeros(LEN_BINS, jnp.int32)
        gc_h = jnp.zeros(GC_BINS, jnp.int32)
        mq_h = jnp.zeros(MAX_PHRED, jnp.int32)
    return QCStats(
        reads=n_records.astype(jnp.int32) * scale,
        bases=jnp.sum(jnp.where(row_valid, lengths, 0),
                      dtype=jnp.int32) * scale,
        base_counts=base_counts,
        per_pos_base_counts=per_pos_base,
        per_pos_qual_sum=per_pos_qual_sum,
        per_pos_count=per_pos_count,
        qual_hist=qual_hist,
        gc_count=gc,
        error_reads=err * scale,
        length_hist=len_h,
        gc_hist=gc_h,
        mean_qual_hist=mq_h,
        per_pos_qual_hist=pp_qual_hist,
    )


class QCAccumulator:
    """Host-side int64 accumulator for streaming QC over many batches."""

    def __init__(self):
        self._tot = None

    def add(self, stats: QCStats) -> None:
        host = jax.tree.map(lambda a: np.asarray(a, dtype=np.int64), stats)
        if self._tot is None:
            self._tot = host
        else:
            self._tot = jax.tree.map(_add_padded, self._tot, host)

    @property
    def total(self) -> QCStats:
        return self._tot

    # -- derived metrics -----------------------------------------------------
    def gc_fraction(self) -> float:
        t = self._tot
        return float(t.gc_count) / max(float(t.bases), 1.0)

    def mean_quality(self) -> float:
        t = self._tot
        total = float(np.sum(t.qual_hist * np.arange(MAX_PHRED)))
        return total / max(float(t.bases), 1.0)

    def per_position_mean_quality(self) -> np.ndarray:
        t = self._tot
        cnt = np.maximum(t.per_pos_count, 1)
        return t.per_pos_qual_sum / cnt

    def mean_read_length(self) -> float:
        t = self._tot
        return float(t.bases) / max(float(t.reads), 1.0)

    def modal_read_length(self) -> int:
        """Most common read length (lengths >= LEN_BINS clip to the last bin)."""
        return int(np.argmax(self._tot.length_hist))

    def per_position_quality_quartiles(
            self, probs=(0.10, 0.25, 0.50, 0.75, 0.90)) -> np.ndarray:
        """[len(probs), L] lower empirical percentiles per position from the
        tracked distribution (FastQC per-base boxplot: deciles + quartiles +
        median). Requires qual_hist_2d tracking (QCModel(track_quartiles=True));
        positions with no in-window bases report 0."""
        t = self._tot
        if t.per_pos_qual_hist is None:
            raise ValueError(
                "per-position quality distribution was not tracked; "
                "construct QCModel(track_quartiles=True) or call "
                "qc_stats(qual_hist_2d=True)")
        cum = np.cumsum(t.per_pos_qual_hist, axis=0)  # [MAX_PHRED, L]
        n = cum[-1]
        rows = []
        for p in probs:
            # inverse empirical CDF: smallest phred v with cdf(v) >= p
            thresh = np.maximum(np.ceil(p * n).astype(np.int64), 1)
            v = (cum < thresh[None, :]).sum(axis=0)
            rows.append(np.where(n > 0, v, 0))
        return np.stack(rows)


def _add_padded(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sum arrays whose trailing (position) axis may differ across batches."""
    if a.shape == b.shape:
        return a + b
    L = max(a.shape[-1], b.shape[-1])

    def widen(x):
        pad = [(0, 0)] * (x.ndim - 1) + [(0, L - x.shape[-1])]
        return np.pad(x, pad)

    return widen(a) + widen(b)
