"""General (ragged-layout) on-device FASTQ parse + validate + QC.

`ops/uniform_qc.py` needs a layout-uniform chunk (fixed read length AND fixed
header width). This module removes that restriction: it computes the full
QCStats panel set for chunks whose header widths and read lengths VARY per
record (real coordinate-bearing Illumina ids), entirely on device, using only
dense TPU-friendly primitives — no gather, no scatter, no sort (all three are
pathological on TPU: scatters serialize at ~48ns/update and ragged byte
gathers run ~0.1 GB/s on this hardware).

Design (three dense sub-engines over one [tiles, K] view of the chunk):

1. **Byte-phase classification** (reference `_scan_record` recast as tensor
   algebra, blazeseq/utils.mojo:472-551): a byte's line index is the number
   of newlines before it, so phase = (newline-count mod 4) via per-tile uint8
   cumsums plus a tiny per-tile carry scan — uint8 wrap is exact because
   256 ≡ 0 (mod 4). This yields sequence/quality masks for all global panels
   (base composition, Phred histogram via the cumulative ge-trick, reads,
   bases, structure/ASCII/quality validation — Validator semantics,
   blazeseq/fastq/record.mojo:77-148).

2. **Per-position panels as MXU cross-correlations**: for lag p,
   per_pos_count[p] = sum_i seq_start[i] * seq_mask[i+p], and likewise per
   base class and for quality sums — cross-correlations of dense masks,
   evaluated EXACTLY on the MXU as lag-p diagonal sums of G1 = S^T M and
   G2 = S[:-1]^T M[1:] (int8 inputs, int32 accumulation) with operands in
   the chunk's NATIVE [T, K] layout (lags < width <= K spill at most one
   row, which G2 covers; round-4's per-channel [Tc, Wc] reshapes were
   physical relayout copies that blocked fusion — 3x this sub-engine).
   This is exact whenever no two same-class line starts are closer than
   `width` bytes (lags never reach the next record), which holds whenever
   every record spans >= width bytes — true for any real corpus when
   width ~ max read length; the kernel PROVES the condition on device
   (min start-to-start gap) and reports `fallback` otherwise. The global
   composition panel comes free as row sums of these per-position panels.

3. **Per-read panels via rank-compacted line boundaries**: per-tile newline
   ranks (<= B) compact each newline's position into a dense [T, B] slot
   structure — a one-hot masked sum per slot, no scatter — and per-line
   GC / Phred sums come from DIRECT per-tile segment sums (a byte's
   segment is its exclusive newline count) plus one associative
   carried-tail scan for lines spanning tiles. Tiny carry scans over the
   tile axis recover each entry's 1..4-previous boundary, giving per-line
   lengths; role = line-index mod 4 assigns lines to records.
   Read-length / GC%% / mean-quality histograms then bin the [T, B]
   structure (narrow-dtype compare-reduce, scatter-free), reads/bases/
   in-window/qual-byte totals are [T, B] slot reductions, and per-record
   seq-len == qual-len validation is a slot equality.

The returned stats are bit-identical to the host engine's
(`FastqParser.padded_batches` + `ops/stats.qc_stats`) whenever
`fallback == False` and `ok == True`; tests/test_ragged_qc.py holds this
parity oracle over variable-id and mixed-length corpora.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import round_up
from .stats import GC_BINS, LEN_BINS, MAX_PHRED, QCStats

NEWLINE = 10
AT = 64
PLUS = 43

_BASES = b"ACGT"

# Default max line boundaries per compaction tile; tiles are 2*width wide
# and for ~width-sized records a tile overlaps at most ceil(2W/W)+1 = 3
# records = 12 line ends. Short-record corpora need more slots — callers
# (QCModel peeks the corpus head) pass a larger static `slot_cap`; the
# kernel still PROVES the bound at runtime and reports `fallback` when any
# tile overflows, so exactness never depends on the estimate.
_B = 12


class RaggedQC(NamedTuple):
    ok: jnp.ndarray          # bool[] validation passed (stats trustworthy)
    fallback: jnp.ndarray    # bool[] layout outside device tier -> host path
    tail_start: jnp.ndarray  # i32[] offset of the trailing partial record
    stats: QCStats


def _excl_scan(x):
    """Exclusive prefix sum along axis 0 (tiny [T] arrays)."""
    inc = jnp.cumsum(x, axis=0)
    return inc - x


def _flat_shift(x2, s, fill):
    """Flattened right-shift by `s` of a row-major [T, K] array, kept 2-D:
    y[t, k] = x[t, k-s] for k >= s, else x[t-1, K-s+k] (fill on row 0).

    The ragged kernel's windowed-newline-count differences need flat shifts
    of 1 and width+1; doing them as 2-D slice+concat keeps every operand on
    the chunk's (8,128) row tiling — a .reshape(n) round-trip would drop
    the whole dataflow to 1-D tiling and strided-gather column reads (the
    2.2x layout cliff measured in docs/perf_roofline_uniform_qc.md).
    Requires s <= K (true: shifts are <= width+1 <= K/2+1)."""
    T, K = x2.shape
    head = jnp.concatenate(
        [jnp.full((1, s), fill, x2.dtype), x2[:-1, K - s:]], axis=0)
    return jnp.concatenate([head, x2[:, : K - s]], axis=1)


def _carry_prev(vals, m_t, B):
    """Previous-entry value for every slot of a [T, B] rank-compacted
    structure whose valid slots are the first m_t of each tile row.

    Entry (t, b)'s predecessor is slot b-1 of the same tile, or the last
    valid slot of the nearest earlier tile with any entry — recovered with an
    O(T) associative carry scan, no gather."""
    T = vals.shape[0]
    mt = jnp.clip(m_t, 0, B)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    within = jnp.concatenate(
        [jnp.zeros((T, 1), vals.dtype), vals[:, : B - 1]], axis=1)
    # last valid entry per tile, via a B-wide one-hot reduce
    lastv = jnp.sum(jnp.where(bcol == (mt[:, None] - 1), vals, 0), axis=1)
    has = mt > 0

    def combine(a, b):
        ah, av = a
        bh, bv = b
        return ah | bh, jnp.where(bh, bv, av)

    inc_h, inc_v = jax.lax.associative_scan(combine, (has, lastv))
    carried = jnp.concatenate([jnp.zeros((1,), vals.dtype), inc_v[:-1]])
    return jnp.where(bcol > 0, within, carried[:, None])


def _diag_sums(G1, G2, Kc, C, width):
    """per_pos[c][p] = sum_k G1[k, c, k+p] + sum_k G2[k, c, k+p-Kc].

    G1/G2: [Kc, C*Kc] int32 from the correlation matmuls. Static index
    matrices on [Kc, width]-sized operands — negligible next to the matmuls.
    """
    import numpy as np

    g1 = G1.reshape(Kc, C, Kc)
    g2 = G2.reshape(Kc, C, Kc)
    k = np.arange(Kc)[:, None]
    p = np.arange(width)[None, :]
    kp = k + p
    in1 = kp < Kc
    idx1 = np.where(in1, kp, 0)
    d1 = jnp.sum(jnp.where(jnp.asarray(in1)[:, None, :],
                           g1[jnp.arange(Kc)[:, None], :, jnp.asarray(idx1)]
                           .transpose(0, 2, 1),
                           0), axis=0)  # [C, width]
    kp2 = kp - Kc
    in2 = kp2 >= 0
    idx2 = np.where(in2, kp2, 0)
    d2 = jnp.sum(jnp.where(jnp.asarray(in2)[:, None, :],
                           g2[jnp.arange(Kc)[:, None], :, jnp.asarray(idx2)]
                           .transpose(0, 2, 1),
                           0), axis=0)
    return d1 + d2


def _corr(S, M_flat, Kc):
    """G1/G2 correlation matmuls: S [Tc, Kc] i8, M_flat [Tc, C*Kc] i8.
    int8 x int8 -> int32 rides the MXU natively on TPU; exact everywhere."""
    dn = (((0,), (0,)), ((), ()))
    G1 = jax.lax.dot_general(S, M_flat, dn,
                             preferred_element_type=jnp.int32)
    G2 = jax.lax.dot_general(S[:-1], M_flat[1:], dn,
                             preferred_element_type=jnp.int32)
    return G1, G2


@functools.partial(
    jax.jit,
    static_argnames=("width", "q_lo", "q_hi", "offset", "check_ascii",
                     "check_quality", "slot_cap", "hist_vals", "len_vals",
                     "_ablate"))
def ragged_qc(chunk, n_valid, *, width: int, q_lo: int, q_hi: int,
              offset: int, check_ascii: bool = True,
              check_quality: bool = True, slot_cap: int = _B,
              hist_vals: tuple = (), len_vals: tuple = (),
              _ablate: frozenset = frozenset()) -> RaggedQC:
    """Parse+validate+QC a general FASTQ chunk on device.

    chunk: u8[n] (or, preferred, u8[T, 2*round_up(width,128)] — the same
    bytes uploaded 2-D so the device buffer carries XLA's (8,128) row
    tiling; a free numpy reshape on the host, ~3x on the device step)
    starting at a record boundary, zero-padded to a multiple of
    2*round_up(width, 128); n_valid: real byte count. Schema bounds static.

    Device tier bounds (reported via `fallback`, stats then untrusted):
      * every record spans >= min(longest seq/qual line, width) bytes
        (no-leak correlation condition — holds for any real corpus short of
        pathological length mixes like 10bp reads next to 300bp reads),
      * <= `slot_cap` line ends per 2*round_up(width,128) tile
        (rank-compaction capacity: records below ~width/2 bytes overflow
        the default 12; QCModel sizes the cap from a host head-peek).

    `hist_vals` / `len_vals` (static, () = off) are caller-observed
    distinct phred-value / read-length sets: the corresponding histogram
    runs one equality reduction per member plus a free remainder bin at
    max+1, and the caller re-runs full-bins when the accumulated
    remainder is nonzero — see ops/uniform_qc.py and models/qc.py for
    the contract.

    `_ablate` is a perf-diagnosis knob ONLY (benchmark/scripts/ab_ragged_qc
    uses it to attribute device step time): members of
    {"win", "corr", "vals", "hist", "slots", "rhist"} skip that sub-engine
    and substitute zeros, producing WRONG stats ("slots" drops the whole
    rank-compaction engine; "rhist" just its [T, B] bin compares). Never
    set it in production code.

    Reads LONGER than `width` stay on device with the host engine's exact
    truncation semantics (ops/stats.qc_stats over a [n, width] padded
    batch): `bases`/`length_hist` use TRUE lengths, while base/quality
    panels, the Phred histogram, and per-read GC%%/mean-quality cover only
    each line's first `width` bytes — the windowed masks below come from a
    newline-count window difference, no gather.
    """
    Wc = round_up(width, 128)
    K = 2 * Wc
    if chunk.ndim == 2:
        assert chunk.shape[1] == K, \
            "2-D chunk rows must be 2*round_up(width, 128) bytes"
        r2 = chunk
        T = chunk.shape[0]
        n = T * K
    else:
        n = chunk.shape[0]
        assert n % K == 0, "pad chunk to a multiple of 2*round_up(width, 128)"
        T = n // K
        r2 = chunk.reshape(T, K)
    B = int(slot_cap)
    n_valid = n_valid.astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, K), 0)
    idx2 = row * K + col
    valid = idx2 < n_valid

    nl = (r2 == jnp.uint8(NEWLINE)) & valid
    nl_u8 = nl.astype(jnp.uint8)
    # u8 per-tile inclusive newline count: wrap mod 256 is exact for every
    # consumer — phase needs it mod 4 only; slot ranks only matter below
    # slot_cap <= 96 (a tile with >= 256 newlines has m_t > B and the whole
    # chunk reports `fallback`, m_t being an exact i32 reduce); the window
    # difference below subtracts counts <= width+1 <= K/2+1 apart. Halves
    # the census traffic vs the previous u16 cumsum.
    c_nl = jnp.cumsum(nl_u8, axis=1, dtype=jnp.uint8)
    m_t = jnp.sum(nl, axis=1, dtype=jnp.int32)
    offs = _excl_scan(m_t)                    # newlines before tile t
    offs_u8 = offs.astype(jnp.uint8)[:, None]

    g_mod4 = (offs_u8 + c_nl) & jnp.uint8(3)  # inclusive count mod 4
    phase = (g_mod4 - nl_u8) & jnp.uint8(3)
    rec_end = nl & (g_mod4 == 0)
    tail_start = jnp.max(jnp.where(rec_end, idx2 + 1, 0), initial=0)
    complete = idx2 < tail_start

    seq_m = (phase == 1) & (~nl) & complete
    qual_m = (phase == 3) & (~nl) & complete

    # Truncation window: a byte is in-window iff its offset within its line
    # is < width, i.e. a newline (or the chunk start) lies within the
    # preceding `width` bytes. Windowed newline count = difference of the
    # inclusive global newline count at i-1 and i-1-width; wraparound
    # subtraction is exact because a width-window holds <= width+1
    # newlines, so u8 counts suffice whenever width+1 < 256 (u16
    # otherwise). Both shifts stay 2-D (see _flat_shift) to preserve the
    # row tiling.
    if "win" in _ablate:
        seq_w, qual_w = seq_m, qual_m
    else:
        if width + 1 < 256:
            gw = offs_u8 + c_nl
        else:
            gw = offs.astype(jnp.uint16)[:, None] \
                + jnp.cumsum(nl.astype(jnp.uint16), axis=1)
        gm1 = _flat_shift(gw, 1, gw.dtype.type(0))
        gmw = _flat_shift(gw, width + 1, gw.dtype.type(0))
        in_win = ((gm1 - gmw) != gw.dtype.type(0)) | (idx2 < width)
        seq_w = seq_m & in_win
        qual_w = qual_m & in_win

    upper = r2 & jnp.uint8(0xDF)

    # ---- validation flags -------------------------------------------------
    prev_nl = _flat_shift(nl, 1, True)
    start_m = prev_nl & complete
    # one fused flag mask + a single any-reduction (separate jnp.any calls
    # each re-walked the chunk when XLA declined to merge them)
    bad_m = start_m & (phase == 0) & (r2 != jnp.uint8(AT))
    bad_m |= start_m & (phase == 2) & (r2 != jnp.uint8(PLUS))
    if check_ascii:
        bad_m |= valid & complete & ((r2 & jnp.uint8(0x80)) > 0)
    if check_quality:
        bad_m |= qual_m & ((r2 < jnp.uint8(q_lo)) | (r2 > jnp.uint8(q_hi)))
    bad = jnp.any(bad_m)

    # ---- per-line slot compaction ----------------------------------------
    # windowed masks here give per-read GC/mean-quality over each line's
    # first `width` bytes for free: bytes past the window contribute 0, so
    # per-segment sums are windowed sums
    cg = seq_w & ((upper == jnp.uint8(ord("C")))
                  | (upper == jnp.uint8(ord("G"))))
    # u8->i32 phred arithmetic: the all-u8 form miscompiles on fused strided
    # producers (ops/stats._masked_phred has the full story); arithmetic in
    # i32, then a cast — phred fits u8 and halves/quarters the traffic
    ph_i = jnp.clip(r2.astype(jnp.int32) - offset, 0, MAX_PHRED - 1)
    ph_u8 = jnp.where(qual_w, ph_i, 0).astype(jnp.uint8)

    # Per-line values via DIRECT per-tile segment sums (replaces the r4 u16
    # running-cumsum + slot-difference design: two [T, K] cumsums and their
    # slot reads were ~27%% of the step). A byte's segment rank within its
    # tile is its exclusive newline count c_nl - nl; the line ending at the
    # newline of rank b sums segment b, plus — for b == 0 — the carried
    # tail segments of the immediately preceding newline-free run of tiles
    # (one associative segmented-sum scan per value, O(T) elements).
    seg = c_nl - nl_u8
    m_u8 = m_t.astype(jnp.uint8)[:, None]
    rank = (c_nl - jnp.uint8(1))  # rank of a newline within its tile
    if "vals" in _ablate:
        cg_v = jnp.zeros((T, K), jnp.uint8)
        ph_v = jnp.zeros((T, K), jnp.uint8)
    else:
        cg_v = cg.astype(jnp.uint8)
        ph_v = ph_u8

    def seg_sums(vals_u8):
        cols = [jnp.sum(jnp.where(seg == jnp.uint8(b), vals_u8, 0),
                        axis=1, dtype=jnp.int32) for b in range(B)]
        tail_v = jnp.sum(jnp.where(seg == m_u8, vals_u8, 0),
                         axis=1, dtype=jnp.int32)
        # carried-in partial-line sum: segmented scan over (has-newline,
        # tail-sum) — a tile with a newline restarts the run
        has = m_t > 0

        def comb(a, b2):
            ah, av = a
            bh, bv = b2
            return ah | bh, bv + jnp.where(bh, 0, av)

        _, run = jax.lax.associative_scan(comb, (has, tail_v))
        carry_in = jnp.concatenate([jnp.zeros((1,), jnp.int32), run[:-1]])
        seg0 = jnp.stack(cols, axis=1)
        return seg0.at[:, 0].add(carry_in)

    if "slots" in _ablate:
        # Engine 3 skipped WHOLE (rank compaction, carry scans, per-read
        # histograms, slot reductions): attributes the full slot-machinery
        # cost in one subtraction. Stats WRONG by design; the corr dataflow
        # is preserved (max_line pinned to width keeps the lag zeroing
        # inert) and the m_t > B fallback term kept so the step returns.
        zi = jnp.zeros((), jnp.int32)
        reads = bases = win_bases = qual_bytes = zi
        max_line = jnp.int32(width)
        fallback = jnp.max(m_t, initial=0) > B
        length_hist = jnp.zeros(LEN_BINS, jnp.int32)
        gc_hist = jnp.zeros(GC_BINS, jnp.int32)
        mq_hist = jnp.zeros(MAX_PHRED, jnp.int32)
    else:
        pos_s = [jnp.sum(jnp.where(nl & (rank == jnp.uint8(b)), col, 0),
                         axis=1, dtype=jnp.int32) for b in range(B)]
        pos_slot = jnp.stack(pos_s, axis=1) + (jnp.arange(T, dtype=jnp.int32)
                                               * K)[:, None]
        line_cg = seg_sums(cg_v)
        line_ph = seg_sums(ph_v)

        bcol = jax.lax.broadcasted_iota(jnp.int32, (T, B), 1)
        l_idx = offs[:, None] + bcol                  # global line index
        entry = (bcol < jnp.minimum(m_t, B)[:, None]) \
            & (pos_slot < tail_start)
        role = l_idx & 3

        p1 = _carry_prev(pos_slot, m_t, B)
        p2 = _carry_prev(p1, m_t, B)
        p3 = _carry_prev(p2, m_t, B)
        p4 = _carry_prev(p3, m_t, B)
        p1e = jnp.where(l_idx == 0, -1, p1)

        line_len = pos_slot - p1e - 1

        e_r1 = entry & (role == 1)
        e_r3 = entry & (role == 3)

        # per-record seq/qual length equality (always an error in the
        # reference: CorruptedFile, parser.mojo:452-522)
        seq_len_at3 = p2 - p3 - 1
        bad |= jnp.any(e_r3 & (line_len != seq_len_at3))

        # ---- device-tier bounds -------------------------------------------
        # Correlation leakage (a lag reaching the NEXT record's same-class
        # line) exists only at lags >= min start-to-start gap; true panel
        # values are zero at lags >= the longest seq/qual line. So
        # min_gap >= max_line makes every leaked lag land in the
        # provably-zero region, which is zeroed explicitly below — records
        # merely >= the longest read stay in tier, not records >= width.
        big = jnp.int32(1 << 30)
        gap_mask = entry & ((role == 0) | (role == 2)) & (l_idx >= 4)
        min_gap = jnp.min(jnp.where(gap_mask, pos_slot - p4, big),
                          initial=big)
        max_line = jnp.max(jnp.where(e_r1 | e_r3, line_len, 0), initial=0)
        # correlation lags stop at width-1, so leaked lags (>= min_gap) are
        # harmless once min_gap >= width even when lines exceed width — long
        # reads stay on device (truncation semantics above)
        fallback = (jnp.max(m_t, initial=0) > B) \
            | (min_gap < jnp.minimum(max_line, jnp.int32(width)))

        # ---- per-read histograms on the slot structure ---------------------
        # Binned values fit u16 (lengths clip to LEN_BINS-1) / u8 (GC%% <=
        # 100, mean phred <= 63); invalid slots carry an out-of-range
        # sentinel. The one-hot compare then runs in packed sub-32-bit
        # lanes, and the first accumulation stage stays u8 (a tile row
        # holds B <= slot_cap <= 255 slots, so per-(tile, bin) counts
        # cannot wrap).
        lens_b = jnp.where(e_r1, jnp.minimum(line_len, LEN_BINS - 1),
                           0xFFFF).astype(jnp.uint16)
        # GC%/mean-quality are over the in-window bases (host row_histograms
        # semantics: cnt = min(true length, width)); length_hist stays TRUE
        eff_len = jnp.minimum(line_len, jnp.int32(width))
        safe_len = jnp.maximum(eff_len, 1)
        gcb_b = jnp.where(e_r1 & (line_len > 0),
                          (200 * line_cg + eff_len) // (2 * safe_len),
                          0xFF).astype(jnp.uint8)
        mqb_b = jnp.where(
            e_r3 & (line_len > 0),
            jnp.minimum((2 * line_ph + eff_len) // (2 * safe_len),
                        MAX_PHRED - 1), 0xFF).astype(jnp.uint8)

        def onehot_hist(v2d, nb):
            # narrow-dtype compares (packed lanes), flat i32 accumulation —
            # the measured-fast shape on v5e (staged u8 partials lose)
            bins = jnp.arange(nb, dtype=v2d.dtype)
            v = v2d.reshape(-1)
            return jnp.sum(v[:, None] == bins[None, :], axis=0,
                           dtype=jnp.int32)

        # ---- global panels (qc_stats truncation semantics) -----------------
        # bases/length_hist use TRUE lengths; composition/quality panels
        # cover in-window bytes. The r4 design burned five full-[T, K]
        # masked reductions here; each is a tiny [T, B] slot reduction
        # instead, and the A/C/G/T composition comes free below as row sums
        # of the corr per-position panels.
        reads = jnp.sum(e_r3, dtype=jnp.int32)
        bases = jnp.sum(jnp.where(e_r1, line_len, 0), dtype=jnp.int32)
        win_bases = jnp.sum(jnp.where(e_r1, eff_len, 0), dtype=jnp.int32)
        qual_bytes = jnp.sum(jnp.where(e_r3, eff_len, 0), dtype=jnp.int32)

        if "rhist" in _ablate:
            # just the [T, B] bin compares (the len/GC/meanQ histograms) —
            # the finer member that splits engine 3's histogram cost from
            # its compaction/carry cost
            length_hist = jnp.zeros(LEN_BINS, jnp.int32)
            gc_hist = jnp.zeros(GC_BINS, jnp.int32)
            mq_hist = jnp.zeros(MAX_PHRED, jnp.int32)
        else:
            if len_vals:
                # eq-mode length histogram (same contract as hist_vals):
                # real corpora hit a handful of distinct read lengths, so
                # LEN_BINS=512 one-hot compares — the biggest [T, B] cost —
                # shrink to one equality per OBSERVED length; the remainder
                # bin at max+1 is reads minus the sum (a slot outside the
                # set can only be a length the peek missed), and the caller
                # re-runs full-bins when it is nonzero. Sentinel slots
                # (0xFFFF) never match.
                assert max(len_vals) + 1 < LEN_BINS, \
                    "len_vals needs a remainder bin"
                lcounts = [jnp.sum(lens_b == jnp.uint16(v), dtype=jnp.int32)
                           for v in len_vals]
                length_hist = jnp.zeros(LEN_BINS, jnp.int32)
                for v, cv in zip(len_vals, lcounts):
                    length_hist = length_hist.at[v].set(cv)
                length_hist = length_hist.at[max(len_vals) + 1].set(
                    reads - sum(lcounts))
            else:
                length_hist = onehot_hist(lens_b, LEN_BINS)
            gc_hist = onehot_hist(gcb_b, GC_BINS)
            mq_hist = onehot_hist(mqb_b, MAX_PHRED)

    # Phred histogram: cumulative ge-trick off raw quality bytes (see
    # ops/uniform_qc.py); flat u8-compare + i32 reduce — staged u8/u16
    # partial accumulation measured slower on v5e. `hist_vals` eq-mode:
    # one equality reduction per observed phred value + a free remainder
    # bin at max+1 (same contract as the uniform kernel — the caller
    # re-runs full-bins when the accumulated remainder is nonzero).
    n_bins = min(q_hi - offset, MAX_PHRED - 1) + 1 if check_quality \
        else MAX_PHRED
    n_bins = max(1, min(n_bins, MAX_PHRED))
    if "hist" in _ablate:
        n_bins = 1
    use_eq = bool(hist_vals) and check_quality and "hist" not in _ablate
    qm_b = jnp.where(qual_w, r2, jnp.uint8(0))  # 0 < offset always
    if use_eq:
        assert q_lo >= offset and max(hist_vals) + 1 < n_bins, \
            "hist_vals outside the eq-mode preconditions"
        counts = [jnp.sum(qm_b == jnp.uint8(offset + v), dtype=jnp.int32)
                  for v in hist_vals]
        qual_hist = jnp.zeros(MAX_PHRED, jnp.int32)
        for v, cv in zip(hist_vals, counts):
            qual_hist = qual_hist.at[v].set(cv)
        qual_hist = qual_hist.at[max(hist_vals) + 1].set(
            qual_bytes - sum(counts))
    else:
        ge = [qual_bytes]
        ge += [jnp.sum(qm_b >= jnp.uint8(offset + k), dtype=jnp.int32)
               for k in range(1, n_bins)]
        ge.append(jnp.zeros((), jnp.int32))
        qual_hist = jnp.zeros(MAX_PHRED, jnp.int32).at[:n_bins].set(
            jnp.stack([ge[k] - ge[k + 1] for k in range(n_bins)]))

    # ---- per-position panels: MXU cross-correlations ----------------------
    # Operands stay in the chunk's native [T, K] layout: lags < width <= K
    # land in the same row or spill exactly one row (G2 covers it), so no
    # [Tc, Wc] reshape is needed — the r4 design's per-channel reshapes
    # were physical tile-relayout copies that broke XLA's fusion of the
    # mask math into the concat write (measured ~3x on this sub-engine).
    if "corr" in _ablate:
        d_seq = jnp.zeros((5, width), jnp.int32)
        d_q = jnp.zeros((width,), jnp.int32)
    else:
        sstart = (start_m & (phase == 1) & (~nl)).astype(jnp.int8)
        qstart = (start_m & (phase == 3) & (~nl)).astype(jnp.int8)
        seq_chans = [(seq_w & (upper == jnp.uint8(b))).astype(jnp.int8)
                     for b in _BASES] + [seq_w.astype(jnp.int8)]
        M_seq = jnp.concatenate(seq_chans, axis=1)        # [T, 5*K]
        M_q = ph_u8.astype(jnp.int8)                      # phred 0..63 i8
        G1s, G2s = _corr(sstart, M_seq, K)
        G1q, G2q = _corr(qstart, M_q, K)
        d_seq = _diag_sums(G1s, G2s, K, 5, width)         # [5, width]
        d_q = _diag_sums(G1q, G2q, K, 1, width)[0]        # [width]

    # zero the provably-empty lag region (see the tier-bound comment): any
    # cross-record leakage lands at lags >= min_gap >= max_line only
    in_line = jax.lax.broadcasted_iota(jnp.int32, (width,), 0) < max_line
    d_seq = jnp.where(in_line[None, :], d_seq, 0)
    d_q = jnp.where(in_line, d_q, 0)

    per_pos_count = d_seq[4]
    per_pos_base = jnp.concatenate(
        [d_seq[:4], (per_pos_count - jnp.sum(d_seq[:4], axis=0))[None, :]])
    # global composition = row sums of the per-position panels (exact
    # in-tier: lags past max_line are zeroed above and provably empty)
    acgt_tot = jnp.sum(d_seq[:4], axis=1)
    base_counts = jnp.concatenate(
        [acgt_tot, (win_bases - jnp.sum(acgt_tot))[None]])

    stats = QCStats(
        reads=reads,
        bases=bases,
        base_counts=base_counts,
        per_pos_base_counts=per_pos_base,
        per_pos_qual_sum=d_q,
        per_pos_count=per_pos_count,
        qual_hist=qual_hist,
        gc_count=base_counts[1] + base_counts[2],
        error_reads=jnp.zeros((), jnp.int32),
        length_hist=length_hist,
        gc_hist=gc_hist,
        mean_qual_hist=mq_hist,
    )
    return RaggedQC(ok=~bad, fallback=fallback, tail_start=tail_start,
                    stats=stats)
