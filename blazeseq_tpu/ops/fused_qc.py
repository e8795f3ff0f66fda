"""Single-pass Pallas kernel: uniform-layout FASTQ parse + validate + QC.

Pipeline B's device step used to be two XLA passes (ops/uniform_parse.py
template proof + SoA materialization, then ops/stats.py qc_stats) — ~4-5
effective HBM sweeps over the chunk. This kernel does the whole thing in ONE
VMEM-tiled sweep: each grid step loads a [rows, rs] tile of records, proves
the newline/marker template, validates ASCII + quality range, and
accumulates every QCStats panel directly — no padded SoA is ever written to
HBM. The per-position panels fall out for free: under a uniform layout,
"position p of every read" IS column (o1+1+p) of the record matrix, so
per-position base counts and quality sums are plain column sums.

Two exactness tricks keep the VPU work low without losing bit-parity with
the XLA oracle (uniform_parse + qc_stats, which remains the CPU/interpret
reference and is what the parity tests compare against):

* range-limited quality histogram: the Phred histogram needs only
  min(UPPER-OFFSET, 63)+1 bins when quality validation is on (any byte
  outside [LOWER, UPPER] rejects the chunk to the byte-exact host path, and
  bytes below OFFSET clamp into bin 0 exactly like the host _masked_phred);
* division-free per-read binning: GC%% and mean-quality bins are found by
  comparing 200*gc+cnt (resp. 2*qsum+cnt) against the static bin boundary
  products, instead of computing an integer quotient per read.

Reference behavior spec: blazeseq/utils.mojo:472-551 (_scan_record) +
blazeseq/fastq/record.mojo:77-148 (Validator); stats panel semantics match
ops/stats.py::qc_stats (in-window masking, clamped bins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret
from .stats import GC_BINS, LEN_BINS, MAX_PHRED, QCStats

NEWLINE = 10
AT = 64
PLUS = 43

_BASES = b"ACGT"


def _pick_rows(rs: int, nrec: int) -> int:
    """Tile row count: ~256K elements per tile (u8 tile ~256 KB, i32
    intermediates ~1 MB), floor 32 rows (int8 sublane tile), capped to the
    record count rounded up to a multiple of 32."""
    target = max(1, (1 << 18) // rs)
    rows = 32
    while rows * 2 <= target:
        rows *= 2
    return min(rows, max(32, ((nrec + 31) // 32) * 32))


def _kernel_body(rs, o1, o2, o3, cnt, n_bins, check_ascii, check_quality,
                 q_lo, q_hi, offset, rows,
                 s_ref, x_ref, bad_ref, csq_ref, csb_ref, qh_ref, gch_ref,
                 mqh_ref):
    """One [rows, rs] record tile -> accumulate all QC panels.

    cnt = min(seq_len, width): the in-window column count every stats panel
    is masked to (validation still covers the full seq/qual regions).

    Lowering rules this body is shaped around (v5e Mosaic):
    * no scalar reductions or scalar VMEM stores — every accumulator is a
      row vector / matrix; final scalarization happens in the XLA epilogue
      (the histogram is accumulated as [64, 128] column partials);
    * stats work runs on the [rows, cnt] seq/qual column slices, not the
      full record tile (half the bytes of a typical FASTQ record);
    * 8-bit vector compares are unsupported — everything upcasts to i32.
    """
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        bad_ref[...] = jnp.zeros_like(bad_ref)
        csq_ref[...] = jnp.zeros_like(csq_ref)
        csb_ref[...] = jnp.zeros_like(csb_ref)
        qh_ref[...] = jnp.zeros_like(qh_ref)
        gch_ref[...] = jnp.zeros_like(gch_ref)
        mqh_ref[...] = jnp.zeros_like(mqh_ref)

    x = x_ref[...].astype(jnp.int32)  # [rows, rs]; Mosaic pads lanes
    row_g = pid * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_valid = row_g < s_ref[0]  # [rows, 1]
    rv_i = row_valid.astype(jnp.int32)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    # --- template proof + validation (full regions) -----------------------
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)
    tmpl = (col == o1) | (col == o2) | (col == o3) | (col == rs - 1)
    bad = (x == NEWLINE) != tmpl
    if check_ascii:
        bad |= x > 127
    if check_quality:
        in_qual_full = (col >= o3 + 1) & (col < rs - 1)
        bad |= in_qual_full & ((x < q_lo) | (x > q_hi))
    row_bad = jnp.max(bad.astype(jnp.int32), axis=1, keepdims=True)
    marker_ok = ((x[:, 0:1] == AT) & (x[:, o2 + 1:o2 + 2] == PLUS))
    row_bad = jnp.maximum(row_bad, 1 - marker_ok.astype(jnp.int32))
    bad_lane0 = (row_bad * rv_i) * (lane128 == 0).astype(jnp.int32)
    bad_ref[0:1, :] += jnp.sum(bad_lane0, axis=0, keepdims=True)

    # --- stats on the in-window column slices -----------------------------
    s_tile = x[:, o1 + 1:o1 + 1 + cnt]  # [rows, cnt] sequence window
    q_tile = x[:, o3 + 1:o3 + 1 + cnt]  # [rows, cnt] quality window

    upper = s_tile & 0xDF
    gc_rows = None
    for k, b in enumerate(_BASES):
        m = ((upper == b) & row_valid).astype(jnp.int32)
        csb_ref[k:k + 1, :] += jnp.sum(m, axis=0, keepdims=True)
        if b in (ord("C"), ord("G")):
            gc_rows = m if gc_rows is None else gc_rows + m

    # Phred decode (host clamp semantics: q < offset -> 0, cap MAX_PHRED-1)
    ph = jnp.clip(q_tile - offset, 0, MAX_PHRED - 1)
    ph_m = jnp.where(row_valid, ph, -1)  # excluded rows match no bin
    csq_ref[0:1, :] += jnp.sum(jnp.where(row_valid, ph, 0), axis=0,
                               keepdims=True)
    # histogram as [64, 128] column partials: one sublane reduction per bin,
    # no scalar reductions anywhere (the epilogue sums axis=1)
    for k in range(n_bins):
        qh_ref[k:k + 1, :] += jnp.sum((ph_m == k).astype(jnp.int32), axis=0,
                                      keepdims=True)

    # --- per-read panels (division-free bin search) -----------------------
    gc_r = jnp.sum(gc_rows, axis=1, keepdims=True)  # [rows, 1]
    qs_r = jnp.sum(jnp.where(row_valid, ph, 0), axis=1, keepdims=True)
    # gc bin g: g*2c <= 200*gc + c < (g+1)*2c   (c = cnt > 0, static)
    gnum = 200 * gc_r + cnt
    g_ok = ((gnum >= lane128 * (2 * cnt)) & (gnum < (lane128 + 1) * (2 * cnt))
            & (lane128 < GC_BINS) & row_valid)
    gch_ref[0:1, :] += jnp.sum(g_ok.astype(jnp.int32), axis=0, keepdims=True)
    # mean-qual bin m: m*2c <= 2*qsum + c < (m+1)*2c, clamped into bin 63
    mnum = 2 * qs_r + cnt
    mhi = jnp.where(lane128 == MAX_PHRED - 1, jnp.int32(2 ** 30),
                    (lane128 + 1) * (2 * cnt))
    m_ok = ((mnum >= lane128 * (2 * cnt)) & (mnum < mhi)
            & (lane128 < MAX_PHRED) & row_valid)
    mqh_ref[0:1, :] += jnp.sum(m_ok.astype(jnp.int32), axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("rs", "o1", "o2", "o3", "width", "check_ascii",
                     "check_quality", "q_lo", "q_hi", "offset"))
def fused_uniform_qc(chunk, n_valid, *, rs: int, o1: int, o2: int, o3: int,
                     width: int, q_lo: int, q_hi: int, offset: int,
                     check_ascii: bool = True, check_quality: bool = True):
    """Parse+validate+QC a uniform-layout chunk in one device sweep.

    chunk: u8[n], n % rs == 0 (caller pads; padded rows excluded via
    n_valid, which must be a multiple of rs). Schema bounds are static —
    one compile per (layout, schema), a handful in practice.

    Returns (template_ok bool[], stats QCStats) — stats bit-identical to
    uniform_parse(fused_checks=True) + qc_stats on accepted chunks; on a
    rejected chunk template_ok is False and stats must be discarded (the
    caller re-parses on the byte-exact host path).
    """
    n = chunk.shape[0]
    assert n % rs == 0, "chunk length must be padded to a multiple of rs"
    nrec = n // rs
    seq_len = o2 - o1 - 1
    cnt = min(seq_len, width)
    # range-limited histogram: safe only when out-of-range bytes reject the
    # chunk; otherwise the host clamps anything into [0, 64) and so must we
    n_bins = min(q_hi - offset, MAX_PHRED - 1) + 1 if check_quality \
        else MAX_PHRED
    n_bins = max(1, min(n_bins, MAX_PHRED))

    rows = _pick_rows(rs, nrec)
    grid = (pl.cdiv(nrec, rows),)
    x2 = chunk.reshape(nrec, rs)
    nrec_valid = (n_valid // rs).astype(jnp.int32)

    kernel = functools.partial(
        _kernel_body, rs, o1, o2, o3, cnt, n_bins, check_ascii,
        check_quality, q_lo, q_hi, offset, rows)
    out_shape = (
        jax.ShapeDtypeStruct((1, 128), jnp.int32),   # bad row count (lane 0)
        jax.ShapeDtypeStruct((1, cnt), jnp.int32),   # per-position phred sum
        jax.ShapeDtypeStruct((4, cnt), jnp.int32),   # per-position ACGT
        jax.ShapeDtypeStruct((64, cnt), jnp.int32),  # phred hist col-partials
        jax.ShapeDtypeStruct((1, 128), jnp.int32),   # gc%% histogram
        jax.ShapeDtypeStruct((1, 128), jnp.int32),   # mean-qual histogram
    )
    # index maps get the scalar-prefetch ref appended to the grid indices
    acc_spec = lambda r, c: pl.BlockSpec((r, c), lambda i, *_: (0, 0),
                                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, rs), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(acc_spec(1, 128), acc_spec(1, cnt), acc_spec(4, cnt),
                   acc_spec(64, cnt), acc_spec(1, 128), acc_spec(1, 128)),
    )
    bad, csq, csb, qh, gch, mqh = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=use_interpret(),
    )(jnp.reshape(nrec_valid, (1,)), x2)

    # --- assemble the QCStats pytree (tiny epilogue, XLA-fused) -----------
    template_ok = bad[0, 0] == 0
    w = width
    posw = jax.lax.broadcasted_iota(jnp.int32, (w,), 0)
    in_win = posw < cnt

    def window(row):
        # [cnt] per-position sums -> [width], zero past the window
        return jnp.where(in_win, jnp.pad(row, (0, w - cnt)) if w > cnt
                         else row[:w], 0)

    per_pos_qual = window(csq[0])
    acgt = [window(csb[k]) for k in range(4)]
    per_pos_count = jnp.where(in_win, nrec_valid, 0)
    other = per_pos_count - (acgt[0] + acgt[1] + acgt[2] + acgt[3])
    per_pos_base = jnp.stack(acgt + [other])
    base_counts = jnp.sum(per_pos_base, axis=1, dtype=jnp.int32)

    length_hist = (jnp.arange(LEN_BINS, dtype=jnp.int32)
                   == min(seq_len, LEN_BINS - 1)).astype(jnp.int32) \
        * nrec_valid
    stats = QCStats(
        reads=nrec_valid,
        bases=nrec_valid * jnp.int32(seq_len),
        base_counts=base_counts,
        per_pos_base_counts=per_pos_base,
        per_pos_qual_sum=per_pos_qual,
        per_pos_count=per_pos_count,
        qual_hist=jnp.sum(qh, axis=1, dtype=jnp.int32),
        gc_count=base_counts[1] + base_counts[2],
        error_reads=jnp.zeros((), jnp.int32),
        length_hist=length_hist,
        gc_hist=gch[0, :GC_BINS],
        mean_qual_hist=mqh[0, :MAX_PHRED],
    )
    return template_ok, stats
