"""One-shot XLA step: uniform-layout FASTQ parse + validate + full QC.

Replaces the two-stage pipeline-B device step (ops/uniform_parse.py template
proof + padded-SoA materialization, then ops/stats.py qc_stats) with a single
jitted function that computes every QCStats panel DIRECTLY on column slices
of the [nrec, rs] record matrix — the padded SoA is never materialized, so
~4 HBM sweeps (write seq/qual + read them back) disappear.

Why XLA and not a hand-written Mosaic kernel: this workload is VPU-bound on
the Phred histogram, and XLA's TPU emitters vectorize uint8 compares at 4
lanes/word while Mosaic rejects sub-32-bit vector compares outright
("Target does not support this comparison", v5e) — measured on this chip,
the best legal Mosaic formulation (i32 compares / bf16 min-max indicators)
runs the histogram 2-4x SLOWER than XLA's u8 path. ops/fused_qc.py keeps the
Pallas variant for comparison; this module is the production step.

Histogram trick (exactness preserved): when quality validation is on, every
accepted chunk has q in [LOWER, UPPER], so only min(UPPER-OFFSET, 63)+1 bins
can be hit, and hist[k] = ge[k] - ge[k+1] where ge[k] = #(phred >= k) —
2 u8 ops per bin instead of 3, over ~n_bins instead of 64 bins.

Reference behavior spec: blazeseq/utils.mojo:472-551 (_scan_record) +
blazeseq/fastq/record.mojo:77-148 (Validator); panel semantics are
bit-identical to uniform_parse(fused_checks=True) + qc_stats (the parity
oracle in tests/test_fused_qc.py::test_parity_clean_corpus et al.).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stats import GC_BINS, LEN_BINS, MAX_PHRED, QCStats

NEWLINE = 10
AT = 64
PLUS = 43

_BASES = b"ACGT"


@functools.partial(
    jax.jit,
    static_argnames=("rs", "o1", "o2", "o3", "width", "check_ascii",
                     "check_quality", "q_lo", "q_hi", "offset", "mxu_sums",
                     "hist_vals", "hist_form", "_ablate"))
def uniform_qc(chunk, n_valid, *, rs: int, o1: int, o2: int, o3: int,
               width: int, q_lo: int, q_hi: int, offset: int,
               check_ascii: bool = True, check_quality: bool = True,
               mxu_sums: bool = False, hist_vals: tuple = (),
               hist_form: str = "auto",
               _ablate: frozenset = frozenset()):
    """Parse+validate+QC a uniform-layout chunk in one fused XLA step.

    chunk: u8[n] with n % rs == 0, or u8[nrec, rs] (caller pads; padded
    rows excluded via n_valid, a multiple of rs). PREFER the 2-D form with
    the array uploaded as [nrec, rs]: a device-resident 2-D buffer carries
    XLA's (8,128) tiling, so the column slices below are lane-regular reads
    — measured 15.2 -> ~6.5 ms per 256 MB chunk on v5e vs the 1-D form,
    whose fused strided gathers defeat the 4x u8 lane packing (see
    docs/perf_roofline_uniform_qc.md). Schema bounds are static (one
    compile per layout+schema). Returns (template_ok bool[], stats
    QCStats); stats are only meaningful when template_ok — a rejected
    chunk goes to the byte-exact host path.

    `hist_vals` (static, () = off) is the caller-observed set of DISTINCT
    phred values: the histogram then runs one equality reduction per
    member plus a free remainder bin at max(hist_vals)+1 counting every
    byte whose phred is NOT in the set — the caller re-runs full-bins
    when the accumulated remainder is nonzero, so exactness never depends
    on the peek (models/qc.py). The dominant P5 pass is linear in the
    reduction count, and real corpora are quality-BINNED (NovaSeq: 4
    distinct values vs sanger's 41 bins), so the whole step runs ~2-3x
    faster on modern data. Validation bounds stay q_lo/q_hi.

    `hist_form` (static) picks the full-range histogram formulation:
    "flat" is the one-reduction-per-bin form; "packed" packs 4 bins into
    one i32 row accumulator as 8-bit fields (exact whenever the window is
    <= 255 columns, since a per-row bin count is bounded by the window)
    so the qual region is swept once per FOUR bins; "auto" (default)
    picks packed when cnt <= 255, else flat. Bit-identical by
    construction — same compares, same integer counts — and measured
    ~1.5-1.9x faster on the 41-bin sanger corpus on v5e
    (docs/perf_roofline_uniform_qc.md). Ignored in hist_vals eq-mode.

    `_ablate` is a perf-diagnosis knob ONLY (the roofline breakdown script
    benchmark/scripts/roofline_uniform_qc.py uses it to attribute step
    time): members of {"proof", "perpos", "gcread", "qsum", "hist",
    "perread"} skip that logical pass (P1 / P2 / P3 / P4 / P5 / the
    per-read one-hot histograms) and substitute zeros, producing WRONG
    results. Never set it in production code; ignored under mxu_sums.
    """
    if chunk.ndim == 2:
        assert chunk.shape[1] == rs, "2-D chunk must be [nrec, rs]"
        nrec = chunk.shape[0]
    else:
        n = chunk.shape[0]
        assert n % rs == 0, "chunk length must be padded to a multiple of rs"
        nrec = n // rs
    seq_len = o2 - o1 - 1
    cnt = min(seq_len, width)
    n_bins = min(q_hi - offset, MAX_PHRED - 1) + 1 if check_quality \
        else MAX_PHRED
    n_bins = max(1, min(n_bins, MAX_PHRED))
    if "hist" in _ablate:
        n_bins = 1
    # eq-mode preconditions: every member representable as a byte equality
    # (phred v <-> byte offset+v requires no clamping below offset, i.e.
    # q_lo >= offset — same condition as raw_q_sums) and a free bin above
    # the max for the remainder. The caller guarantees these; assert to
    # keep a bad call from producing silently-wrong stats.
    use_eq = bool(hist_vals) and check_quality and "hist" not in _ablate
    if use_eq:
        assert q_lo >= offset and max(hist_vals) + 1 < n_bins, \
            "hist_vals outside the eq-mode preconditions"

    r2 = chunk if chunk.ndim == 2 else chunk.reshape(nrec, rs)
    nrec_valid = (n_valid // rs).astype(jnp.int32)
    row_valid = (jax.lax.broadcasted_iota(jnp.int32, (nrec, 1), 0)
                 < nrec_valid)

    # --- template proof + validation (full regions, u8 compares) ----------
    # NOTE on shape: per-row `any` + one masked row reduction measures
    # FASTER than the "obvious" global jnp.any(bad & row_valid) — the
    # row-major form keeps XLA's emitters in a single fused loop over r2
    # (measured 15.3ms vs 22ms per 256 MB on v5e for the whole step).
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)
    if "proof" in _ablate:
        template_ok = jnp.array(True)
    else:
        tmpl = (col == o1) | (col == o2) | (col == o3) | (col == rs - 1)
        bad = (r2 == jnp.uint8(NEWLINE)) != tmpl
        if check_ascii:
            bad |= r2 > jnp.uint8(127)
        if check_quality:
            in_qual_full = (col >= o3 + 1) & (col < rs - 1)
            bad |= in_qual_full & ((r2 < jnp.uint8(q_lo))
                                   | (r2 > jnp.uint8(q_hi)))
        bad_rows = jnp.any(bad, axis=1, keepdims=True)
        bad_rows |= (r2[:, 0:1] != jnp.uint8(AT)) \
            | (r2[:, o2 + 1:o2 + 2] != jnp.uint8(PLUS))
        template_ok = ~jnp.any(bad_rows & row_valid)

    # --- stats on the in-window column slices -----------------------------
    s_tile = r2[:, o1 + 1:o1 + 1 + cnt]
    q_tile = r2[:, o3 + 1:o3 + 1 + cnt]

    upper = s_tile & jnp.uint8(0xDF)

    # Quality bytes, excluded rows zeroed ONCE (0 < OFFSET always, so
    # masked-out bytes can never satisfy any >= threshold below).
    qm = jnp.where(row_valid, q_tile, jnp.uint8(0))

    # Exact-decode shortcut: with quality validation ON and a schema whose
    # byte range maps inside the 0..63 phred window (sanger/illumina*: lo
    # >= OFFSET, hi - OFFSET <= 63), every accepted byte satisfies
    # clip(q - off, 0, 63) == q - off, so phred sums are raw byte sums
    # minus offset * counts — no per-byte int32 decode chain at all.
    raw_q_sums = (check_quality and q_lo >= offset
                  and q_hi - offset <= MAX_PHRED - 1)

    if mxu_sums:
        # Column/row accumulations as i8 x i8 -> i32 contractions: the MXU
        # does the integer sums (exact; same trick as ops/ragged_qc._corr)
        # while the VPU only builds masks and the histogram. One dot per
        # panel — each operand is a plain elementwise compare of the r2
        # slice, which XLA can fuse into the dot; a single concatenated
        # [nrec, 5*cnt] operand would materialize ~5x the seq region in
        # HBM and swamp the win.
        rv8 = row_valid.astype(jnp.int8)           # [nrec, 1]
        dn = (((0,), (0,)), ((), ()))
        base_masks = [(upper == jnp.uint8(b)).astype(jnp.int8)
                      for b in _BASES]
        if raw_q_sums:
            q_op = qm.astype(jnp.int8)             # bytes <= q_hi <= 127
        else:
            ph_i = jnp.clip(qm.astype(jnp.int32) - offset, 0, MAX_PHRED - 1)
            ph_i = jnp.where(row_valid, ph_i, 0)
            q_op = ph_i.astype(jnp.int8)           # phred 0..63 fits i8
        col_sum = lambda m: jax.lax.dot_general(
            rv8, m, dn, preferred_element_type=jnp.int32)[0]
        per_pos = [col_sum(m) for m in base_masks]
        per_pos_qual = col_sum(q_op)
        if raw_q_sums:
            # masked-out rows contributed 0 bytes; in-window columns hold
            # nrec_valid real bytes each
            per_pos_qual = per_pos_qual - offset * nrec_valid
        ones_c = jnp.ones((cnt, 1), jnp.int8)
        gc8 = ((upper == jnp.uint8(ord("C")))
               | (upper == jnp.uint8(ord("G")))).astype(jnp.int8)
        gc_read = jax.lax.dot_general(
            gc8, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[:, 0]
        qs_read = jax.lax.dot_general(
            q_op, ones_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)[:, 0]
        if raw_q_sums:
            qs_read = jnp.where(row_valid[:, 0], qs_read - offset * cnt, 0)
    else:
        if "perpos" in _ablate:
            per_pos = [jnp.zeros((cnt,), jnp.int32) for _ in _BASES]
        else:
            per_pos = []
            for b in _BASES:
                m = (upper == jnp.uint8(b)) & row_valid
                per_pos.append(jnp.sum(m, axis=0, dtype=jnp.int32))
        if "gcread" in _ablate:
            gc_read = jnp.zeros((nrec,), jnp.int32)
        else:
            gc_read = jnp.sum((upper == jnp.uint8(ord("C")))
                              | (upper == jnp.uint8(ord("G"))), axis=1,
                              dtype=jnp.int32)  # [nrec] (invalid rows masked)

        if "qsum" in _ablate:
            per_pos_qual = jnp.zeros((cnt,), jnp.int32)
            qs_read = jnp.zeros((nrec,), jnp.int32)
        elif raw_q_sums:
            qs32 = qm.astype(jnp.int32)
            per_pos_qual = jnp.sum(qs32, axis=0) - offset * nrec_valid
            qs_read = jnp.where(
                row_valid[:, 0],
                jnp.sum(qs32, axis=1) - offset * cnt, 0)
        else:
            # Phred decode for the sum panels. COMPILER NOTE (jax 0.9.0,
            # cpu AND tpu): all-uint8 `min(where(q >= off, q - off, 0),
            # cap)` on a strided fused producer (a column slice of a
            # reshape) miscompiles — the subtraction is dropped. Do the
            # arithmetic in int32 (ops/stats.py _masked_phred has the full
            # story); XLA still fuses.
            ph_i = jnp.clip(qm.astype(jnp.int32) - offset, 0, MAX_PHRED - 1)
            ph_i = jnp.where(row_valid, ph_i, 0)
            per_pos_qual = jnp.sum(ph_i, axis=0, dtype=jnp.int32)
            qs_read = jnp.sum(ph_i, axis=1, dtype=jnp.int32)

    # Cumulative histogram straight off the raw quality bytes: for k >= 1,
    # phred >= k  <=>  q >= OFFSET + k (clamps included: q < OFFSET gives
    # phred 0, and the cap at 63 only ever ADDS to >= k counts, matching
    # q >= OFFSET + k exactly for k <= 63). ge[0] is the free in-window
    # count. 2 uint8 ops per bin, no decode chain in the loop.
    # NOTE (r5, measured): the flat u8-compare + i32 reduce IS the fast
    # form — staged u8/u16 partial accumulation (per-row or row-group)
    # measured 1.7x-50x SLOWER on v5e (cross-lane reduces / reshape
    # relayouts), and the in-kernel hist already runs at the dense-array
    # bound (docs/perf_roofline_uniform_qc.md). The remaining lever is the
    # reduction COUNT: hist_vals eq-mode below.
    if use_eq:
        # one equality reduction per observed phred value; the remainder
        # bin (max+1, free via subtraction from the in-window total) is
        # nonzero iff some byte's phred was NOT in the set — the caller's
        # signal to re-run full-bins
        total_q = nrec_valid * jnp.int32(cnt)
        counts = [jnp.sum(qm == jnp.uint8(offset + v), dtype=jnp.int32)
                  for v in hist_vals]
        qual_hist = jnp.zeros(MAX_PHRED, jnp.int32)
        for v, cv in zip(hist_vals, counts):
            qual_hist = qual_hist.at[v].set(cv)
        qual_hist = qual_hist.at[max(hist_vals) + 1].set(
            total_q - sum(counts))
    else:
        ge = [nrec_valid * jnp.int32(cnt)]
        packed = hist_form == "packed" or (hist_form == "auto" and cnt <= 255)
        if packed and cnt <= 255:
            # 4 bins per pass: the per-row count of any bin is <= cnt <=
            # 255, so four 8-bit fields of one i32 accumulate without
            # carries (the bit pattern is exact mod 2^32 even when field
            # 3 sets the sign bit; arithmetic shift + 0xFF mask recovers
            # each field). One axis-1 sweep of qm per group instead of a
            # global reduction per bin — measured 6.7 -> ~4.4 ms/256 MB
            # on v5e (the losing alternatives — 4-bit fields w/ column
            # blocks, select-form packing, 16-bit pairs — are recorded in
            # docs/perf_roofline_uniform_qc.md).
            ge_rest = [None] * (n_bins - 1)
            kss = list(range(1, n_bins))
            for g in range(0, len(kss), 4):
                grp = kss[g:g + 4]
                m = (qm >= jnp.uint8(offset + grp[0])).astype(jnp.int32)
                for j, k in enumerate(grp[1:], 1):
                    m = m + (qm >= jnp.uint8(offset + k)).astype(
                        jnp.int32) * (1 << (8 * j))
                rowp = jnp.sum(m, axis=1, dtype=jnp.int32)  # [nrec]
                for j in range(len(grp)):
                    ge_rest[g + j] = jnp.sum((rowp >> (8 * j)) & 0xFF,
                                             dtype=jnp.int32)
            ge += ge_rest
        else:
            ge += [jnp.sum(qm >= jnp.uint8(offset + k), dtype=jnp.int32)
                   for k in range(1, n_bins)]
        ge.append(jnp.zeros((), jnp.int32))
        qual_hist = jnp.zeros(MAX_PHRED, jnp.int32).at[:n_bins].set(
            jnp.stack([ge[k] - ge[k + 1] for k in range(n_bins)]))

    # --- per-read panels (qs_read computed with the sum panels above) ------
    rv1 = row_valid[:, 0]
    # binning semantics identical to ops/stats.py row_histograms with
    # cnt == min(seq_len, width) (static, > 0)
    if "perread" in _ablate:
        gc_hist = jnp.zeros(GC_BINS, jnp.int32)
        mq_hist = jnp.zeros(MAX_PHRED, jnp.int32)
    else:
        gc_bin = jnp.where(rv1, (200 * gc_read + cnt) // (2 * cnt), -1)
        mq_bin = jnp.where(
            rv1, jnp.minimum((2 * qs_read + cnt) // (2 * cnt),
                             MAX_PHRED - 1), -1)
        bins_g = jnp.arange(GC_BINS, dtype=jnp.int32)
        gc_hist = jnp.sum(gc_bin[:, None] == bins_g[None, :], axis=0,
                          dtype=jnp.int32)
        bins_m = jnp.arange(MAX_PHRED, dtype=jnp.int32)
        mq_hist = jnp.sum(mq_bin[:, None] == bins_m[None, :], axis=0,
                          dtype=jnp.int32)

    # --- assemble ----------------------------------------------------------
    w = width
    in_win = jax.lax.broadcasted_iota(jnp.int32, (w,), 0) < cnt

    def window(row):
        return jnp.where(in_win, jnp.pad(row, (0, w - cnt)) if w > cnt
                         else row[:w], 0)

    acgt = [window(p) for p in per_pos]
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
        per_pos_qual_sum=window(per_pos_qual),
        per_pos_count=per_pos_count,
        qual_hist=qual_hist,
        gc_count=base_counts[1] + base_counts[2],
        error_reads=jnp.zeros((), jnp.int32),
        length_hist=length_hist,
        gc_hist=gc_hist,
        mean_qual_hist=mq_hist,
    )
    return template_ok, stats
