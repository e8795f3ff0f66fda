"""Batched Needleman-Wunsch global alignment on TPU.

Device analog of the reference GPU example (examples/nw_gpu/kernels.mojo:21-89:
one CUDA-style block per read, two-row DP, scoring +1 match / -1 mismatch /
-1 gap, dp[0][j] = -j, dp[i][0] = -i, score = dp[qlen][rlen]).

The TPU-native formulation is an **anti-diagonal wavefront**: cells on
diagonal d = i + j depend only on diagonals d-1 and d-2, so each step is a
fully vectorized [batch, Lq+1] VPU update and the sequential dimension is a
single lax.fori_loop/scan of length Lq+Lr. Reads are a padded [B, Lq] SoA
batch (variable lengths via a lengths vector); per-read scores are extracted
at diagonal d = len + Lr with a one-hot reduction.

Three implementations with identical results:
  * `needleman_wunsch_cpu` — numpy scalar twin for validation
    (≡ kernels.mojo:92-129)
  * `nw_scores_xla`       — jnp lax.scan version
  * `nw_scores_pallas`    — Pallas kernel, DP diagonals resident in VMEM,
    grid over record tiles

Beyond the reference: `sw_scores_xla` / `smith_waterman_cpu` reuse the same
wavefront for Smith-Waterman local alignment (zero-clamped cells, running
max over valid cells instead of corner extraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up, use_interpret

NEG = -(10**9) // 2


def needleman_wunsch_cpu(query: bytes, ref: bytes,
                         match: int = 1, mismatch: int = -1,
                         gap: int = -1) -> int:
    """Scalar host reference implementation (≡ examples/nw_gpu/kernels.mojo:92-129)."""
    q = np.frombuffer(bytes(query), dtype=np.uint8)
    r = np.frombuffer(bytes(ref), dtype=np.uint8)
    m, n = len(q), len(r)
    g = -gap  # positive gap penalty
    prev = (np.arange(n + 1, dtype=np.int32) * gap).astype(np.int32)
    ar = np.arange(n, dtype=np.int32)
    for i in range(1, m + 1):
        cur = np.empty(n + 1, dtype=np.int32)
        cur[0] = i * gap
        sub = np.where(r == q[i - 1], match, mismatch).astype(np.int32)
        best = np.maximum(prev[:-1] + sub, prev[1:] + gap)
        # left-gap dependency cur[j+1] = max(best[j], cur[j] + gap) resolved in
        # closed form: cur[j+1] = max(runmax(best[k] + g*k)[j], cur[0]+gap) - g*j
        b = best + g * ar
        run = np.maximum(np.maximum.accumulate(b), cur[0] + gap)
        cur[1:] = run - g * ar
        prev = cur
    return int(prev[n])


def _diag_ref_table(ref: jnp.ndarray, Lq: int) -> jnp.ndarray:
    """RD[d, i] = ref[d-1-i] (0xFF where out of range), for d in 1..Lq+Lr.
    Precomputing the per-diagonal reference characters turns the in-loop
    gather into a contiguous row read."""
    Lr = ref.shape[0]
    D = Lq + Lr
    d_idx = jnp.arange(1, D + 1, dtype=jnp.int32)[:, None]
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    j = d_idx - 1 - i_idx
    valid = (j >= 0) & (j < Lr)
    return jnp.where(valid, ref[jnp.clip(j, 0, Lr - 1)], jnp.uint8(0xFF))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def nw_scores_xla(seq, lengths, ref, match: int = 1, mismatch: int = -1,
                  gap: int = -1):
    """Batched NW scores via lax.scan over anti-diagonals.

    seq: u8[B, Lq] padded reads; lengths: i32[B]; ref: u8[Lr].
    Returns i32[B] global alignment scores (rows with length 0 score -Lr*|gap|
    ... i.e. pure-gap alignment, matching dp[0][Lr])."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)  # q[i-1] at index i
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)
    target_d = lengths + Lr

    def step(carry, xs):
        prev1, prev2, score = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        p2s = jnp.roll(prev2, 1, axis=1)
        p1s = jnp.roll(prev1, 1, axis=1)
        new = jnp.maximum(jnp.maximum(p2s + sub, p1s + gap), prev1 + gap)
        new = jnp.where(i_idx == 0, d * gap, new)
        new = jnp.where(i_idx == d, d * gap, new)
        got = jnp.sum(jnp.where(i_idx == lengths[:, None], new, 0), axis=1)
        score = jnp.where(d == target_d, got, score)
        return (new, prev1, score), None

    init = (
        jnp.zeros((B, Lq + 1), jnp.int32),  # diag 0: only cell (0,0)=0 used
        jnp.zeros((B, Lq + 1), jnp.int32),
        jnp.full((B,), NEG, dtype=jnp.int32),
    )
    (_, _, score), _ = jax.lax.scan(step, init, (d_vals, RD))
    return score


def _nw_kernel(lr_ref, qshift_ref, len_ref, rd_ref, out_ref, prev1, prev2):
    Lr = lr_ref[0]
    TB, W = prev1.shape  # W = Lq+1 rounded up to lane
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    lens = len_ref[...]  # [TB, 1]
    target_d = lens + Lr
    qshift = qshift_ref[...]  # i32; q[i-1] at lane i

    prev1[...] = jnp.zeros((TB, W), jnp.int32)
    prev2[...] = jnp.zeros((TB, W), jnp.int32)
    out_ref[...] = jnp.full(out_ref.shape, NEG, jnp.int32)
    D = rd_ref.shape[0]

    def body(d, _):
        # i32 row read (u8 dynamic-slice + compare both avoided on v5e)
        rchars = rd_ref[pl.ds(d - 1, 1), :]  # [1, W] i32
        sub = jnp.where(qshift == rchars, 1, -1)
        p1 = prev1[...]
        p2s = pltpu.roll(prev2[...], 1, 1)
        p1s = pltpu.roll(p1, 1, 1)
        new = jnp.maximum(jnp.maximum(p2s + sub, p1s - 1), p1 - 1)
        new = jnp.where(i_idx == 0, -d, new)
        new = jnp.where(i_idx == d, -d, new)
        got = jnp.sum(jnp.where(i_idx == lens, new, 0), axis=1, keepdims=True)
        out_ref[...] = jnp.where(target_d == d, got, out_ref[...])
        prev2[...] = p1
        prev1[...] = new
        return 0

    jax.lax.fori_loop(1, D + 1, body, 0)


def nw_scores_pallas(seq, lengths, ref, block_records: int = 256):
    """Pallas wavefront NW (match/mismatch/gap = +1/-1/-1, as the reference
    GPU kernel). DP diagonals live in VMEM scratch; grid tiles the batch."""
    B, Lq = seq.shape
    Lr = int(ref.shape[0])
    W = round_up(Lq + 1, 128)
    n_pad = round_up(B, block_records)
    tb = min(block_records, n_pad)
    RD = _diag_ref_table(jnp.asarray(ref), Lq)  # [D, Lq+1]
    RD = jnp.pad(RD, ((0, 0), (0, W - (Lq + 1))),
                 constant_values=0xFF).astype(jnp.int32)
    seq_p = jnp.pad(jnp.asarray(seq), ((0, n_pad - B), (0, 0)))
    # qshift[b, i] = q[b, i-1]; lanes 0 and > Lq get a sentinel that never
    # matches the 0xFF out-of-range reference sentinel. i32 throughout (v5e
    # Mosaic has no 8-bit vector compares).
    qshift = jnp.pad(
        jnp.concatenate(
            [jnp.full((n_pad, 1), 0xFE, jnp.uint8), seq_p], axis=1),
        ((0, 0), (0, W - (Lq + 1))), constant_values=0xFE).astype(jnp.int32)
    len_p = jnp.pad(jnp.asarray(lengths, dtype=jnp.int32),
                    (0, n_pad - B)).reshape(n_pad, 1)
    lr_param = jnp.array([Lr], dtype=jnp.int32)

    out = pl.pallas_call(
        _nw_kernel,
        grid=(n_pad // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RD.shape[0], W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tb, W), jnp.int32),
            pltpu.VMEM((tb, W), jnp.int32),
        ],
        interpret=use_interpret(),
    )(lr_param, qshift, len_p, RD)
    return out[:B, 0]


def _on_tpu() -> bool:
    """True when the default JAX backend is TPU hardware (including
    tunnel-attached platforms whose device_kind reports a TPU)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return ("tpu" in dev.platform.lower()
            or "tpu" in getattr(dev, "device_kind", "").lower())


def nw_scores(seq, lengths, ref, prefer_pallas=None):
    """Dispatching wrapper. On TPU backends the Pallas kernel (DP diagonals
    resident in VMEM) is the default: slope-timed it is 1.7-3.3x faster
    (6.2M vs 1.9-3.7M alignments/s at 40bp, 16-64K batches) and compiles
    ~10x faster at large batch sizes (1s vs 11s at 64K). Everywhere else
    (CPU tests, GPU) the lax.scan formulation runs — it works on every
    backend and composes under shard_map. Pass prefer_pallas explicitly to
    override either way."""
    if prefer_pallas is None:
        prefer_pallas = _on_tpu()
    fn = nw_scores_pallas if prefer_pallas else nw_scores_xla
    return fn(jnp.asarray(seq), jnp.asarray(lengths), jnp.asarray(ref))


def smith_waterman_cpu(query: bytes, ref: bytes, match: int = 1,
                       mismatch: int = -1, gap: int = -1) -> int:
    """Scalar host twin for local (Smith-Waterman) alignment — the
    validation reference for sw_scores_xla, mirroring needleman_wunsch_cpu's
    role for the NW kernel."""
    Lq, Lr = len(query), len(ref)
    prev = [0] * (Lr + 1)
    best = 0
    for i in range(1, Lq + 1):
        cur = [0] * (Lr + 1)
        for j in range(1, Lr + 1):
            s = match if query[i - 1] == ref[j - 1] else mismatch
            cur[j] = max(0, prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap)
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def sw_scores_xla(seq, lengths, ref, match: int = 1, mismatch: int = -1,
                  gap: int = -1):
    """Batched Smith-Waterman (local alignment) scores — beyond the
    reference (which ships global NW only), reusing the same anti-diagonal
    wavefront: cells clamp at 0 and the score is the running max over valid
    cells (1 <= i <= length, 1 <= j <= Lr).

    seq: u8[B, Lq] padded reads; lengths: i32[B]; ref: u8[Lr].
    Returns i32[B] local alignment scores (0 for empty reads)."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)  # q[i-1] at index i
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def step(carry, xs):
        prev1, prev2, best = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        p2s = jnp.roll(prev2, 1, axis=1)
        p1s = jnp.roll(prev1, 1, axis=1)
        new = jnp.maximum(jnp.maximum(p2s + sub, p1s + gap), prev1 + gap)
        new = jnp.maximum(new, 0)                 # local: clamp at zero
        new = jnp.where(i_idx == 0, 0, new)       # boundary row
        new = jnp.where(i_idx == d, 0, new)       # boundary column
        valid = ((i_idx >= 1) & (i_idx <= lengths[:, None])
                 & (i_idx <= d - 1) & (i_idx >= d - Lr))
        best = jnp.maximum(best,
                           jnp.max(jnp.where(valid, new, 0), axis=1))
        return (new, prev1, best), None

    init = (
        jnp.zeros((B, Lq + 1), jnp.int32),
        jnp.zeros((B, Lq + 1), jnp.int32),
        jnp.zeros((B,), dtype=jnp.int32),
    )
    (_, _, best), _ = jax.lax.scan(step, init, (d_vals, RD))
    return best


# --------------------------------------------------------------------------
# Affine gaps (Gotoh) — beyond the reference (its GPU example is linear-gap
# only). A length-k gap costs gap_open + (k-1)*gap_extend (penalties are
# negative, like match/mismatch/gap above). The three-state recurrence fits
# the same anti-diagonal wavefront with NO intra-diagonal dependency:
#   M[i,j]  = max(M,Ix,Iy)[i-1,j-1] + sub(i,j)          (diagonal d-2)
#   Ix[i,j] = max(M[i-1,j]+go, Ix[i-1,j]+ge)            (diagonal d-1)
#   Iy[i,j] = max(M[i,j-1]+go, Iy[i,j-1]+ge)            (diagonal d-1)
# so each step stays a fully vectorized [B, Lq+1] VPU update.

def needleman_wunsch_affine_cpu(query: bytes, ref: bytes, match: int = 1,
                                mismatch: int = -1, gap_open: int = -3,
                                gap_extend: int = -1) -> int:
    """Scalar host twin for global affine-gap (Gotoh) alignment."""
    q = bytes(query)
    r = bytes(ref)
    m, n = len(q), len(r)
    M = np.full((m + 1, n + 1), NEG, np.int64)
    Ix = np.full((m + 1, n + 1), NEG, np.int64)
    Iy = np.full((m + 1, n + 1), NEG, np.int64)
    M[0, 0] = 0
    for i in range(1, m + 1):
        Ix[i, 0] = gap_open + (i - 1) * gap_extend
    for j in range(1, n + 1):
        Iy[0, j] = gap_open + (j - 1) * gap_extend
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = match if q[i - 1] == r[j - 1] else mismatch
            M[i, j] = max(M[i - 1, j - 1], Ix[i - 1, j - 1],
                          Iy[i - 1, j - 1]) + sub
            Ix[i, j] = max(M[i - 1, j] + gap_open,
                           Ix[i - 1, j] + gap_extend)
            Iy[i, j] = max(M[i, j - 1] + gap_open,
                           Iy[i, j - 1] + gap_extend)
    return int(max(M[m, n], Ix[m, n], Iy[m, n]))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def nw_affine_scores_xla(seq, lengths, ref, match: int = 1,
                         mismatch: int = -1, gap_open: int = -3,
                         gap_extend: int = -1):
    """Batched global affine-gap (Gotoh) scores via the anti-diagonal
    wavefront. seq: u8[B, Lq]; lengths: i32[B]; ref: u8[Lr]. i32[B] out."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    go, ge = gap_open, gap_extend
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)
    target_d = lengths + Lr

    def step(carry, xs):
        m1, x1, y1, m2, x2, y2, score = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        best2 = jnp.maximum(jnp.maximum(m2, x2), y2)
        Mn = jnp.roll(best2, 1, axis=1) + sub
        Xn = jnp.maximum(jnp.roll(m1, 1, axis=1) + go,
                         jnp.roll(x1, 1, axis=1) + ge)
        Yn = jnp.maximum(m1 + go, y1 + ge)
        edge = go + (d - 1) * ge
        on0 = i_idx == 0       # j = d: top boundary row
        ond = i_idx == d       # j = 0: left boundary column
        Mn = jnp.where(on0 | ond, NEG, Mn)
        Xn = jnp.where(on0, NEG, jnp.where(ond, edge, Xn))
        Yn = jnp.where(ond, NEG, jnp.where(on0, edge, Yn))
        cell = jnp.maximum(jnp.maximum(Mn, Xn), Yn)
        got = jnp.sum(jnp.where(i_idx == lengths[:, None], cell, 0), axis=1)
        score = jnp.where(d == target_d, got, score)
        return (Mn, Xn, Yn, m1, x1, y1, score), None

    neg = jnp.full((B, Lq + 1), NEG, jnp.int32)
    m_init = jnp.where(i_idx == 0, 0, NEG) + jnp.zeros((B, 1), jnp.int32)
    init = (m_init, neg, neg, neg, neg, neg,
            jnp.full((B,), NEG, dtype=jnp.int32))
    (_, _, _, _, _, _, score), _ = jax.lax.scan(step, init, (d_vals, RD))
    return score


def smith_waterman_affine_cpu(query: bytes, ref: bytes, match: int = 1,
                              mismatch: int = -1, gap_open: int = -3,
                              gap_extend: int = -1) -> int:
    """Scalar host twin for local affine-gap (SW-Gotoh) alignment."""
    q = bytes(query)
    r = bytes(ref)
    m, n = len(q), len(r)
    H = np.zeros((m + 1, n + 1), np.int64)
    E = np.full((m + 1, n + 1), NEG, np.int64)  # gap in query (consumes ref)
    F = np.full((m + 1, n + 1), NEG, np.int64)  # gap in ref (consumes query)
    best = 0
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = match if q[i - 1] == r[j - 1] else mismatch
            E[i, j] = max(H[i, j - 1] + gap_open, E[i, j - 1] + gap_extend)
            F[i, j] = max(H[i - 1, j] + gap_open, F[i - 1, j] + gap_extend)
            H[i, j] = max(0, H[i - 1, j - 1] + sub, E[i, j], F[i, j])
            if H[i, j] > best:
                best = int(H[i, j])
    return best


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def sw_affine_scores_xla(seq, lengths, ref, match: int = 1,
                         mismatch: int = -1, gap_open: int = -3,
                         gap_extend: int = -1):
    """Batched local affine-gap (SW-Gotoh) scores on the wavefront.
    seq: u8[B, Lq]; lengths: i32[B]; ref: u8[Lr]. i32[B] out (0 floor)."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    go, ge = gap_open, gap_extend
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def step(carry, xs):
        h1, e1, f1, h2, best = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        En = jnp.maximum(h1 + go, e1 + ge)
        Fn = jnp.maximum(jnp.roll(h1, 1, axis=1) + go,
                         jnp.roll(f1, 1, axis=1) + ge)
        Hn = jnp.maximum(jnp.maximum(jnp.roll(h2, 1, axis=1) + sub, En),
                         jnp.maximum(Fn, 0))
        on_edge = (i_idx == 0) | (i_idx == d)
        Hn = jnp.where(on_edge, 0, Hn)
        En = jnp.where(on_edge, NEG, En)
        Fn = jnp.where(on_edge, NEG, Fn)
        valid = ((i_idx >= 1) & (i_idx <= lengths[:, None])
                 & (i_idx <= d - 1) & (i_idx >= d - Lr))
        best = jnp.maximum(best,
                           jnp.max(jnp.where(valid, Hn, 0), axis=1))
        return (Hn, En, Fn, h1, best), None

    zeros = jnp.zeros((B, Lq + 1), jnp.int32)
    neg = jnp.full((B, Lq + 1), NEG, jnp.int32)
    init = (zeros, neg, neg, zeros, jnp.zeros((B,), dtype=jnp.int32))
    (_, _, _, _, best), _ = jax.lax.scan(step, init, (d_vals, RD))
    return best


# --------------------------------------------------------------------------
# Semi-global ("glocal") alignment — beyond the reference: the query aligns
# end-to-end but leading/trailing REFERENCE bases are free, the standard
# mode for scoring a read against a longer reference window. Same wavefront;
# only the i == 0 boundary (free ref skip) and the score extraction (best
# cell in the query's last row across diagonals) change.

def semiglobal_cpu(query: bytes, ref: bytes, match: int = 1,
                   mismatch: int = -1, gap: int = -1) -> int:
    """Scalar host twin: free leading/trailing ref gaps, full query."""
    q = bytes(query)
    r = bytes(ref)
    m, n = len(q), len(r)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [i * gap] + [0] * n
        for j in range(1, n + 1):
            sub = match if q[i - 1] == r[j - 1] else mismatch
            cur[j] = max(prev[j - 1] + sub, prev[j] + gap, cur[j - 1] + gap)
        prev = cur
    return int(max(prev))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def nw_semiglobal_scores_xla(seq, lengths, ref, match: int = 1,
                             mismatch: int = -1, gap: int = -1):
    """Batched semi-global scores. seq u8[B, Lq]; lengths i32[B];
    ref u8[Lr] -> i32[B]."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def step(carry, xs):
        prev1, prev2, best = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        p2s = jnp.roll(prev2, 1, axis=1)
        p1s = jnp.roll(prev1, 1, axis=1)
        new = jnp.maximum(jnp.maximum(p2s + sub, p1s + gap), prev1 + gap)
        new = jnp.where(i_idx == 0, 0, new)        # free leading ref skip
        new = jnp.where(i_idx == d, d * gap, new)  # query-leading gap paid
        at_len = jnp.sum(jnp.where(i_idx == lengths[:, None], new, 0),
                         axis=1)
        take = (d >= lengths) & (d <= lengths + Lr)
        best = jnp.where(take, jnp.maximum(best, at_len), best)
        return (new, prev1, best), None

    init = (
        jnp.zeros((B, Lq + 1), jnp.int32),
        jnp.zeros((B, Lq + 1), jnp.int32),
        jnp.full((B,), NEG, dtype=jnp.int32),
    )
    (_, _, best), _ = jax.lax.scan(step, init, (d_vals, RD))
    # empty query, free ref: score 0 (d never reaches 0 in the scan)
    return jnp.where(lengths == 0, 0, best)


def semiglobal_affine_cpu(query: bytes, ref: bytes, match: int = 1,
                          mismatch: int = -1, gap_open: int = -3,
                          gap_extend: int = -1) -> int:
    """Scalar host twin: semi-global with affine (Gotoh) gaps."""
    q = bytes(query)
    r = bytes(ref)
    m, n = len(q), len(r)
    M = np.full((m + 1, n + 1), NEG, np.int64)
    Ix = np.full((m + 1, n + 1), NEG, np.int64)
    Iy = np.full((m + 1, n + 1), NEG, np.int64)
    M[0, :] = 0  # free leading ref skip (fresh start at any ref offset)
    for i in range(1, m + 1):
        Ix[i, 0] = gap_open + (i - 1) * gap_extend
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = match if q[i - 1] == r[j - 1] else mismatch
            M[i, j] = max(M[i - 1, j - 1], Ix[i - 1, j - 1],
                          Iy[i - 1, j - 1]) + sub
            Ix[i, j] = max(M[i - 1, j] + gap_open,
                           Ix[i - 1, j] + gap_extend)
            Iy[i, j] = max(M[i, j - 1] + gap_open,
                           Iy[i, j - 1] + gap_extend)
    return int(max(M[m].max(), Ix[m].max(), Iy[m].max()))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def nw_semiglobal_affine_scores_xla(seq, lengths, ref, match: int = 1,
                                    mismatch: int = -1, gap_open: int = -3,
                                    gap_extend: int = -1):
    """Batched semi-global affine-gap scores on the wavefront."""
    B, Lq = seq.shape
    Lr = ref.shape[0]
    D = Lq + Lr
    go, ge = gap_open, gap_extend
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    seq_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.uint8), seq], axis=1)
    RD = _diag_ref_table(ref, Lq)
    d_vals = jnp.arange(1, D + 1, dtype=jnp.int32)
    lengths = lengths.astype(jnp.int32)

    def step(carry, xs):
        m1, x1, y1, m2, x2, y2, best = carry
        d, rchars = xs
        sub = jnp.where(seq_shift == rchars[None, :], match, mismatch)
        best2 = jnp.maximum(jnp.maximum(m2, x2), y2)
        Mn = jnp.roll(best2, 1, axis=1) + sub
        Xn = jnp.maximum(jnp.roll(m1, 1, axis=1) + go,
                         jnp.roll(x1, 1, axis=1) + ge)
        Yn = jnp.maximum(m1 + go, y1 + ge)
        edge = go + (d - 1) * ge
        on0 = i_idx == 0
        ond = i_idx == d
        Mn = jnp.where(on0, 0, jnp.where(ond, NEG, Mn))
        Xn = jnp.where(on0, NEG, jnp.where(ond, edge, Xn))
        Yn = jnp.where(on0 | ond, NEG, Yn)
        cell = jnp.maximum(jnp.maximum(Mn, Xn), Yn)
        at_len = jnp.sum(jnp.where(i_idx == lengths[:, None], cell, 0),
                         axis=1)
        take = (d >= lengths) & (d <= lengths + Lr)
        best = jnp.where(take, jnp.maximum(best, at_len), best)
        return (Mn, Xn, Yn, m1, x1, y1, best), None

    neg = jnp.full((B, Lq + 1), NEG, jnp.int32)
    m_init = jnp.where(i_idx == 0, 0, NEG) + jnp.zeros((B, 1), jnp.int32)
    init = (m_init, neg, neg, neg, neg, neg,
            jnp.full((B,), NEG, dtype=jnp.int32))
    (_, _, _, _, _, _, best), _ = jax.lax.scan(step, init, (d_vals, RD))
    return jnp.where(lengths == 0, 0, best)
