"""Paired-end overlap merging (PEAR-style), on device — beyond the
reference's scope (it has no paired-end layer at all; this builds on
fastq/paired.py).

For each (R1, R2) pair: reverse-complement R2, score every candidate
overlap length o (suffix of R1 vs prefix of rc(R2)) as
`matches - mismatch_penalty * mismatches`, and accept the best o with
o >= min_overlap and mismatch fraction <= max_mismatch_frac. Merged reads
take the higher-quality base (and its quality) at overlap mismatches —
PEAR's consensus rule.

TPU shape: R1 is right-aligned once (one take_along_axis gather), then a
lax.scan over overlap lengths compares lane-rolled rc(R2) against it —
dense VPU work, no data-dependent control flow. Consensus assembly is a
second pair of row gathers. O(n L) memory, O(n L^2) compute: an analysis
op, not an ingest-path op.

Host twin: `merge_pairs_host` (pure Python) — the validation reference.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_COMP = np.full(256, ord("N"), dtype=np.uint8)
for a, b in zip(b"ACGTacgtN", b"TGCATGCAN"):
    _COMP[a] = b


class MergeResult(NamedTuple):
    overlap: jnp.ndarray      # i32[n] accepted overlap length (0 = unmerged)
    merged_len: jnp.ndarray   # i32[n] len1 + len2 - overlap (0 = unmerged)
    score: jnp.ndarray        # i32[n] best score
    mismatches: jnp.ndarray   # i32[n] mismatches at the accepted overlap
    seq: jnp.ndarray          # u8[n, L1+L2] merged bases (zero-padded)
    qual: jnp.ndarray         # u8[n, L1+L2] merged qualities


def _revcomp_rows(seq, qual, lengths):
    """Per-row reverse(-complement) of left-aligned padded reads; output is
    left-aligned again."""
    n, L = seq.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    src = jnp.clip(lengths[:, None] - 1 - j, 0, L - 1)
    rc = jnp.take_along_axis(seq, src, axis=1)
    rq = jnp.take_along_axis(qual, src, axis=1)
    comp = jnp.asarray(_COMP)
    rc = comp[rc.astype(jnp.int32)]
    valid = j < lengths[:, None]
    return (jnp.where(valid, rc, 0).astype(jnp.uint8),
            jnp.where(valid, rq, 0).astype(jnp.uint8))


@functools.partial(jax.jit,
                   static_argnames=("min_overlap", "mismatch_penalty"))
def _score_overlaps(r1_right, rc2, len1, len2, min_overlap: int,
                    mismatch_penalty: int):
    """Best overlap via a scan over o: compare the right-aligned R1 against
    rc2 rolled so its first o bases meet R1's last o bases."""
    n, L = r1_right.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    def step(carry, o):
        best_s, best_o, best_m = carry
        rolled = jnp.roll(rc2, L - o, axis=1)
        cmp_zone = j >= (L - o)
        eq = (r1_right == rolled) & cmp_zone
        ne = (r1_right != rolled) & cmp_zone
        m = jnp.sum(eq, axis=1, dtype=jnp.int32)
        x = jnp.sum(ne, axis=1, dtype=jnp.int32)
        s = m - mismatch_penalty * x
        feasible = (o >= min_overlap) & (o <= len1) & (o <= len2)
        s = jnp.where(feasible, s, jnp.int32(-(1 << 30)))
        take = s > best_s
        return (jnp.where(take, s, best_s),
                jnp.where(take, o, best_o),
                jnp.where(take, x, best_m)), None

    init = (jnp.full((n,), -(1 << 30), jnp.int32),
            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))
    (s, o, m), _ = jax.lax.scan(step, init,
                                jnp.arange(1, L + 1, dtype=jnp.int32))
    return s, o, m


@functools.partial(
    jax.jit,
    static_argnames=("min_overlap", "mismatch_penalty",
                     "max_mismatch_frac"))
def merge_pairs(seq1, qual1, len1, seq2, qual2, len2,
                min_overlap: int = 10, mismatch_penalty: int = 1,
                max_mismatch_frac: float = 0.25) -> MergeResult:
    """Merge padded read pairs. seq2/qual2 are as sequenced (this function
    reverse-complements them). All arrays [n, L]; lengths i32[n]."""
    n, L = seq1.shape
    len1 = len1.astype(jnp.int32)
    len2 = len2.astype(jnp.int32)
    rc2, rq2 = _revcomp_rows(jnp.asarray(seq2), jnp.asarray(qual2), len2)

    # right-align R1 so every read's suffix ends at column L
    j = jax.lax.broadcasted_iota(jnp.int32, (n, L), 1)
    src = j - (L - len1[:, None])
    srcc = jnp.clip(src, 0, L - 1)
    r1_right = jnp.where(src >= 0,
                         jnp.take_along_axis(jnp.asarray(seq1), srcc, axis=1),
                         0).astype(jnp.uint8)
    q1_right = jnp.where(src >= 0,
                         jnp.take_along_axis(jnp.asarray(qual1), srcc,
                                             axis=1),
                         0).astype(jnp.uint8)

    score, o, mism = _score_overlaps(r1_right, rc2, len1, len2, min_overlap,
                                     mismatch_penalty)
    frac_ok = mism.astype(jnp.float32) <= (max_mismatch_frac
                                           * o.astype(jnp.float32))
    ok = (o > 0) & (score > 0) & frac_ok
    o = jnp.where(ok, o, 0)
    mism = jnp.where(ok, mism, 0)
    merged_len = jnp.where(ok, len1 + len2 - o, 0)

    # consensus assembly over [n, 2L]: position k takes R1 for k < len1-o,
    # the higher-quality base inside the overlap, rc2 afterwards
    M = 2 * L
    k = jax.lax.broadcasted_iota(jnp.int32, (n, M), 1)
    pre = len1[:, None] - o[:, None]
    idx1 = jnp.clip(k, 0, L - 1)
    s1 = jnp.take_along_axis(jnp.asarray(seq1), idx1, axis=1)
    q1 = jnp.take_along_axis(jnp.asarray(qual1), idx1, axis=1)
    idx2 = jnp.clip(k - pre, 0, L - 1)
    s2 = jnp.take_along_axis(rc2, idx2, axis=1)
    q2 = jnp.take_along_axis(rq2, idx2, axis=1)
    in1 = k < len1[:, None]
    in_overlap = (k >= pre) & in1
    use2 = in_overlap & (q2 > q1)
    seq_m = jnp.where(in1, jnp.where(use2, s2, s1), s2)
    qual_m = jnp.where(in1, jnp.where(use2, q2, q1),
                       q2)
    valid = (k < merged_len[:, None]) & ok[:, None]
    return MergeResult(o, merged_len, jnp.where(ok, score, 0), mism,
                       jnp.where(valid, seq_m, 0).astype(jnp.uint8),
                       jnp.where(valid, qual_m, 0).astype(jnp.uint8))


def _revcomp_b(s: bytes) -> bytes:
    return bytes(_COMP[b] for b in reversed(s))


def merge_pairs_host(r1: List[Tuple[bytes, bytes]],
                     r2: List[Tuple[bytes, bytes]],
                     min_overlap: int = 10, mismatch_penalty: int = 1,
                     max_mismatch_frac: float = 0.25):
    """Scalar host twin: list of (seq, qual) pairs -> list of
    (overlap, merged_seq, merged_qual) with overlap 0 = unmerged."""
    out = []
    for (s1, q1), (s2, q2) in zip(r1, r2):
        rc = _revcomp_b(s2)
        rq = bytes(reversed(q2))
        best = (-(1 << 30), 0, 0)
        for o in range(1, min(len(s1), len(rc)) + 1):
            if o < min_overlap:
                continue
            a = s1[len(s1) - o:]
            b = rc[:o]
            m = sum(1 for x, y in zip(a, b) if x == y)
            x = o - m
            s = m - mismatch_penalty * x
            if s > best[0]:
                best = (s, o, x)
        s, o, x = best
        if o == 0 or s <= 0 or x > max_mismatch_frac * o:
            out.append((0, b"", b""))
            continue
        pre = len(s1) - o
        seq = bytearray(s1[:pre])
        qual = bytearray(q1[:pre])
        for i in range(o):
            if rq[i] > q1[pre + i]:
                seq.append(rc[i])
                qual.append(rq[i])
            else:
                seq.append(s1[pre + i])
                qual.append(q1[pre + i])
        seq += rc[o:]
        qual += rq[o:]
        out.append((o, bytes(seq), bytes(qual)))
    return out
