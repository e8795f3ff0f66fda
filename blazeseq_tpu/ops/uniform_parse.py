"""Device-side FASTQ parsing for layout-uniform chunks (pipeline B core).

TPUs cannot gather ragged byte records at speed (docs/roadmap.md: element
gathers and vmapped dynamic slices run ~0.1 GB/s), so generic device-side
parsing is off the table. But the same observation that powers the host
scanner's tier-1 group path (native/scan.cpp) applies on device: real FASTQ
is overwhelmingly *layout-uniform* — fixed read length and fixed header
width — so the byte stream is a [n_records, record_size] matrix in disguise.

Under that hypothesis, parsing degenerates into dense tensor algebra that
the TPU executes at HBM bandwidth:

  * reshape raw bytes to [nrec, rs],
  * PROVE the hypothesis: the newline mask must equal the layout's column
    template exactly (this simultaneously shows all four newlines per record
    are where predicted AND no stray newline exists, so the parse is exact,
    not a guess — same argument as the host speculative scanner),
  * validate '@'/'+' marker columns, ASCII, and the quality range with
    column slices and dense reductions,
  * materialize the padded SoA batch with two minor-dim slices + pad.

Chunks that fail the proof (varying header widths, corrupt records) return
``template_ok=False`` and the caller re-parses on the host — byte-exact
semantics always, device speed in the common case.

Reference behavior spec: blazeseq/utils.mojo:472-551 (_scan_record),
blazeseq/fastq/record.mojo:77-148 (Validator), and the views-mode counting
runner (benchmark/fastq-parser/run_blazeseq.mojo:21-60).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEWLINE = 10
AT = 64
PLUS = 43


class UniformLayout(NamedTuple):
    """Relative newline offsets of one record (host-detected, device-proven).

    rs = record size in bytes; o1/o2/o3 = offsets of the 1st..3rd newline
    relative to the record start (the 4th is rs-1). Sequence bytes live in
    columns [o1+1, o2), quality bytes in [o3+1, rs-1).
    """

    rs: int
    o1: int
    o2: int
    o3: int

    @property
    def seq_len(self) -> int:
        return self.o2 - self.o1 - 1

    @property
    def qual_len(self) -> int:
        return self.rs - 1 - (self.o3 + 1)


def detect_uniform_layout(buf, start: int = 0) -> Optional[UniformLayout]:
    """Read the first record's newline layout from a bytes-like object.
    Returns None when no complete record exists at `start` or the candidate
    layout is structurally impossible (the device proof would reject it
    anyway; this just avoids a wasted dispatch)."""
    view = bytes(memoryview(buf)[start : start + 65536])
    p1 = view.find(b"\n")
    if p1 < 0:
        return None
    p2 = view.find(b"\n", p1 + 1)
    if p2 < 0:
        return None
    p3 = view.find(b"\n", p2 + 1)
    if p3 < 0:
        return None
    p4 = view.find(b"\n", p3 + 1)
    if p4 < 0:
        return None
    lay = UniformLayout(rs=p4 + 1, o1=p1, o2=p2, o3=p3)
    if not view.startswith(b"@") or view[p2 + 1 : p2 + 2] != b"+":
        return None
    if lay.seq_len != lay.qual_len or lay.seq_len == 0:
        return None
    return lay


class UniformParseResult(NamedTuple):
    seq: "jax.Array"          # u8[nrec, width] padded sequence rows
    qual: "jax.Array"         # u8[nrec, width] padded quality rows
    lengths: "jax.Array"      # i32[nrec] true read length (0 past n_valid)
    n_records: "jax.Array"    # i32[] complete records in the valid region
    bases: "jax.Array"        # i32[] sequence bytes (n_records * seq_len)
    template_ok: "jax.Array"  # bool[] newline/marker template proven
    bad_ascii: "jax.Array"    # bool[] high bit present (conservative, whole chunk)
    bad_quality: "jax.Array"  # bool[] quality byte out of schema range


@functools.partial(
    jax.jit,
    static_argnames=("rs", "o1", "o2", "o3", "width", "check_ascii",
                     "check_quality", "fused_checks"))
def uniform_parse(chunk, n_valid, q_lower, q_upper, *, rs: int, o1: int,
                  o2: int, o3: int, width: int, check_ascii: bool = True,
                  check_quality: bool = True,
                  fused_checks: bool = False) -> UniformParseResult:
    """Parse a (possibly zero-padded) uint8 chunk under a uniform layout.

    chunk: u8[n] with n a multiple of rs (caller pads with zeros; padded
    rows are excluded via n_valid). n_valid: i32 scalar, number of real
    bytes (must be a multiple of rs — callers slice chunks on record
    boundaries, which under a uniform layout are rs-multiples).

    fused_checks=True folds the template / ASCII / quality-range proofs
    into ONE elementwise pass + reduction (any violation reports as
    template_ok=False; bad_ascii/bad_quality stay False). Every violation
    class still rejects the chunk to the byte-exact host path — only the
    diagnostic split is coarser. The bulk pipeline uses this; keep the
    default for per-flag diagnostics.
    """
    n = chunk.shape[0]
    assert n % rs == 0, "chunk length must be padded to a multiple of rs"
    nrec = n // rs
    seq_len = o2 - o1 - 1
    r2 = chunk.reshape(nrec, rs)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (nrec, 1), 0)
    nrec_valid = (n_valid // rs).astype(jnp.int32)
    row_valid = row_idx < nrec_valid  # [nrec, 1]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, rs), 1)
    tmpl = (col == o1) | (col == o2) | (col == o3) | (col == rs - 1)
    nl = r2 == jnp.uint8(NEWLINE)
    marker_ok = ((r2[:, 0:1] == jnp.uint8(AT))
                 & (r2[:, o2 + 1 : o2 + 2] == jnp.uint8(PLUS)))
    qual_cols = r2[:, o3 + 1 : rs - 1]
    lo = q_lower.astype(jnp.uint8)
    hi = q_upper.astype(jnp.uint8)

    if fused_checks:
        bad = nl != tmpl
        if check_ascii:
            bad |= (r2 & jnp.uint8(0x80)) > 0
        if check_quality:
            in_qual = (col >= o3 + 1) & (col < rs - 1)
            bad |= in_qual & ((r2 < lo) | (r2 > hi))
        row_bad = jnp.any(bad, axis=1, keepdims=True) | ~marker_ok
        template_ok = ~jnp.any(row_bad & row_valid)
        bad_ascii = jnp.asarray(False)
        bad_quality = jnp.asarray(False)
    else:
        # --- the proof: newline mask == column template, exactly ----------
        row_ok = jnp.all(nl == tmpl, axis=1, keepdims=True)
        row_ok &= marker_ok
        template_ok = jnp.all(row_ok | ~row_valid)

        # --- validation (conservative whole-chunk prefilters, like the
        # host AVX path: a trip means "re-parse on host for exact context")
        if check_ascii:
            bad_ascii = jnp.any((r2 & jnp.uint8(0x80)).astype(bool)
                                & row_valid)
        else:
            bad_ascii = jnp.asarray(False)
        if check_quality:
            bad_quality = jnp.any(((qual_cols < lo) | (qual_cols > hi))
                                  & row_valid)
        else:
            bad_quality = jnp.asarray(False)

    # --- padded SoA materialization ---------------------------------------
    w = min(seq_len, width)
    seq = r2[:, o1 + 1 : o1 + 1 + w]
    qual = qual_cols[:, :w]
    if w < width:
        pad = [(0, 0), (0, width - w)]
        seq = jnp.pad(seq, pad)
        qual = jnp.pad(qual, pad)
    valid_col = row_valid.astype(jnp.uint8)
    seq = seq * valid_col
    qual = qual * valid_col
    lengths = jnp.where(row_valid[:, 0], jnp.int32(seq_len), 0)

    n_records = nrec_valid
    bases = n_records * jnp.int32(seq_len)
    return UniformParseResult(seq, qual, lengths, n_records, bases,
                              template_ok, bad_ascii, bad_quality)
