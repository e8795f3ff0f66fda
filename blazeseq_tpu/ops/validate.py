"""Fused on-device validation + Phred decode
(device analog of the reference Validator hot path,
blazeseq/fastq/record.mojo:77-172, and phred decode record.mojo:340-355).

Operates on the padded [n, L] batch layout. One fused pass produces:

* per-record error codes (0 = OK, 4 = ASCII_INVALID, 5 = QUALITY_OUT_OF_RANGE
  — same FastxErrorCode values as the host path)
* decoded Phred scores u8[n, L] (garbage beyond each record's length)

Two implementations with identical semantics:
  * `validate_decode_xla` — pure jnp; XLA fuses it into one VPU pass.
  * `validate_decode_pallas` — explicit Pallas kernel tiled over records,
    keeping the whole pass in VMEM; used on TPU for the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import length_mask, round_up, use_interpret

ASCII_INVALID = 4
QUALITY_OUT_OF_RANGE = 5


@functools.partial(jax.jit, static_argnames=("check_ascii", "check_quality"))
def validate_decode_xla(seq, qual, lengths, q_lower, q_upper, offset,
                        check_ascii: bool = True, check_quality: bool = True,
                        col_offset=0):
    """jnp reference implementation. Returns (codes i32[n], phred u8[n, L]).
    `col_offset`: this shard's starting column when L is sp-sharded."""
    mask = length_mask(lengths, seq.shape[1], col_offset)
    codes = jnp.zeros(seq.shape[0], dtype=jnp.int32)
    if check_quality:
        bad_q = jnp.any(
            mask & ((qual < q_lower.astype(jnp.uint8))
                    | (qual > q_upper.astype(jnp.uint8))), axis=1)
        codes = jnp.where(bad_q, QUALITY_OUT_OF_RANGE, codes)
    if check_ascii:
        bad_a = jnp.any(mask & (((seq | qual) & 0x80) != 0), axis=1)
        codes = jnp.where(bad_a, ASCII_INVALID, codes)
    # int32 arithmetic, cast back: the all-uint8 subtraction is miscompiled
    # by XLA (jax 0.9.0) when `qual` is a fused strided producer — see
    # stats._masked_phred for the full note
    phred = jnp.where(mask, qual.astype(jnp.int32) - offset.astype(jnp.int32),
                      0).astype(jnp.uint8)
    return codes, phred


def _validate_kernel(params_ref, seq_ref, qual_ref, len_ref, codes_ref,
                     phred_ref):
    q_lower = params_ref[0]
    q_upper = params_ref[1]
    offset = params_ref[2]
    check_ascii = params_ref[3]
    check_quality = params_ref[4]

    # v5e Mosaic rejects 8-bit vector compares; work in i32 on the VPU.
    seq = seq_ref[...].astype(jnp.int32)
    qual = qual_ref[...].astype(jnp.int32)
    n, width = seq.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    mask = pos < len_ref[...]  # len_ref is [n, 1] (2-D for Mosaic layouts)

    bad_q = jnp.any(mask & ((qual < q_lower) | (qual > q_upper)), axis=1,
                    keepdims=True)
    bad_a = jnp.any(mask & (((seq | qual) & 0x80) != 0), axis=1,
                    keepdims=True)
    codes = jnp.where(bad_q & (check_quality != 0), QUALITY_OUT_OF_RANGE, 0)
    codes = jnp.where(bad_a & (check_ascii != 0), ASCII_INVALID, codes)
    codes_ref[...] = codes.astype(jnp.int32)
    phred_ref[...] = jnp.where(mask, qual - offset, 0).astype(jnp.uint8)


def validate_decode_pallas(seq, qual, lengths, q_lower, q_upper, offset,
                           check_ascii: bool = True,
                           check_quality: bool = True,
                           block_records: int = 256):
    """Pallas fused validate+decode, tiled over the record dimension."""
    n, L = seq.shape
    tn = min(block_records, max(round_up(n, 32), 32))
    grid = (pl.cdiv(n, tn),)
    params = jnp.array(
        [int(q_lower), int(q_upper), int(offset),
         1 if check_ascii else 0, 1 if check_quality else 0],
        dtype=jnp.int32,
    )
    codes, phred = pl.pallas_call(
        _validate_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((round_up(n, tn), 1), jnp.int32),
            jax.ShapeDtypeStruct((round_up(n, tn), L), jnp.uint8),
        ),
        interpret=use_interpret(),
    )(params, _pad_rows(seq, tn), _pad_rows(qual, tn),
      _pad_rows(lengths, tn).reshape(-1, 1))
    return codes[:n, 0], phred[:n]


def _pad_rows(a, tn):
    n = a.shape[0]
    target = round_up(n, tn)
    if target == n:
        return a
    pad = [(0, target - n)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def validate_decode(seq, qual, lengths, schema, check_ascii=True,
                    check_quality=True, prefer_pallas=None):
    """Dispatching wrapper taking a QualitySchema."""
    args = (
        jnp.asarray(seq), jnp.asarray(qual),
        jnp.asarray(lengths, dtype=jnp.int32),
        jnp.int32(schema.LOWER), jnp.int32(schema.UPPER),
        jnp.int32(schema.OFFSET),
    )
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    fn = validate_decode_pallas if prefer_pallas else validate_decode_xla
    return fn(*args, check_ascii=check_ascii, check_quality=check_quality)
