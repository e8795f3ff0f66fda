"""Sharded FASTQ analysis pipeline: validate + decode + QC + align, SPMD over
a device mesh.

This is the TPU-native equivalent of the reference's (absent) multi-node
story plus its GPU batch pipeline (examples/nw_gpu/execution.mojo:90-134):
padded read batches are sharded record-wise over the mesh 'dp' axis with
shard_map, each device runs the fused validate/decode/QC/NW step on its local
shard, and additive QC statistics are merged with `psum` over ICI. The
reference read is replicated (it is tiny).

`qc_align_step` is the framework's flagship jittable step — the function
`__graft_entry__.entry()` exposes and the multichip dryrun shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import nw as nw_ops
from ..ops import stats as stats_ops
from ..ops import validate as validate_ops
from .mesh import DP_AXIS


class QCAlignResult(NamedTuple):
    stats: stats_ops.QCStats  # psum-merged, replicated
    error_codes: jnp.ndarray  # i32[n]  per-record validation codes (sharded dim)
    phred: jnp.ndarray  # u8[n, L] decoded scores
    nw_scores: jnp.ndarray  # i32[n]  alignment scores vs the reference read


def _local_step(seq, qual, lengths, n_records, ref, q_lower, q_upper, offset,
                *, axis_name: Optional[str], check_ascii: bool,
                check_quality: bool, with_alignment: bool):
    codes, phred = validate_ops.validate_decode_xla(
        seq, qual, lengths, q_lower, q_upper, offset,
        check_ascii=check_ascii, check_quality=check_quality)
    # local record count for this shard: records are distributed evenly by
    # the sharded leading dim; n_records is the global count.
    if axis_name is not None:
        n_local = _local_record_count(seq.shape[0], n_records, axis_name)
    else:
        n_local = n_records
    st = stats_ops.qc_stats(seq, qual, lengths, offset, n_records=n_local,
                            error_codes=codes)
    if axis_name is not None:
        st = jax.lax.psum(st, axis_name)
    if with_alignment:
        # lengths may exceed the padded width for clamped long reads
        scores = nw_ops.nw_scores_xla(
            seq, jnp.minimum(lengths, seq.shape[1]), ref)
    else:
        scores = jnp.zeros(seq.shape[0], jnp.int32)
    return QCAlignResult(st, codes, phred, scores)


def _local_record_count(block: jnp.ndarray, n_records, axis_name):
    """Records owned by this shard when the leading dim is block-sharded:
    rows [idx*block, (idx+1)*block) intersected with [0, n_records)."""
    idx = jax.lax.axis_index(axis_name)
    lo = idx * block
    return jnp.clip(n_records - lo, 0, block).astype(jnp.int32)


def build_qc_align_step(mesh: Optional[Mesh] = None, *,
                        check_ascii: bool = True, check_quality: bool = True,
                        with_alignment: bool = True, axis_name: str = DP_AXIS):
    """Build the jitted (optionally mesh-sharded) analysis step.

    Returns fn(seq[n,L] u8, qual[n,L] u8, lengths[n] i32, n_records i32[],
               ref[Lr] u8, q_lower i32[], q_upper i32[], offset i32[])
    -> QCAlignResult. With a mesh, n must be divisible by mesh size; inputs
    are sharded P('dp') on the record dim, ref and scalars replicated."""
    kw = dict(check_ascii=check_ascii, check_quality=check_quality,
              with_alignment=with_alignment)
    if mesh is None:
        return jax.jit(
            functools.partial(_local_step, axis_name=None, **kw))

    fn = functools.partial(_local_step, axis_name=axis_name, **kw)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P(), P(),
                  P(), P()),
        out_specs=QCAlignResult(
            stats=jax.tree.map(lambda _: P(), stats_ops.zero_stats(1)),
            error_codes=P(axis_name),
            phred=P(axis_name),
            nw_scores=P(axis_name),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def run_qc_align(padded_batch, ref: bytes, schema, mesh: Optional[Mesh] = None,
                 **kw) -> QCAlignResult:
    """Convenience wrapper taking a PaddedFastqBatch + reference read."""
    import numpy as np

    step = build_qc_align_step(mesh, **kw)
    seq = jnp.asarray(np.asarray(padded_batch.seq))
    qual = jnp.asarray(np.asarray(padded_batch.qual))
    lengths = jnp.asarray(np.asarray(padded_batch.lengths), dtype=jnp.int32)
    refv = jnp.frombuffer(bytes(ref), dtype=jnp.uint8) if isinstance(
        ref, (bytes, bytearray)) else jnp.asarray(ref)
    return step(seq, qual, lengths, jnp.int32(padded_batch.n_records), refv,
                jnp.int32(schema.LOWER), jnp.int32(schema.UPPER),
                jnp.int32(schema.OFFSET))
