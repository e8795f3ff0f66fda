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
                check_quality: bool, with_alignment: bool,
                sp_axis: Optional[str] = None, qual_hist_2d: bool = False):
    # under 'sp' sharding this device holds columns
    # [sp_idx*L_local, (sp_idx+1)*L_local) of every record in its dp shard
    if sp_axis is not None:
        col0 = jax.lax.axis_index(sp_axis) * seq.shape[1]
        sp_first = jax.lax.axis_index(sp_axis) == 0
    else:
        col0 = jnp.int32(0)
        sp_first = None
    codes, phred = validate_ops.validate_decode_xla(
        seq, qual, lengths, q_lower, q_upper, offset,
        check_ascii=check_ascii, check_quality=check_quality,
        col_offset=col0)
    if sp_axis is not None:
        # a record's error can live in any position slice; max picks any
        # nonzero code so every sp shard reports the same per-record verdict
        codes = jax.lax.pmax(codes, sp_axis)
    # local record count for this shard: records are distributed evenly by
    # the sharded leading dim; n_records is the global count.
    if axis_name is not None:
        n_local = _local_record_count(seq.shape[0], n_records, axis_name)
    else:
        n_local = n_records
    st = stats_ops.qc_stats(seq, qual, lengths, offset,
                            n_records=n_local, error_codes=codes,
                            col_offset=col0, row_stats=sp_axis is None,
                            qual_hist_2d=qual_hist_2d)
    if sp_axis is not None:
        # per-read distribution panels need full rows: psum the per-read
        # partial reductions across position shards, then bin. Every sp
        # shard computes the identical result (lengths are sp-replicated),
        # so these leaves are already sp-replicated — no gating or sp-psum.
        gcr, qsr, cntr = stats_ops.row_partials(
            seq, qual, lengths, offset, n_records=n_local, col_offset=col0)
        gcr = jax.lax.psum(gcr, sp_axis)
        qsr = jax.lax.psum(qsr, sp_axis)
        cntr = jax.lax.psum(cntr, sp_axis)
        len_h, gc_h, mq_h = stats_ops.row_histograms(
            gcr, qsr, cntr, lengths, n_local)
        st = st._replace(length_hist=len_h, gc_hist=gc_h,
                         mean_qual_hist=mq_h)
    if sp_axis is not None:
        # per-record scalars (reads, TRUE-length bases, error counts) would
        # be duplicated by every sp shard — keep them on sp rank 0 only;
        # the position-partitioned leaves stay as computed per shard
        st = st._replace(
            reads=jnp.where(sp_first, st.reads, 0),
            bases=jnp.where(sp_first, st.bases, 0),
            error_reads=jnp.where(sp_first, st.error_reads, 0))
    if axis_name is not None:
        st = jax.lax.psum(st, axis_name)
    if sp_axis is not None:
        # scalar / global-histogram leaves merge across sp; the per-position
        # leaves stay position-sharded (their out_specs carry 'sp')
        st = st._replace(
            reads=jax.lax.psum(st.reads, sp_axis),
            bases=jax.lax.psum(st.bases, sp_axis),
            base_counts=jax.lax.psum(st.base_counts, sp_axis),
            qual_hist=jax.lax.psum(st.qual_hist, sp_axis),
            gc_count=jax.lax.psum(st.gc_count, sp_axis),
            error_reads=jax.lax.psum(st.error_reads, sp_axis),
        )
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
                        with_alignment: bool = True, axis_name: str = DP_AXIS,
                        qual_hist_2d: bool = False):
    """Build the jitted (optionally mesh-sharded) analysis step.

    Returns fn(seq[n,L] u8, qual[n,L] u8, lengths[n] i32, n_records i32[],
               ref[Lr] u8, q_lower i32[], q_upper i32[], offset i32[])
    -> QCAlignResult. With a mesh, n must be divisible by mesh size; inputs
    are sharded P('dp') on the record dim, ref and scalars replicated."""
    kw = dict(check_ascii=check_ascii, check_quality=check_quality,
              with_alignment=with_alignment, qual_hist_2d=qual_hist_2d)
    if mesh is None:
        return jax.jit(
            functools.partial(_local_step, axis_name=None, **kw))

    from .mesh import SP_AXIS

    sp = (SP_AXIS if SP_AXIS in mesh.axis_names
          and mesh.shape[SP_AXIS] > 1 else None)
    align_substep = sp is not None and with_alignment
    if align_substep:
        # Alignment needs full-length rows, which the sp-sharded QC step
        # never holds. Rather than refuse the mesh, NW runs as a separate
        # record-parallel sub-step whose row shards span BOTH mesh axes
        # (dp x sp flattened), so every device aligns a disjoint row range
        # at full width; XLA inserts the all-to-all between the two layouts.
        kw = dict(kw, with_alignment=False)
    fn = functools.partial(_local_step, axis_name=axis_name, sp_axis=sp,
                           **kw)
    row_spec = P(axis_name)
    if sp is None:
        stats_specs = jax.tree.map(
            lambda _: P(), stats_ops.zero_stats(1, qual_hist_2d))
        mat_spec = P(axis_name)
    else:
        # per-position leaves remain position-sharded over 'sp'
        stats_specs = stats_ops.QCStats(
            reads=P(), bases=P(), base_counts=P(),
            per_pos_base_counts=P(None, sp),
            per_pos_qual_sum=P(sp),
            per_pos_count=P(sp),
            qual_hist=P(), gc_count=P(), error_reads=P(),
            length_hist=P(), gc_hist=P(), mean_qual_hist=P(),
            per_pos_qual_hist=P(None, sp) if qual_hist_2d else None)
        mat_spec = P(axis_name, sp)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(mat_spec, mat_spec, P(axis_name), P(), P(), P(),
                  P(), P()),
        out_specs=QCAlignResult(
            stats=stats_specs,
            error_codes=row_spec,
            phred=mat_spec,
            nw_scores=row_spec,
        ),
        check_vma=False,
    )
    if not align_substep:
        return jax.jit(sharded)

    flat_rows = P((axis_name, SP_AXIS))

    def _nw_local(seq, lengths, ref):
        return nw_ops.nw_scores_xla(
            seq, jnp.minimum(lengths, seq.shape[1]), ref)

    nw_sharded = shard_map(
        _nw_local,
        mesh=mesh,
        in_specs=(flat_rows, flat_rows, P()),
        out_specs=flat_rows,
        check_vma=False,
    )

    def combined(seq, qual, lengths, n_records, ref, q_lower, q_upper,
                 offset):
        res = sharded(seq, qual, lengths, n_records, ref, q_lower, q_upper,
                      offset)
        return res._replace(nw_scores=nw_sharded(seq, lengths, ref))

    return jax.jit(combined)


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


def build_uniform_qc_step(mesh: Optional[Mesh], layout, schema, *,
                          width: int = 128, check_ascii: bool = True,
                          check_quality: bool = True,
                          axis_name: str = DP_AXIS,
                          per_shard: bool = False):
    """Sharded pipeline-B step: device-side uniform-template FASTQ parsing
    + QC over a mesh (SURVEY §2.5 multi-host scaling applied to the
    raw-bytes ingest path), built on the one-pass fused kernel
    (ops/uniform_qc.py — no padded SoA is materialized on any shard).

    `schema` is the QualitySchema (static: the fused kernel's histogram
    width is derived from its bounds at trace time).

    Returns fn(chunk u8[n] or u8[nrec, rs], n_valid i32[]) ->
               (n_records i32[], bases i32[], ok bool[], QCStats). `n`
    (= nrec * rs) must be a multiple of layout.rs * mesh.size; the chunk is
    sharded on the (implicit or leading) record dimension — each device
    proves the template and computes stats for its row range, scalars and
    histograms psum over ICI. PREFER the 2-D [nrec, rs] form on TPU: the
    row-tiled device layout makes the kernel's column slices lane-regular
    (see ops/uniform_qc.py — measured 2.2x on v5e). Every violation
    rejects (ok=False) exactly like the single-device path, so the host
    fallback contract carries over unchanged.

    With per_shard=True (mesh runs only) the contract becomes
    shard-granular: fn returns (n_records i32[D], bases i32[D], ok bool[D],
    QCStats) where index d is shard d's verdict/counts and the psum'd stats
    include ONLY passing shards (failed shards' contributions are masked
    out before the collective). The host re-parses just the byte ranges of
    failing shards through the exact engine and merges — the multi-chip
    analog of the single-chip chunk fallback (reference resume analog:
    blazeseq/fastq/parser.mojo:452-522)."""
    from ..ops.uniform_qc import uniform_qc

    rs = layout.rs
    q_lo, q_hi = int(schema.LOWER), int(schema.UPPER)
    offset = int(schema.OFFSET)

    def _local(chunk, n_valid):
        if mesh is not None:
            idx = jax.lax.axis_index(axis_name)
            rows_local = (chunk.shape[0] if chunk.ndim == 2
                          else chunk.shape[0] // rs)
            # rows before this shard; local valid rows within [0, rows_local]
            start = idx.astype(jnp.int32) * rows_local
            nrec_valid = (n_valid // rs).astype(jnp.int32)
            local_valid = jnp.clip(nrec_valid - start, 0, rows_local)
            local_n_valid = local_valid * rs
        else:
            local_n_valid = n_valid
        ok, st = uniform_qc(chunk, local_n_valid, rs=rs, o1=layout.o1,
                            o2=layout.o2, o3=layout.o3, width=width,
                            q_lo=q_lo, q_hi=q_hi, offset=offset,
                            check_ascii=check_ascii,
                            check_quality=check_quality)
        n_rec = st.reads
        bases = st.bases
        if mesh is not None and per_shard:
            oki = ok.astype(jnp.int32)
            st = jax.lax.psum(jax.tree.map(lambda x: x * oki, st),
                              axis_name)
            return (n_rec.reshape(1), bases.reshape(1), ok.reshape(1), st)
        if mesh is not None:
            st = jax.lax.psum(st, axis_name)
            ok = jax.lax.pmin(ok.astype(jnp.int32), axis_name) > 0
            n_rec = jax.lax.psum(n_rec, axis_name)
            bases = jax.lax.psum(bases, axis_name)
        return n_rec, bases, ok, st

    if mesh is None:
        return jax.jit(_local)
    stats_specs = jax.tree.map(lambda _: P(), stats_ops.zero_stats(1))
    shard_spec = P(axis_name) if per_shard else P()
    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(shard_spec, shard_spec, shard_spec, stats_specs),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_ragged_qc_step(mesh: Optional[Mesh], schema, *, width: int = 128,
                         slot_cap: int = 12, check_ascii: bool = True,
                         check_quality: bool = True,
                         axis_name: str = DP_AXIS):
    """Sharded pipeline-B step for the GENERAL (ragged-layout) device
    engine: variable-id / mixed-length / short-record corpora parse on
    every device of a mesh with no uniform-template requirement
    (ops/ragged_qc.py; SURVEY §2.5 scaling applied to the raw-bytes path).

    The caller shards the FILE at record boundaries on the host
    (parallel/sharding.find_record_boundary), zero-pads every shard to a
    common S = multiple of 2*round_up(width, 128), and passes the flat
    [D*S] byte array plus per-shard valid byte counts i32[D].

    Returns fn(chunks u8[D*S], n_valid i32[D]) ->
        (good bool[D], fallback bool[D], tail_start i32[D], QCStats)
    where good[d] = shard d validated AND stayed inside the device tier;
    the psum'd stats include ONLY good shards (their contributions are
    masked out before the collective), and a shard whose bytes end at a
    record boundary reports tail_start == n_valid[d]. The host re-parses
    rejected shards' byte ranges through the exact engine and merges —
    the shard-granular fallback contract of
    build_uniform_qc_step(per_shard=True)."""
    from ..ops.ragged_qc import ragged_qc

    q_lo, q_hi = int(schema.LOWER), int(schema.UPPER)
    offset = int(schema.OFFSET)

    def _one(chunk, n_valid):
        r = ragged_qc(chunk, n_valid, width=width, q_lo=q_lo, q_hi=q_hi,
                      offset=offset, check_ascii=check_ascii,
                      check_quality=check_quality, slot_cap=slot_cap)
        good = r.ok & ~r.fallback
        st = jax.tree.map(lambda x: x * good.astype(jnp.int32), r.stats)
        return good, r.fallback, r.tail_start, st

    def _local(chunk, n_valid):
        good, fb, tail, st = _one(chunk, n_valid[0])
        if mesh is not None:
            st = jax.lax.psum(st, axis_name)
        return (good.reshape(1), fb.reshape(1), tail.reshape(1), st)

    if mesh is None:
        # same [D*S] + i32[D] contract without a mesh: run every shard
        # sequentially on the one device and sum good shards' stats —
        # anything else would silently drop shards 1..D-1
        def _single(chunk, n_valid):
            D = n_valid.shape[0]
            S = chunk.shape[0] // D
            goods, fbs, tails = [], [], []
            st_sum = None
            for d in range(D):
                good, fb, tail, st = _one(
                    jax.lax.dynamic_slice_in_dim(chunk, d * S, S), n_valid[d])
                goods.append(good)
                fbs.append(fb)
                tails.append(tail)
                st_sum = st if st_sum is None else jax.tree.map(
                    lambda a, b: a + b, st_sum, st)
            return (jnp.stack(goods), jnp.stack(fbs), jnp.stack(tails),
                    st_sum)

        return jax.jit(_single)
    stats_specs = jax.tree.map(lambda _: P(), stats_ops.zero_stats(1))
    sharded = shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), stats_specs),
        check_vma=False,
    )
    return jax.jit(sharded)
