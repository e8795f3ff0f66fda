"""Multi-host ingest + globally-merged analysis (SPMD over processes).

The reference is strictly single-process (SURVEY §2.5: no distributed layer);
the TPU-native scale-out design is: each host parses its own record-boundary
file shard with the native host engine, feeds per-host padded batches into a
global `jax.sharding.Mesh` via `jax.make_array_from_process_local_data`, and
the fused QC step runs under shard_map with `psum`-merged statistics — so
every host ends with identical global counts, exactly equal to a single-host
run over the whole file (record-boundary sharding guarantees no record is
split or double-counted).

Entry points:
  init_distributed()      — jax.distributed.initialize from env/args
  run_multihost_qc(path)  — shard -> parse -> global QC stats (merged)

Single-process (num_processes == 1) degenerates to the local pipeline, so the
same code path runs on a laptop, one TPU host, or an N-host slice.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..fastq.parser import FastqParser, ParserConfig
from ..fastq.quality import parse_schema
from .sharding import open_shard, shard_file


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when num_processes resolves to 1."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def run_multihost_qc(path, batch_records: int = 16384, max_len: int = 256,
                     check_ascii: bool = True, check_quality: bool = True,
                     quality_schema: str = "sanger",
                     reference: Optional[bytes] = None):
    """Parse this process's file shard and compute globally merged QC stats.

    Design: per-batch work stays process-local (no cross-host barrier per
    batch, so hosts whose shards hold different batch counts never deadlock
    in lockstep collectives and the ingest pipelines run free); the small
    additive QCStats pytree is merged ONCE at the end with a single
    cross-process all-reduce over DCN/ICI. Every process returns identical
    global stats, exactly equal to a single-host run over the whole file
    (record-boundary sharding means no record is split or double-counted).

    With `reference` (a read to align against), each host also runs the
    batched Needleman-Wunsch wavefront on its shard (SURVEY §7.2 step 8:
    NW across >= 2 hosts) and the returned stats gain a global
    (nw_sum, nw_count) for the mean alignment score — additive, so the
    same single merge covers it.

    Exactness: every integer leaf is upcast to int64 on the host before
    per-batch accumulation (device batches are int32 partials, same pattern
    as the single-host QCAccumulator), and the cross-process merge
    all-gathers int32 hi/lo halves and reassembles host-side in int64 — so
    there is no count or score ceiling (a multi-TB shard's base counts
    exceed 2^31 routinely; int32 device collectives would wrap silently).

    Returns (stats, local_reads, local_bases): `stats` is the merged global
    QCStats pytree (+ nw fields when aligning); local_* are this host's
    shard contribution (feed-rate accounting).
    """
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from .pipeline import build_qc_align_step

    n_proc = jax.process_count()
    pid = jax.process_index()
    schema = parse_schema(quality_schema)
    cfg = ParserConfig(check_ascii=check_ascii, check_quality=check_quality,
                       quality_schema=quality_schema)
    parser = FastqParser(open_shard(path, n_proc, pid), config=cfg)

    align = reference is not None
    step = build_qc_align_step(None, check_ascii=check_ascii,
                               check_quality=check_quality,
                               with_alignment=align)

    local = None
    local_reads = 0
    local_bases = 0
    ref = (jnp.asarray(np.frombuffer(bytes(reference), dtype=np.uint8))
           if align else jnp.zeros(128, jnp.uint8))
    for pb in parser.padded_batches(batch_records, max_len=max_len,
                                    pad_records_to=batch_records,
                                    reuse_buffers=True):
        local_reads += pb.n_records
        local_bases += int(np.asarray(
            pb.lengths[: pb.n_records], dtype=np.int64).sum())
        res = step(jnp.asarray(pb.seq), jnp.asarray(pb.qual),
                   jnp.asarray(pb.lengths, dtype=jnp.int32),
                   jnp.int32(pb.n_records), ref,
                   jnp.int32(schema.LOWER), jnp.int32(schema.UPPER),
                   jnp.int32(schema.OFFSET))
        stats = jtu.tree_map(_widen, jax.device_get(res.stats))
        if align:
            scores = np.asarray(res.nw_scores)[: pb.n_records]
            stats = dict(qc=stats,
                         nw_sum=np.int64(scores.astype(np.int64).sum()),
                         nw_count=np.int64(len(scores)))
        local = stats if local is None else jtu.tree_map(np.add, local, stats)
    if local is None:  # empty shard
        from ..ops.stats import zero_stats
        local = jtu.tree_map(_widen, zero_stats(max_len))
        if align:
            local = dict(qc=local, nw_sum=np.int64(0), nw_count=np.int64(0))
    if n_proc == 1:
        return local, local_reads, local_bases
    return _allreduce_stats(local), local_reads, local_bases


def _widen(leaf):
    """Host-side dtype widening for exact accumulation: integer leaves to
    int64, floating leaves to float64."""
    a = np.asarray(leaf)
    if np.issubdtype(a.dtype, np.integer):
        return a.astype(np.int64)
    if np.issubdtype(a.dtype, np.floating):
        return a.astype(np.float64)
    return a


def _allreduce_stats(local_stats):
    """Sum an additive (int64/float64) stats pytree across processes,
    exactly.

    Device collectives ride 32-bit lanes (jax x64 is normally disabled, and
    int64 sums could carry past 2^31 anyway), so each int64 leaf is split
    into hi/lo int32 halves, ALL-GATHERED across processes (gather, not
    device-sum: per-process halves are exact, only the final sum needs
    int64), reassembled host-side and summed in int64. Float leaves gather
    as float32 pairs is unnecessary — they gather as-is and sum in
    float64."""
    import jax
    import jax.tree_util as jtu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("dp",))
    sharding = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())
    n_local = len(jax.local_devices())

    def to_wire(leaf):
        leaf = _widen(leaf)
        if leaf.dtype == np.int64:
            lo = (leaf & np.int64(0xFFFFFFFF)).astype(np.uint32)
            hi = (leaf >> np.int64(32)).astype(np.int64).astype(np.int32)
            return (hi, lo.view(np.int32))
        return (leaf.astype(np.float32),)

    flat, treedef = jtu.tree_flatten(local_stats)
    wire_parts = [to_wire(l) for l in flat]

    def lift(arr):
        block = np.zeros((n_local,) + arr.shape, dtype=arr.dtype)
        block[0] = arr
        return jax.make_array_from_process_local_data(sharding, block)

    lifted = [tuple(lift(p) for p in parts) for parts in wire_parts]
    gather = jax.jit(lambda t: t,
                     out_shardings=jax.tree.map(lambda _: rep, lifted))
    gathered = jax.device_get(gather(lifted))

    merged = []
    for parts in gathered:
        rows = [np.asarray(p) for p in parts]
        if len(rows) == 2:  # int64 as (hi, lo)
            hi = rows[0].astype(np.int64)
            lo = rows[1].view(np.uint32).astype(np.int64)
            per_dev = (hi << np.int64(32)) | lo
            merged.append(per_dev.sum(axis=0, dtype=np.int64))
        else:
            merged.append(rows[0].astype(np.float64).sum(axis=0))
    return jtu.tree_unflatten(treedef, merged)
