"""Device mesh helpers for data-parallel read processing.

The reference has no distributed layer (SURVEY.md §2.5); the TPU-native
equivalent shards read batches over a `jax.sharding.Mesh` 'dp' axis and merges
QC statistics with psum collectives riding ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
SP_AXIS = "sp"  # sequence/position axis (reads' length dimension)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DP_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(dp: int, sp: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh: records sharded over 'dp', the read-position dimension over
    'sp' (sequence parallelism for the per-position QC reductions — each
    device computes stats for its position slice of its record shard)."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(devices, (DP_AXIS, SP_AXIS))


def batch_sharding(mesh: Mesh, axis_name: str = DP_AXIS) -> NamedSharding:
    """Shard the leading (record) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DP_AXIS):
    """Place padded batch arrays with their leading dim sharded over the mesh.

    Arrays must have leading dims divisible by mesh size (callers pad with
    `pad_records_to`)."""
    sh = batch_sharding(mesh, axis_name)
    return tuple(jax.device_put(a, sh) for a in arrays)
