"""Shared helpers for device kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=None)
def use_interpret() -> bool:
    """Pallas kernels compile natively on TPU; elsewhere (CPU tests) run in
    interpreter mode."""
    return jax.default_backend() != "tpu"


def length_mask(lengths: jnp.ndarray, width: int,
                col_offset=0) -> jnp.ndarray:
    """[n, width] bool mask of valid positions given per-record lengths.
    `col_offset` shifts the position base — used when the length dimension
    is sharded over an 'sp' mesh axis and this shard holds columns
    [col_offset, col_offset + width)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (lengths.shape[0], width), 1)
    return (pos + col_offset) < lengths[:, None]
