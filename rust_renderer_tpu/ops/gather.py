"""Packed-row gathers: the one gather shape that is fast on TPU.

Measured (PERFORMANCE.md): gather cost on TPU is per-INDEX (~1.4 ns/row,
regardless of row width), and multi-array gathers multiply the cost. The
winning pattern everywhere (BVH nodes/leaves, reservoirs, lights) is to pack
all per-record fields into ONE table row and fetch exactly one row per index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (N, W), idx (R,) -> (R, W), clipped indices."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        table, idx[:, None], dnums, slice_sizes=(1, table.shape[1]), mode="clip"
    )


def bitcast_f32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def bitcast_i32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)
