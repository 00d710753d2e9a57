"""Multi-chip scaling: image-tile sharding over a jax device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); the TPU-native scaling
story (§5.7) shards the image plane: per-pixel work is embarrassingly
parallel, the scene arrays are replicated, and the only collective is the
implicit final-image layout. Implemented with `shard_map` over a 1D 'tiles'
mesh axis so each chip renders a contiguous row band.
"""

from rust_renderer_tpu.parallel.flagship import (
    flagship_step,
    render_flagship_tiled,
    shard_flagship_inputs,
)
from rust_renderer_tpu.parallel.tiles import make_tile_mesh, render_tiled

__all__ = [
    "flagship_step",
    "make_tile_mesh",
    "render_flagship_tiled",
    "render_tiled",
    "shard_flagship_inputs",
]
