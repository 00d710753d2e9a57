"""Image-tile sharding of the path-traced frame over a device mesh.

Each device owns a (H / n_devices, W) row band of the image and the full
(replicated) scene; `row_offset = axis_index * band` keeps camera rays and
per-pixel RNG seeded by *global* coordinates, so an n-chip render is
numerically identical to the single-chip render (tested in
tests/test_parallel.py). No cross-chip communication is needed during the
frame — XLA only reassembles the sharded output layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rust_renderer_tpu.ops import pathtrace


def make_tile_mesh(n_devices: int | None = None, axis: str = "tiles") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def render_tiled(scene, view, cfg, accumulation, mesh: Mesh, reservoirs=None,
                 closest_hit=None, axis: str = "tiles"):
    """Path trace with the image rows sharded over `mesh`.

    accumulation: (H, W, 3) with H divisible by mesh size. Returns a
    PathTraceResult whose arrays are sharded over rows.
    """
    n = mesh.shape[axis]
    height, width = accumulation.shape[:2]
    assert height % n == 0, f"height {height} not divisible by {n} devices"
    band = height // n
    kwargs = {}
    if closest_hit is not None:
        kwargs["closest_hit"] = closest_hit

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None, None)),
        out_specs=(P(axis, None, None), P(axis, None, None)),
        # Loop carries initialized from constants become 'varying' through the
        # body (they mix with sharded rays); skip the strict vma check.
        check_vma=False,
    )
    def tile_fn(scene, view, accum_tile):
        idx = jax.lax.axis_index(axis)
        res = pathtrace.path_trace(
            scene,
            view,
            cfg,
            accum_tile,
            reservoirs=reservoirs,
            row_offset=idx * band,
            full_size=(height, width),
            **kwargs,
        )
        return res.output, res.accumulation

    out, accum = tile_fn(scene, view, accumulation)
    return pathtrace.PathTraceResult(output=out, accumulation=accum)
