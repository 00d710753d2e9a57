"""Multi-chip flagship frame: the full BVH + ReSTIR + PT chain over a mesh.

`render_tiled` (tiles.py) shards the plain path tracer; this module shards the
FLAGSHIP path-traced graph (renderers/__init__.py
build_path_tracing_render_graph): BVH-raycast gbuffer positions, initial RIS,
temporal reuse, spatial reuse, and the reference path tracer with reservoir
NEE. Each device owns a contiguous row band of the image; the scene (and BVH
tables) are replicated.

Cross-chip dataflow — the only collectives in the frame, both riding ICI:
- temporal reuse backprojects into the PREVIOUS frame's spatial reservoirs at
  arbitrary pixels (camera motion makes the target row unbounded), so the four
  prev planes are `all_gather`ed to full height (16 B/px => ~33 MB at 1080p,
  well under an ICI hop);
- spatial reuse samples neighbors within cfg.spatial_radius rows, which can
  cross a band boundary, so the temporal planes are likewise gathered (a
  ±radius halo exchange would suffice; a tiled all_gather is the same
  bandwidth up to H/radius and far simpler).
Everything else — camera rays, BVH traversal, RIS candidates, PT bounces, NEE
visibility — is per-pixel and stays on-band. Pixel coordinates, RNG streams
and camera mapping all use GLOBAL coordinates, so the n-chip render is
bit-identical to the single-chip chain (tested in tests/test_parallel.py).

Reference analog: none (the reference is single-GPU, SURVEY.md §2.4); this is
the §5.7 TPU-native scaling design applied to the full ReSTIR chain.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rust_renderer_tpu.ops import pathtrace as pathtrace_ops
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops import restir as restir_ops
from rust_renderer_tpu.ops import rng as rngmod


def _gather_reservoir(r: restir_ops.Reservoir, axis: str) -> restir_ops.Reservoir:
    g = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    return restir_ops.Reservoir(Y=g(r.Y), W_sum=g(r.W_sum), W_X=g(r.W_X), M=g(r.M))


def flagship_step(
    scene,
    view,
    cfg,
    accum: jax.Array,
    prev_spatial: restir_ops.Reservoir,
    closest_hit,
    any_hit,
    sky_fn=None,
    axis: str | None = None,
    full_size: tuple[int, int] | None = None,
):
    """One flagship PT frame over this device's row band.

    accum: (band, W, 3); prev_spatial planes (band, W). With axis=None this is
    the unsharded single-chip chain (bit-identical to the graph passes in
    build_path_tracing_render_graph). Returns (output, accumulation, spatial)
    where spatial feeds the next frame's temporal pass.
    """
    h, w = accum.shape[:2]
    if axis is not None:
        assert full_size is not None
        fh, fw = full_size
        row_offset = jax.lax.axis_index(axis) * h
    else:
        fh, fw = (h, w) if full_size is None else full_size
        row_offset = 0

    # RNG seeded by GLOBAL pixel coords (renderers/__init__.py _rng_for).
    py_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + row_offset
    px_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    frame = (
        view.total_samples.astype(jnp.float32) + view.time * 10000.0
    ).astype(jnp.int32)
    state0 = rngmod.init_rng(px_i, py_i, fw, frame)

    # 1. gbuffer hit positions (passes.py setup_gbuffer_pass raycast path:
    # unjittered primary rays; miss lanes get the (1,1,1) clear position).
    o, d = rayops.generate_camera_rays(
        view.inverse_view, view.inverse_projection,
        px_i.astype(jnp.float32) + 0.5, py_i.astype(jnp.float32) + 0.5, fw, fh,
    )
    hit = closest_hit(scene, o, d)
    hit_pos = jnp.where(hit.is_hit[..., None], o + hit.t[..., None] * d, 1.0)

    # 2-3. reset + initial RIS (restir/initial_ris.rgen). p_hat rides along
    # pass to pass (exact reuse, renderers/__init__.py does the same).
    _, initial, p_hat_i = restir_ops.initial_ris_pass(
        scene, state0, hit_pos, view.num_lights, view.max_num_lights_used,
        cfg.ris_candidates, return_p_hat=True,
    )

    # 4. temporal reuse against the gathered full-height prev planes.
    prev_full = _gather_reservoir(prev_spatial, axis) if axis else prev_spatial
    state_t = state0 * jnp.uint32(9781) + jnp.uint32(1)
    _, temporal, p_hat_t = restir_ops.temporal_reuse_pass(
        scene, state_t, hit_pos, initial, prev_full,
        view.prev_frame_projection_view, view.temporal_reuse_enabled,
        full_height=fh, p_hat_initial=p_hat_i, return_p_hat=True,
    )

    # 5. spatial reuse with neighbors from the gathered temporal planes.
    temporal_full = _gather_reservoir(temporal, axis) if axis else temporal
    state_s = state0 * jnp.uint32(6271) + jnp.uint32(1)
    _, spatial = restir_ops.spatial_reuse_pass(
        scene, state_s, hit_pos, temporal, view.spatial_reuse_enabled,
        cfg.spatial_neighbors, cfg.spatial_radius,
        temporal_full=temporal_full, row_offset=row_offset,
        p_hat_temporal=p_hat_t,
    )

    # 6. reference PT with reservoir NEE (reference.rgen).
    result = pathtrace_ops.path_trace(
        scene, view, cfg, accum,
        reservoirs=spatial, closest_hit=closest_hit, any_hit=any_hit,
        row_offset=row_offset, full_size=(fh, fw), sky_fn=sky_fn,
    )
    return result.output, result.accumulation, spatial


def render_flagship_tiled(
    scene, view, cfg, accum, prev_spatial, closest_hit, any_hit,
    mesh: Mesh, sky_fn=None, axis: str = "tiles",
):
    """Flagship frame with image rows sharded over `mesh`.

    accum: (H, W, 3) with H divisible by mesh size; prev_spatial planes (H, W).
    Returns (output, accumulation, spatial) sharded over rows.
    """
    n = mesh.shape[axis]
    height, width = accum.shape[:2]
    assert height % n == 0, f"height {height} not divisible by {n} devices"

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(axis, None, None),
            restir_ops.Reservoir(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        ),
        out_specs=(
            P(axis, None, None), P(axis, None, None),
            restir_ops.Reservoir(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        ),
        check_vma=False,
    )
    def tile_fn(scene, view, accum_tile, prev_tile):
        return flagship_step(
            scene, view, cfg, accum_tile, prev_tile, closest_hit, any_hit,
            sky_fn=sky_fn, axis=axis, full_size=(height, width),
        )

    return tile_fn(scene, view, accum, prev_spatial)


def shard_flagship_inputs(mesh: Mesh, accum, reservoirs, axis: str = "tiles"):
    """device_put the frame-carried state with row-band shardings."""
    band = NamedSharding(mesh, P(axis, None))
    band3 = NamedSharding(mesh, P(axis, None, None))
    accum = jax.device_put(accum, band3)
    reservoirs = restir_ops.Reservoir(
        *(jax.device_put(p, band) for p in reservoirs)
    )
    return accum, reservoirs
