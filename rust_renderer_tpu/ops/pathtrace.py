"""Reference path tracer: the RTIOW-style megakernel, rebuilt as a wavefront.

Behavioral rebuild of pathtrace_reference/reference.rgen + .rchit + .rmiss:
per-pixel PCG streams seeded by (pixel, total_samples + time*10000)
(reference.rgen:24), jittered pinhole rays (:30-38), a bounce loop with
throughput accumulation (:42-126), NEE for the sun (:63-79) and analytic point
lights with uniform / fresh-RIS / reservoir sampling incl. the split-screen
A/B mode (:80-125), and the progressive accumulation protocol with
`accumulation_limit` and linear->sRGB output (:130-144).

TPU-native shape: one jitted function over whole (H, W) arrays. The GPU
megakernel's per-thread bounce loop becomes a statically unrolled wavefront —
every bounce intersects the full (still-active) pixel front; masks replace
thread divergence. Intersection is pluggable (brute force or BVH).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import atmosphere, intersect, materials
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops import restir as restirops
from rust_renderer_tpu.ops import rng as rngmod
from rust_renderer_tpu.ops.colors import linear_to_srgb


class PathTraceResult(NamedTuple):
    output: jax.Array  # (H, W, 3) f32 sRGB — the reference's output_image
    accumulation: jax.Array  # (H, W, 3) f32 linear — accumulation_image
    # Rays actually traced this frame (active-lane count: scatter rays with
    # live directions + NEE sun/light rays on active lanes). Terminated lanes
    # retire at the degenerate-ray guard and are NOT counted — this is the
    # honest numerator for Mray/s (a nominal W*H*bounces*3 flatters it).
    rays_traced: jax.Array = jnp.float32(0.0)


def _nee(scene, view, any_hit, rng_state, origin, throughput, active,
         radiance, reservoirs, px, full_width):
    """Next-event estimation: sun (reference.rgen:63-79) + point light
    (reference.rgen:80-125).

    Both visibility queries are BATCHED into one any-hit traversal over a
    doubled ray front (sun rays stacked above light rays) — halves the number
    of traversal loops per bounce. Light occlusion uses a distance-limited
    any-hit, equivalent to the reference's `hit_t > distance || miss` test.
    """
    shape = rng_state.shape
    sun_dir = rayops.normalize(view.sun_dir)

    # -- light selection (uniform or reservoir; reference.rgen:86-109)
    use_reservoir = jnp.logical_and(
        px > full_width // 2, view.use_ris_light_sampling == 1
    )
    rng_state, uni_idx, uni_pdf = restirops.sample_light_uniform(
        rng_state, view.num_lights, view.max_num_lights_used
    )
    uni_weight = 1.0 / uni_pdf
    if reservoirs is not None:
        total_weights = jnp.where(use_reservoir, reservoirs.W_sum, 1.0)
        light_index = jnp.where(use_reservoir, reservoirs.Y, uni_idx)
        light_weight = jnp.where(use_reservoir, reservoirs.W_X, uni_weight)
    else:
        total_weights = jnp.ones(shape, jnp.float32)
        light_index = uni_idx
        light_weight = uni_weight

    valid = jnp.logical_and(total_weights != 0.0, light_index >= 0)
    safe_index = jnp.clip(light_index, 0, scene.light_pos.shape[0] - 1)
    # One-hot matmul for small light tables (gather-free), packed row
    # gather otherwise (restirops.select_light_rows).
    lrows = restirops.select_light_rows(
        scene, safe_index.reshape(-1)
    ).reshape(shape + (6,))
    to_light = lrows[..., :3] - origin
    distance_to_light = jnp.linalg.norm(to_light, axis=-1)
    light_dir = to_light / jnp.maximum(distance_to_light, 1e-12)[..., None]

    # -- one batched occlusion query: [sun rays; light rays]. Dead lanes get
    # zero directions so their packets retire instantly. A light ray whose
    # contribution is already known zero (invalid reservoir/selection, or
    # lights globally off) is equally dead: its occlusion result is masked
    # by `take` below, so zeroing it is exact and lets compaction drop it.
    sun_live = jnp.logical_and(active, view.sun_shadow_enabled == 1)[..., None]
    light_live = jnp.logical_and(
        jnp.logical_and(active, valid), view.lights_enabled == 1
    )[..., None]
    o2 = jnp.concatenate([origin, origin], axis=0)
    d2 = jnp.concatenate(
        [
            jnp.where(sun_live, jnp.broadcast_to(sun_dir, origin.shape), 0.0),
            jnp.where(light_live, light_dir, 0.0),
        ],
        axis=0,
    )
    tmax2 = jnp.concatenate(
        [jnp.full(shape, 1e4), distance_to_light * (1.0 - 1e-4)], axis=0
    )
    occluded2 = any_hit(scene, o2, d2, 1e-3, tmax2)
    n = shape[0]
    sun_occluded = occluded2[:n]
    light_occluded = occluded2[n:]

    # sun contribution (reference.rgen:70-79)
    sun_visible = jnp.logical_and(active, jnp.logical_not(sun_occluded))
    radiance = radiance + jnp.where(
        jnp.logical_and(sun_visible, view.sun_shadow_enabled == 1)[..., None],
        throughput, 0.0,
    )

    # light contribution (reference.rgen:111-125). p_hat comes straight from
    # the light rows fetched above — a second dense select per bounce
    # (target_function) measured ~15 ms/bounce at 1080p for identical data.
    lum = (0.2126 * lrows[..., 3] + 0.7152 * lrows[..., 4]
           + 0.0722 * lrows[..., 5])
    d2 = distance_to_light * distance_to_light
    p_hat = jnp.where(
        light_index < 0, 0.0, lum / jnp.maximum(d2, 1e-12)
    )
    contrib = (p_hat * light_weight)[..., None] * throughput
    take = jnp.logical_and(
        jnp.logical_and(active, valid),
        jnp.logical_and(jnp.logical_not(light_occluded), view.lights_enabled == 1),
    )
    return rng_state, radiance + jnp.where(take[..., None], contrib, 0.0)


def path_trace(
    scene,
    view,
    cfg,
    accumulation: jax.Array,
    reservoirs: restirops.Reservoir | None = None,
    closest_hit: Callable = intersect.closest_hit_bruteforce,
    any_hit: Callable | None = None,
    row_offset: jax.Array | int = 0,
    full_size: tuple[int, int] | None = None,
    sky_fn: Callable | None = None,
    dynamic=None,
) -> PathTraceResult:
    """One frame of the reference path tracer over the full image.

    accumulation: (H, W, 3) f32 linear accumulation from the previous frame.
    reservoirs: spatial-reuse output for ReSTIR NEE (None = uniform only).
    row_offset / full_size: for image-tile sharding over a device mesh —
    `accumulation` is this device's row tile; camera mapping and RNG seeds use
    global pixel coordinates so the sharded render is bit-identical to the
    single-chip one (SURVEY.md §5.7).
    dynamic: ops.mc_bvh.DynamicScene — per-frame geometry (the animated
    marching-cubes isosurface) traced alongside the static scene, the analog
    of the reference's in-frame TLAS rebuild (raytracing.rs:400-459).
    """
    if any_hit is None:
        def any_hit(s, o, d, t_min=1e-3, t_max=1e4):
            return closest_hit(s, o, d, t_min, t_max).is_hit

    if dynamic is not None:
        from rust_renderer_tpu.ops import mc_bvh

        closest_hit = mc_bvh.combine_closest_hit(closest_hit, dynamic)
        any_hit = mc_bvh.combine_any_hit(any_hit, dynamic)

    height, width = accumulation.shape[:2]
    full_height, full_width = full_size if full_size is not None else (height, width)
    py = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) + row_offset
    px = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    frame = (view.total_samples.astype(jnp.float32) + view.time * 10000.0).astype(jnp.int32)
    rng_state = rngmod.init_rng(px, py, full_width, frame)

    pixel_color = jnp.zeros((height, width, 3), jnp.float32)

    for _s in range(cfg.samples_per_frame):
        rng_state, jx = rngmod.random_float(rng_state)
        rng_state, jy = rngmod.random_float(rng_state)
        origin, direction = rayops.generate_camera_rays(
            view.inverse_view,
            view.inverse_projection,
            px.astype(jnp.float32) + jx,
            py.astype(jnp.float32) + jy,
            full_width,
            full_height,
        )

        radiance = jnp.zeros((height, width, 3), jnp.float32)
        throughput = jnp.ones((height, width, 3), jnp.float32)
        active = jnp.ones((height, width), bool)
        rays_traced = jnp.float32(0.0)

        def bounce(carry, _):
            """One bounce of the wavefront. Runs under lax.scan so the XLA
            program contains the body ONCE instead of num_bounces inlined
            copies — the per-graph-structure remote compile cost is dominated
            by this pass (VERDICT r2 #6); bounces are separated by opaque
            traversal kernels anyway, so scan loses no fusion that mattered."""
            (rng_state, origin, direction, throughput, radiance, active,
             rays_traced) = carry
            # Active-lane ray accounting: one closest-hit per live-direction
            # lane + two NEE visibility rays per lane still active after the
            # bounce (the _nee doubled front).
            live = jnp.sum(direction * direction, axis=-1) > 0.0
            rays_traced = rays_traced + jnp.sum(live.astype(jnp.float32))
            # (Active-lane compaction via stable partition was measured here
            # and netted slightly negative — the zero-direction retirement
            # below already captures the dead-lane win; see PERFORMANCE.md.)
            hit = closest_hit(scene, origin, direction)
            missed = jnp.logical_not(hit.is_hit)

            # Miss shader (reference.rmiss): atmosphere sky, clamped. A
            # custom sky_fn (e.g. the captured environment cubemap — the
            # reference's own TODO at reference.rmiss:20) replaces the
            # per-ray scattering integral: ~100x fewer flops per miss lane.
            if getattr(cfg, "furnace_test", False):
                # FURNACE_TEST (reference.rmiss:13-28): constant white sky,
                # energy-conservation diagnostic. Static, like the #ifdef.
                sky = jnp.ones((height, width, 3), jnp.float32)
            elif sky_fn is not None:
                sky = sky_fn(origin, rayops.normalize(direction), view)
            else:
                sky = atmosphere.sky_radiance(
                    origin, rayops.normalize(direction),
                    rayops.normalize(view.sun_dir), view.sky_enabled,
                )

            surf = intersect.surface_at_hit(scene, hit, origin, direction)
            if dynamic is not None:
                from rust_renderer_tpu.ops import mc_bvh

                surf = mc_bvh.surface_patch(dynamic, hit, direction, surf)
            rng_state, sc = materials.scatter(
                scene, surf.material, direction, surf.normal, surf.uv, rng_state
            )

            hit_color = jnp.where(missed[..., None], sky, sc.color)
            throughput = jnp.where(active[..., None], throughput * hit_color, throughput)

            # Sky or absorbed (diffuse light): terminate adding throughput
            # (reference.rgen:52-57).
            terminated = jnp.logical_and(
                active, jnp.logical_or(missed, jnp.logical_not(sc.is_scattered))
            )
            radiance = radiance + jnp.where(terminated[..., None], throughput, 0.0)
            active = jnp.logical_and(active, jnp.logical_not(terminated))

            # Advance ray (reference.rgen:59-61). Terminated lanes get a ZERO
            # direction: the traversal's degenerate-ray guard retires them on
            # entry, so dead packets exit immediately instead of re-walking
            # their frozen path every remaining bounce.
            new_origin = rayops.offset_ray(surf.position, surf.normal)
            origin = jnp.where(active[..., None], new_origin, origin)
            direction = jnp.where(active[..., None], sc.direction, 0.0)

            # NEE at the new origin (reference.rgen:63-125); sun + light
            # visibility batched into one traversal.
            rng_state, radiance = _nee(
                scene, view, any_hit, rng_state, origin, throughput, active,
                radiance, reservoirs, px, full_width,
            )
            rays_traced = rays_traced + 2.0 * jnp.sum(active.astype(jnp.float32))
            return (rng_state, origin, direction, throughput, radiance,
                    active, rays_traced), None

        carry = (rng_state, origin, direction, throughput, radiance, active,
                 rays_traced)
        carry, _ = jax.lax.scan(bounce, carry, None, length=cfg.num_bounces)
        (rng_state, origin, direction, throughput, radiance, active,
         rays_traced) = carry

        pixel_color = pixel_color + radiance

    # Progressive accumulation (reference.rgen:130-144).
    spf = jnp.uint32(cfg.samples_per_frame)
    first_frame = view.total_samples == spf
    accumulated = jnp.where(first_frame, 0.0, accumulation)
    limit = view.accumulation_limit.astype(jnp.uint32)
    within = view.total_samples <= limit
    accumulated = jnp.where(within, accumulated + pixel_color, accumulated)
    denom = jnp.minimum(view.total_samples, limit).astype(jnp.float32)
    out = accumulated / jnp.maximum(denom, 1.0)
    out = linear_to_srgb(out)
    return PathTraceResult(
        output=out, accumulation=accumulated, rays_traced=rays_traced
    )
