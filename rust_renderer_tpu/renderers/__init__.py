"""Render-graph construction (rebuild of utopian/src/renderers/mod.rs).

Four graph modes mirroring RenderGraphMode (prototype/src/main.rs:5-11):
- PATH_TRACED: gbuffer -> reset_reservoirs -> initial_ris -> temporal_reuse
  -> spatial_reuse -> reference_pt -> present-blit (mod.rs:189-375)
- RASTERIZED: shadow -> gbuffer -> rt_shadows -> environment (lazy) ->
  rt_reflections -> ssao -> deferred -> atmosphere -> present (mod.rs:61-187)
- HYBRID: empty stub, like the reference (mod.rs:377-391)
- MINIMAL: shadow -> forward -> atmosphere -> present (mod.rs:393-433)

Builders are called every frame (the graph is rebuilt per frame over cached
resources, prototype/src/main.rs:487-517); jit-caching makes re-recording
free after the first frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.graph import Graph
from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.ops import pathtrace as pathtrace_ops
from rust_renderer_tpu.ops import restir as restir_ops
from rust_renderer_tpu.renderers.passes import (
    setup_atmosphere_pass,
    setup_deferred_pass,
    setup_environment_passes,
    setup_forward_pass,
    setup_gbuffer_pass,
    setup_marching_cubes_pass,
    setup_present_pass,
    setup_rt_reflections_pass,
    setup_rt_shadows_pass,
    setup_shadow_pass,
    setup_ssao_pass,
)

__all__ = [
    "build_render_graph",
    "build_path_tracing_render_graph",
    "build_hybrid_render_graph",
    "build_minimal_forward_render_graph",
]


def build_render_graph(
    graph: Graph, cfg, camera, scene_bvh, sun_dir,
    need_environment_update: bool = False,
    shadows_enabled: bool = True,
    shadow_map_size: int | None = None,
    marching_cubes_enabled: bool = False,
    raytracing_supported: bool = True,
) -> None:
    """Full rasterized graph (mod.rs:61-187).

    raytracing_supported=False mirrors the reference's graceful degradation
    when the device lacks RT support (device.rs:93-103 gates rt_shadows.rs:25
    / rt_reflections.rs:26): the RT passes are not recorded and shading falls
    back to CSM-only + IBL-only reflections.
    """
    w, h = cfg.width, cfg.height
    size = shadow_map_size or cfg.shadow_map_size

    matrices, splits = setup_shadow_pass(
        graph, camera, sun_dir, shadows_enabled, size, cfg.shadow_cascade_count
    )
    setup_gbuffer_pass(graph, scene_bvh, w, h)
    if need_environment_update:
        setup_environment_passes(graph, cfg, sun_dir)
    else:
        # Declare persistent env resources so reads resolve even when the
        # compute passes are skipped this frame (ibl.rs:63-66 semantics).
        _declare_env_resources(graph, cfg)
    if raytracing_supported:
        setup_rt_shadows_pass(graph, scene_bvh, cfg, w, h)
        setup_rt_reflections_pass(graph, scene_bvh, cfg, w, h)
    else:
        # Fallback resources: fully lit rt-shadow plane, black reflections
        # (deferred.frag reads them but view.raytracing_supported == 0 masks
        # their contribution).
        graph.create_texture("rt_shadows", w, h, 1, clear=1.0)
        graph.create_texture("rt_reflections", w, h, 4, clear=0.0)
    setup_ssao_pass(graph, w, h)
    setup_deferred_pass(graph, cfg, w, h, matrices, splits)
    if marching_cubes_enabled:  # recorded on demand, like mod.rs:164-176
        setup_marching_cubes_pass(graph, cfg, w, h, target="deferred_output")
    setup_atmosphere_pass(graph, cfg, w, h, target="deferred_output")
    setup_present_pass(graph, w, h, source="deferred_output")


def _declare_env_resources(graph: Graph, cfg) -> None:
    for m in range(cfg.cubemap_mips):
        s = max(cfg.cubemap_size >> m, 1)
        graph.create_buffer(f"env_cubemap_mip{m}", (6, s, s, 3), persistent=True)
        graph.create_buffer(f"specular_map_mip{m}", (6, s, s, 3), persistent=True)
    graph.create_buffer(
        "irradiance_map", (6, cfg.irradiance_size, cfg.irradiance_size, 3),
        persistent=True,
    )
    graph.create_buffer("brdf_lut", (cfg.brdf_lut_size, cfg.brdf_lut_size, 2),
                        persistent=True)


# -- path-traced graph (mod.rs:189-375) ---------------------------------------

_RES_FIELDS = ("Y", "W_sum", "W_X", "M")


def _read_reservoir(res: dict, name: str) -> restir_ops.Reservoir:
    return restir_ops.Reservoir(
        Y=res[f"{name}_Y"].astype(jnp.int32),
        W_sum=res[f"{name}_W_sum"],
        W_X=res[f"{name}_W_X"],
        M=res[f"{name}_M"].astype(jnp.int32),
    )


def _write_reservoir(name: str, r: restir_ops.Reservoir) -> dict:
    return {
        f"{name}_Y": r.Y.astype(jnp.float32),
        f"{name}_W_sum": r.W_sum,
        f"{name}_W_X": r.W_X,
        f"{name}_M": r.M.astype(jnp.float32),
    }


def _declare_reservoir(graph: Graph, name: str, w: int, h: int,
                       persistent: bool = False) -> None:
    """Reservoir buffers, W*H per plane (the reference's W*H*16B SSBOs,
    mod.rs:222-244). Y stored as float plane (-1 = empty)."""
    for f in _RES_FIELDS:
        graph.create_buffer(
            f"{name}_{f}", (h, w), clear=-1.0 if f == "Y" else 0.0,
            persistent=persistent,
        )


def _rng_for(view, shape_hw):
    from rust_renderer_tpu.ops import rng as rngmod

    h, w = shape_hw
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    frame = (view.total_samples.astype(jnp.float32) + view.time * 10000.0).astype(jnp.int32)
    return rngmod.init_rng(px, py, w, frame)


def build_path_tracing_render_graph(
    graph: Graph, cfg, camera, scene_bvh, sun_dir,
    need_environment_update: bool = False,
    marching_cubes_enabled: bool = False,
    mc_material: int = 0,
    mc_color=(0.0, 1.0, 0.0, 1.0),
    num_lights: int | None = None,
) -> None:
    """PT graph with the ReSTIR chain (mod.rs:189-375).

    marching_cubes_enabled adds the animated isosurface to the traced scene
    (BASELINE config 5): an extract pass runs MC each frame, and both the
    gbuffer raycast and the reference PT trace the device-refit dynamic BVH
    (ops/mc_bvh.py) alongside the static one — the analog of the reference's
    per-frame TLAS rebuild covering the MC vertex buffer
    (marching_cubes.rs:63-135, raytracing.rs:400-459).

    num_lights: static scene light count when known. With ZERO lights the
    whole direct-lighting chain (gbuffer raycast + reset/initial-RIS/
    temporal/spatial) selects and shades nothing — every reservoir stays
    empty and every NEE ray is a gated zero-direction no-op — so the graph
    is built without it (bit-identical output, one fewer full traversal per
    frame; tests/test_render_graphs.py asserts the equality). None/-1 keeps
    the full chain."""
    w, h = cfg.width, cfg.height
    skip_restir = num_lights == 0

    if cfg.sky_mode == "cubemap":
        if need_environment_update:
            setup_environment_passes(graph, cfg, sun_dir)
        else:
            _declare_env_resources(graph, cfg)

    dynamic_fn = None
    mc_reads: tuple[str, ...] = ()
    if marching_cubes_enabled:
        from rust_renderer_tpu.ops import marching_cubes as mc_ops
        from rust_renderer_tpu.ops import mc_bvh

        v5 = cfg.mc_grid ** 3 * mc_ops.MAX_TRIS_PER_VOXEL
        graph.create_buffer("mc_positions", (v5, 3, 3))
        graph.create_buffer("mc_normals", (v5, 3, 3))
        graph.create_buffer("mc_valid", (v5,), dtype=jnp.int32)
        graph.create_buffer("marching_cubes_draw_count", (1,), dtype=jnp.int32)
        mc_reads = ("mc_wnode", "mc_node", "mc_leaf", "mc_tri_normals")
        for tname, tshape in mc_bvh.table_shapes(cfg.mc_grid).items():
            # The refit tables carry BITCAST int32 tri ids / child refs in
            # f32 columns (-1 and leaf refs alias NaN bit patterns) —
            # exempt them from the sanitizer so --sanitize + MC reports
            # real findings instead of tens of thousands of false ones.
            graph.create_buffer(tname, tshape,
                                sanitize=(tname == "mc_tri_normals"))

        def mc_extract(res, scene, view, u):
            # Fixed [0,32]^3 world domain (the reference's feature region) at
            # any tessellation — voxel_size scales inversely with grid.
            result = mc_ops.marching_cubes(
                grid=cfg.mc_grid, voxel_size=32.0 / cfg.mc_grid,
                time=view.time,
            )
            return {
                "mc_positions": result.positions,
                "mc_normals": result.normals,
                "mc_valid": result.valid.astype(jnp.int32),
                "marching_cubes_draw_count": result.vertex_count[None],
            }

        (
            graph.add_pass("mc_extract")
            .write("mc_positions").write("mc_normals").write("mc_valid")
            .write("marching_cubes_draw_count")
            .render(mc_extract)
            # Own XLA program (see mc_refit below).
            .isolate()
            .build()
        )

        def mc_refit(res, scene, view, u):
            # The runtime toggle empties the tree (boxes invert) without a
            # graph-structure change — mirroring the reference's uniform-flag
            # (not pipeline-permutation) toggles.
            on = view.marching_cubes_enabled == 1
            result = mc_ops.MarchingCubesResult(
                positions=res["mc_positions"],
                normals=res["mc_normals"],
                valid=jnp.logical_and(res["mc_valid"] > 0, on),
                vertex_count=jnp.int32(0),
            )
            return mc_bvh.build_dynamic_tables(result, cfg.mc_grid)

        builder = (
            graph.add_pass("mc_refit")
            .read("mc_positions").read("mc_normals").read("mc_valid")
            .render(mc_refit)
            # Extract and refit run as their OWN XLA programs and the frame
            # passes consume the refit TABLES as resources: the refit runs
            # once per frame (it was duplicated inside the gbuffer and
            # reference_pt bodies), and the 164k-slot extract (a ~90 s
            # remote compile by itself) stays out of every frame-structure
            # variant's compile (PERFORMANCE.md round 3).
            .isolate()
        )
        for tname in mc_reads:
            builder.write(tname)
        builder.build()

        def dynamic_fn(res, view):
            return mc_bvh.dynamic_scene_from_tables(
                {k: res[k] for k in mc_reads}, cfg.mc_grid, mc_material
            )

    graph.create_texture("accumulation_image", w, h, 3, persistent=True)
    graph.create_texture("pt_output", w, h, 3)
    # Active-lane ray count (bench metric); persistent so the host can read
    # it from Graph.state without keeping the whole resource dict alive.
    graph.create_buffer("pt_rays", (), persistent=True)

    if not skip_restir:
        # 1. gbuffer (hit positions for the ReSTIR passes, mod.rs:246-254).
        setup_gbuffer_pass(graph, scene_bvh, w, h, dynamic_fn=dynamic_fn,
                           dynamic_reads=mc_reads, mc_color=mc_color)

        # Reservoir buffers; spatial output is persistent — it feeds the
        # NEXT frame's temporal pass as prev (mod.rs:294).
        _declare_reservoir(graph, "initial_ris_reservoirs", w, h)
        _declare_reservoir(graph, "temporal_reuse_reservoirs", w, h)
        _declare_reservoir(graph, "spatial_reuse_reservoirs", w, h,
                           persistent=True)

        # 2. reset_reservoirs (restir/reset_reservoirs.comp): zero initial +
        # temporal buffers each frame.
        def reset(res, scene, view, u):
            out = {}
            for name in ("initial_ris_reservoirs", "temporal_reuse_reservoirs"):
                empty = restir_ops.Reservoir.empty((h, w))
                out.update(_write_reservoir(name, empty))
            return out

        rb = graph.add_pass("reset_reservoirs")
        for name in ("initial_ris_reservoirs", "temporal_reuse_reservoirs"):
            for f in _RES_FIELDS:
                rb.write(f"{name}_{f}")
        rb.render(reset).build()

        # p_hat of each pass's selected sample rides along to the next pass
        # so no pass re-selects light rows for a reservoir it was just handed
        # (exact reuse — ops/restir.py Y-equality argument; measured
        # ~10-15 ms per dense select at 1080p).
        graph.create_buffer("initial_ris_p_hat", (h, w))
        graph.create_buffer("temporal_reuse_p_hat", (h, w))

        # 3. initial RIS (restir/initial_ris.rgen).
        def initial_ris(res, scene, view, u):
            state = _rng_for(view, (h, w))
            hit_pos = res["gbuffer_position"][..., :3]
            state, r, p_hat = restir_ops.initial_ris_pass(
                scene, state, hit_pos, view.num_lights,
                view.max_num_lights_used,
                cfg.ris_candidates, return_p_hat=True,
            )
            out = _write_reservoir("initial_ris_reservoirs", r)
            out["initial_ris_p_hat"] = p_hat
            return out

        pb = (
            graph.add_pass("initial_ris")
            .read("gbuffer_position")
            .write("initial_ris_p_hat")
        )
        for f in _RES_FIELDS:
            pb.write(f"initial_ris_reservoirs_{f}")
        pb.render(initial_ris).build()

        # 4. temporal reuse (restir/temporal_reuse.rgen).
        def temporal(res, scene, view, u):
            state = _rng_for(view, (h, w)) * jnp.uint32(9781) + jnp.uint32(1)
            hit_pos = res["gbuffer_position"][..., :3]
            initial = _read_reservoir(res, "initial_ris_reservoirs")
            prev = _read_reservoir(res, "spatial_reuse_reservoirs")
            state, out, p_hat = restir_ops.temporal_reuse_pass(
                scene, state, hit_pos, initial, prev,
                view.prev_frame_projection_view, view.temporal_reuse_enabled,
                p_hat_initial=res["initial_ris_p_hat"], return_p_hat=True,
            )
            writes = _write_reservoir("temporal_reuse_reservoirs", out)
            writes["temporal_reuse_p_hat"] = p_hat
            return writes

        pb = (
            graph.add_pass("temporal_reuse")
            .read("gbuffer_position").read("initial_ris_p_hat")
            .write("temporal_reuse_p_hat")
        )
        for f in _RES_FIELDS:
            pb.write(f"temporal_reuse_reservoirs_{f}")
        pb.render(temporal).build()

        # 5. spatial reuse (restir/spatial_reuse.rgen).
        def spatial(res, scene, view, u):
            state = _rng_for(view, (h, w)) * jnp.uint32(6271) + jnp.uint32(1)
            hit_pos = res["gbuffer_position"][..., :3]
            temporal_r = _read_reservoir(res, "temporal_reuse_reservoirs")
            state, out = restir_ops.spatial_reuse_pass(
                scene, state, hit_pos, temporal_r, view.spatial_reuse_enabled,
                cfg.spatial_neighbors, cfg.spatial_radius,
                p_hat_temporal=res["temporal_reuse_p_hat"],
            )
            return _write_reservoir("spatial_reuse_reservoirs", out)

        pb = (
            graph.add_pass("spatial_reuse")
            .read("gbuffer_position").read("temporal_reuse_p_hat")
        )
        for f in _RES_FIELDS:
            pb.write(f"spatial_reuse_reservoirs_{f}")
        pb.render(spatial).build()

    # 6. reference PT with reservoir NEE (mod.rs:345-358, reference.rgen).
    closest = bvh_ops.make_closest_hit(scene_bvh,
                                       compact_window=cfg.compact_window,
                                       compact_order=cfg.compact_order)
    any_hit = bvh_ops.make_any_hit(
        scene_bvh,
        compact_window=getattr(cfg, "compact_window_any",
                               cfg.compact_window),
        compact_order=cfg.compact_order, seed_rows=cfg.seed_rows)
    use_cubemap_sky = cfg.sky_mode == "cubemap"

    def reference_pt(res, scene, view, u):
        reservoirs = (None if skip_restir
                      else _read_reservoir(res, "spatial_reuse_reservoirs"))
        sky_fn = None
        if use_cubemap_sky:
            from rust_renderer_tpu.ops.cubemap import sample_cubemap

            env = res["env_cubemap_mip0"]

            def sky_fn(origin, direction, view):
                s = sample_cubemap(env, direction)
                return jnp.where((view.sky_enabled == 1)[..., None], s, 0.0)

        dyn = dynamic_fn(res, view) if dynamic_fn is not None else None
        result = pathtrace_ops.path_trace(
            scene, view, cfg, res["accumulation_image"],
            reservoirs=reservoirs, closest_hit=closest, any_hit=any_hit,
            sky_fn=sky_fn, dynamic=dyn,
        )
        return {
            "pt_output": result.output,
            "accumulation_image": result.accumulation,
            "pt_rays": result.rays_traced,
        }

    builder = (
        graph.add_pass("reference_pt")
        .read("accumulation_image")
        .write("pt_output").write("accumulation_image").write("pt_rays")
        .render(reference_pt)
    )
    if getattr(cfg, "split_pt_program", False):
        # Own XLA program: the bounce loop dominates the monolithic frame
        # program's remote-compile time, so isolating it shrinks every
        # structure variant's compile (StaticConfig.split_pt_program).
        builder.isolate()
    for name in mc_reads:
        builder.read(name)
    builder.build()

    # 7. present blit (mod.rs:360-374, blit.frag — PT output is already sRGB).
    graph.create_texture("present_output", w, h, 3)

    def blit(res, scene, view, u):
        return {"present_output": res["pt_output"]}

    graph.add_pass("reference_pt_present").read("pt_output").write(
        "present_output"
    ).render(blit).build()


def build_hybrid_render_graph(graph: Graph, *args, **kwargs) -> None:
    """Empty stub, like the reference (mod.rs:377-391)."""


def build_minimal_forward_render_graph(
    graph: Graph, cfg, camera, scene_bvh, sun_dir,
    shadows_enabled: bool = True, shadow_map_size: int | None = None,
) -> None:
    """Minimal forward graph (mod.rs:393-433)."""
    w, h = cfg.width, cfg.height
    size = shadow_map_size or cfg.shadow_map_size
    matrices, splits = setup_shadow_pass(
        graph, camera, sun_dir, shadows_enabled, size, cfg.shadow_cascade_count
    )
    # No atmosphere pass: the reference's minimal graph is shadow -> forward
    # -> present only (mod.rs:393-433); sky stays at the clear color.
    setup_forward_pass(graph, cfg, w, h, matrices, splits, scene_bvh=scene_bvh)
    setup_present_pass(graph, w, h, source="forward_output")
