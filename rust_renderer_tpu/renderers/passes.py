"""Per-effect pass setup functions (rebuild of utopian/src/renderers/*.rs).

Each `setup_*_pass` records one pass into the Graph; pass bodies are pure
functions over the resource dict. Resource names mirror the reference's
debug-name cache keys (gbuffer_position, shadow_map, ssao_output, ...).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rust_renderer_tpu.graph import Graph
from rust_renderer_tpu.ops import (
    atmosphere as atmosphere_ops,
    bvh as bvh_ops,
    fxaa as fxaa_ops,
    gbuffer as gbuffer_ops,
    ibl as ibl_ops,
    pbr as pbr_ops,
    raster as raster_ops,
    shadow as shadow_ops,
    ssao as ssao_ops,
)
from rust_renderer_tpu.ops.colors import linear_to_srgb
from rust_renderer_tpu.ops.raster import VisibilityBuffer


# -- gbuffer (renderers/gbuffer.rs) ------------------------------------------


def setup_gbuffer_pass(graph: Graph, scene_bvh, width: int, height: int,
                       use_raycast: bool = True,
                       dynamic_fn=None, dynamic_reads=(),
                       mc_color=(0.0, 1.0, 0.0, 1.0)) -> None:
    """MRT gbuffer from all scene meshes (gbuffer.rs:32-51). Visibility via
    BVH primary rays (default, scalable) or the software rasterizer.

    dynamic_fn(res, view) -> ops.mc_bvh.DynamicScene adds per-frame geometry
    (the marching-cubes isosurface) to the primary-ray visibility — the
    PT-graph analog of the reference tracing MC through its rebuilt TLAS."""
    for name in ("gbuffer_position", "gbuffer_normal", "gbuffer_albedo", "gbuffer_pbr"):
        graph.create_texture(name, width, height, 4, clear=1.0)
    graph.create_texture("gbuffer_depth", width, height, 1, clear=1.0)

    def render(res, scene, view, u):
        if use_raycast:
            from rust_renderer_tpu.ops import rays as rayops

            py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
            px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
            o, d = rayops.generate_camera_rays(
                view.inverse_view, view.inverse_projection, px, py, width, height
            )
            closest = bvh_ops.make_closest_hit(scene_bvh)
            if dynamic_fn is not None:
                from rust_renderer_tpu.ops import mc_bvh

                dyn = dynamic_fn(res, view)
                hit = mc_bvh.combine_closest_hit(closest, dyn)(scene, o, d)
                gb = gbuffer_ops.from_rays(
                    scene, hit, o, d,
                    projection_view=view.projection @ view.view,
                )
                gb = mc_bvh.patch_gbuffer(dyn, hit, d, gb, mc_color)
            else:
                hit = closest(scene, o, d)
                gb = gbuffer_ops.from_rays(
                    scene, hit, o, d,
                    projection_view=view.projection @ view.view,
                )
        else:
            clip = raster_ops.transform_vertices(
                scene.positions, view.projection @ view.view
            )
            vis = raster_ops.rasterize(clip, scene.indices, width, height)
            gb = gbuffer_ops.from_visibility(scene, vis)
        return {
            "gbuffer_position": gb.position,
            "gbuffer_normal": gb.normal,
            "gbuffer_albedo": gb.albedo,
            "gbuffer_pbr": gb.pbr,
            "gbuffer_depth": gb.depth,
        }

    builder = (
        graph.add_pass("gbuffer")
        .write("gbuffer_position").write("gbuffer_normal")
        .write("gbuffer_albedo").write("gbuffer_pbr").write("gbuffer_depth")
        .render(render)
    )
    for name in dynamic_reads:
        builder.read(name)
    builder.build()


# -- shadow cascades (renderers/shadow.rs) -----------------------------------


def setup_shadow_pass(
    graph: Graph, camera, sun_dir: np.ndarray, enabled: bool,
    size: int = 1024, cascade_count: int = 4,
):
    """4-cascade CSM (shadow.rs:24-131): host-side cascade fitting, one
    depth-only raster per cascade layer. Returns (matrices, split_depths)."""
    graph.create_buffer("shadow_map", (cascade_count, size, size), clear=1.0)

    matrices, split_depths = shadow_ops.cascade_matrices(
        camera.get_view(), camera.get_projection(),
        camera.get_near_plane(), camera.get_far_plane(),
        np.asarray(sun_dir, np.float32), cascade_count,
    )

    def render(res, scene, view, u):
        if not enabled:
            return {"shadow_map": jnp.ones((cascade_count, size, size), jnp.float32)}
        layers = []
        for i in range(cascade_count):
            clip = raster_ops.transform_vertices(scene.positions, u["cascade_vp"][i])
            layers.append(raster_ops.rasterize_depth(clip, scene.indices, size, size))
        return {"shadow_map": jnp.stack(layers)}

    (
        graph.add_pass("shadow")
        .write("shadow_map")
        .uniforms("cascade_vp", jnp.asarray(matrices))
        .render(render)
        .build()
    )
    return matrices, split_depths


# -- SSAO (renderers/ssao.rs) -------------------------------------------------


def setup_ssao_pass(graph: Graph, width: int, height: int,
                    radius: float = 0.3, bias: float = 0.025) -> None:
    graph.create_texture("ssao_output", width, height, 1, clear=1.0)

    def render(res, scene, view, u):
        # Shift-stencil formulation: the exact form's 32·W·H dynamic tap
        # coordinates hit the ~9 ns/index gather floor (~600 ms @1080p);
        # the stencil form is dense VPU selects over static shifted planes
        # (ops/ssao.py ssao_stencil — the FXAA re-design applied to SSAO).
        occ = ssao_ops.ssao_stencil(
            res["gbuffer_position"], res["gbuffer_normal"],
            view.view, view.projection, u["radius"], u["bias"],
        )
        occ = jnp.where(view.ssao_enabled == 1, occ, jnp.ones_like(occ))
        return {"ssao_output": occ}

    (
        graph.add_pass("ssao")
        .read("gbuffer_position").read("gbuffer_normal")
        .write("ssao_output")
        .uniforms("radius", jnp.float32(radius))
        .uniforms("bias", jnp.float32(bias))
        .render(render)
        .build()
    )


# -- environment / IBL (renderers/ibl.rs) -------------------------------------


def setup_environment_passes(graph: Graph, cfg, sun_dir) -> None:
    """Cubemap capture + irradiance + specular prefilter + BRDF LUT; recorded
    only when the environment needs (re)computation (ibl.rs:63-66).
    Outputs are persistent resources reused every frame after."""
    mips = cfg.cubemap_mips
    for m in range(mips):
        s = max(cfg.cubemap_size >> m, 1)
        graph.create_buffer(f"env_cubemap_mip{m}", (6, s, s, 3), persistent=True)
        graph.create_buffer(f"specular_map_mip{m}", (6, s, s, 3), persistent=True)
    graph.create_buffer(
        "irradiance_map", (6, cfg.irradiance_size, cfg.irradiance_size, 3),
        persistent=True,
    )
    graph.create_buffer("brdf_lut", (cfg.brdf_lut_size, cfg.brdf_lut_size, 2),
                        persistent=True)

    def render(res, scene, view, u):
        chain = ibl_ops.capture_environment_cubemap(
            view.sun_dir, cfg.cubemap_size, mips
        )
        irr = ibl_ops.irradiance_convolution(
            chain[min(2, len(chain) - 1)], cfg.irradiance_size
        )
        spec = ibl_ops.specular_prefilter(chain, mips)
        lut = ibl_ops.brdf_lut(cfg.brdf_lut_size, num_samples=256)
        out = {"irradiance_map": irr, "brdf_lut": lut}
        for m in range(mips):
            out[f"env_cubemap_mip{m}"] = chain[m]
            out[f"specular_map_mip{m}"] = spec[m] if m < len(spec) else chain[m]
        return out

    (
        graph.add_pass("environment")
        .write("irradiance_map").write("brdf_lut")
        .render(render)
        .build()
    )


# -- raytraced shadows / reflections (renderers/rt_shadows.rs, rt_reflections.rs)


def setup_rt_shadows_pass(graph: Graph, scene_bvh, cfg,
                          width: int, height: int) -> None:
    """1 sun-visibility ray per gbuffer pixel, binary R8 output
    (rt_shadows.rgen). Camera-coherent occlusion queries are the
    occluder-seed sweet spot (tools/eval_seed.py: 97.6% killed pre-walk
    by the K=4 largest-area rows), so cfg.seed_rows applies here too."""
    graph.create_texture("rt_shadows", width, height, 1, clear=1.0)

    def render(res, scene, view, u):
        from rust_renderer_tpu.ops import rays as rayops

        pos = res["gbuffer_position"][..., :3]
        normal = res["gbuffer_normal"][..., :3]
        origin = rayops.offset_ray(pos, normal)
        sun = view.sun_dir / jnp.linalg.norm(view.sun_dir)
        occluded = bvh_ops.make_any_hit(scene_bvh, seed_rows=cfg.seed_rows)(
            scene, origin, jnp.broadcast_to(sun, origin.shape)
        )
        is_sky = jnp.all(res["gbuffer_position"][..., :3] == 1.0, axis=-1)
        vis = jnp.where(jnp.logical_or(jnp.logical_not(occluded), is_sky), 1.0, 0.0)
        return {"rt_shadows": vis}

    (
        graph.add_pass("rt_shadows")
        .read("gbuffer_position").read("gbuffer_normal")
        .write("rt_shadows")
        .render(render)
        .build()
    )


def setup_rt_reflections_pass(graph: Graph, scene_bvh, cfg,
                              width: int, height: int) -> None:
    """Mirror reflections for metal pixels (rt_reflections.rgen): reflect the
    eye ray, 1 bounce; hit shades with IBL; miss = atmosphere.

    Only metal pixels trace (rt_reflections.rgen:10-20 early-outs on
    raytrace_properties.x != 1): non-metal lanes get a zero direction, which
    the traversal's degenerate-ray guard retires on entry — fully-non-metal
    packets exit in one step, so traversal cost tracks metal coverage."""
    graph.create_texture("rt_reflections", width, height, 4, clear=0.0)

    def render(res, scene, view, u):
        from rust_renderer_tpu.ops import rays as rayops

        pos = res["gbuffer_position"][..., :3]
        normal = res["gbuffer_normal"][..., :3]
        material = res["gbuffer_pbr"][..., 3].astype(jnp.int32)
        material = jnp.clip(material, 0, scene.mat_rt_type.shape[0] - 1)
        is_metal = scene.mat_rt_type[material] == 1
        eye_dir = pos - view.eye_pos
        eye_dir = eye_dir / jnp.maximum(
            jnp.linalg.norm(eye_dir, axis=-1, keepdims=True), 1e-9
        )
        rdir = rayops.reflect(eye_dir, normal)
        rdir = jnp.where(is_metal[..., None], rdir, 0.0)
        origin = rayops.offset_ray(pos, normal)
        hit = bvh_ops.make_closest_hit(scene_bvh)(scene, origin, rdir)
        gb = gbuffer_ops.from_rays(scene, hit, origin, rdir)

        pixel = pbr_ops.PixelParams(
            position=gb.position[..., :3],
            base_color=gb.albedo[..., :3],
            normal=gb.normal[..., :3],
            metallic=gb.pbr[..., 0],
            roughness=gb.pbr[..., 1],
            occlusion=gb.pbr[..., 2],
        )
        spec_chain = [res[f"specular_map_mip{m}"] for m in range(cfg.cubemap_mips)]
        shaded = pbr_ops.image_based_lighting(
            pixel, view.eye_pos, res["irradiance_map"], spec_chain, res["brdf_lut"]
        )
        sky = atmosphere_ops.sky_radiance(
            origin,
            jnp.where(is_metal[..., None], rdir, jnp.asarray([0.0, 1.0, 0.0])),
            view.sun_dir / jnp.linalg.norm(view.sun_dir), view.sky_enabled,
        )
        color = jnp.where(hit.is_hit[..., None], shaded, sky)
        color = jnp.where(is_metal[..., None], color, 0.0)
        out = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
        return {"rt_reflections": out}

    (
        graph.add_pass("rt_reflections")
        .read("gbuffer_position").read("gbuffer_normal").read("gbuffer_pbr")
        .read("irradiance_map").read("brdf_lut")
        .write("rt_reflections")
        .render(render)
        .build()
    )


# -- deferred composite (renderers/deferred.rs + deferred.frag) ----------------


def setup_deferred_pass(graph: Graph, cfg, width: int, height: int,
                        cascade_matrices, cascade_splits) -> None:
    graph.create_texture("deferred_output", width, height, 4, clear=0.0)

    def render(res, scene, view, u):
        gb_pos = res["gbuffer_position"]
        gb_norm = res["gbuffer_normal"]
        gb_alb = res["gbuffer_albedo"]
        gb_pbr = res["gbuffer_pbr"]

        material = gb_pbr[..., 3].astype(jnp.int32)
        material = jnp.clip(material, 0, scene.mat_roughness.shape[0] - 1)
        roughness = gb_pbr[..., 1] * scene.mat_roughness[material]
        metallic = gb_pbr[..., 0] * scene.mat_metallic[material]
        base_color = (
            jnp.power(jnp.maximum(gb_alb[..., :3], 0.0), 2.2)
            * scene.mat_base_color[material][..., :3]
        )

        pixel = pbr_ops.PixelParams(
            position=gb_pos[..., :3],
            base_color=base_color,
            normal=gb_norm[..., :3],
            metallic=metallic,
            roughness=roughness,
            occlusion=gb_pbr[..., 2],
        )

        lo = pbr_ops.shade_all_lights(pixel, scene, view)

        ambient_flat = 0.03 * base_color * gb_pbr[..., 2:3]
        spec_chain = [res[f"specular_map_mip{m}"] for m in range(cfg.cubemap_mips)]
        ambient_ibl = pbr_ops.image_based_lighting(
            pixel, view.eye_pos, res["irradiance_map"], spec_chain, res["brdf_lut"]
        )
        ambient = jnp.where((view.ibl_enabled == 1)[..., None], ambient_ibl, ambient_flat)

        color = ambient + lo

        # RT reflections override for metal materials (deferred.frag:92-95).
        rt_type = scene.mat_rt_type[material]
        is_metal = jnp.logical_and(view.raytracing_supported == 1, rt_type == 1)
        color = jnp.where(is_metal[..., None], res["rt_reflections"][..., :3], color)

        # Shadows: CSM when enabled, else RT shadows (deferred.frag:97-111).
        csm, cascade = shadow_ops.calculate_shadow(
            gb_pos[..., :3], view.view, res["shadow_map"],
            u["cascade_vp"], u["cascade_splits"],
        )
        rt_sh = jnp.maximum(res["rt_shadows"], 0.3)
        shadow = jnp.where(
            view.shadows_enabled == 1,
            csm,
            jnp.where(view.raytracing_supported == 1, rt_sh, 1.0),
        )
        color = color * shadow[..., None]
        # CASCADE_DEBUG tint (deferred.frag:104-107), a runtime toggle here
        # (traced flag) instead of the reference's recompile-me #define.
        cascade_tint = jnp.logical_and(
            view.shadows_enabled == 1, view.cascade_debug == 1
        )
        color = jnp.where(
            cascade_tint[..., None],
            color * shadow_ops.cascade_debug_color(cascade), color,
        )

        ssao_term = jnp.where(view.ssao_enabled == 1, res["ssao_output"], 1.0)
        color = color * ssao_term[..., None]

        out = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
        return {"deferred_output": out}

    (
        graph.add_pass("deferred")
        .read("gbuffer_position").read("gbuffer_normal").read("gbuffer_albedo")
        .read("gbuffer_pbr").read("shadow_map").read("rt_shadows")
        .read("rt_reflections").read("ssao_output").read("irradiance_map")
        .read("brdf_lut")
        .write("deferred_output")
        .uniforms("cascade_vp", jnp.asarray(cascade_matrices))
        .uniforms("cascade_splits", jnp.asarray(cascade_splits))
        .render(render)
        .build()
    )


# -- atmosphere / sky (renderers/atmosphere.rs) --------------------------------


def setup_atmosphere_pass(graph: Graph, cfg, width: int, height: int,
                          target: str = "deferred_output") -> None:
    """Sky where no geometry was rasterized (the reference draws a sky dome
    depth-tested behind the scene, atmosphere.rs:19-69); samples the captured
    env cubemap at LOD 2 when cubemap_enabled, else integrates live."""

    def render(res, scene, view, u):
        from rust_renderer_tpu.ops import rays as rayops
        from rust_renderer_tpu.ops.cubemap import sample_cubemap

        py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
        px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
        o, d = rayops.generate_camera_rays(
            view.inverse_view, view.inverse_projection, px, py, width, height
        )
        sun = view.sun_dir / jnp.linalg.norm(view.sun_dir)
        live = atmosphere_ops.sky_radiance(o, d, sun, view.sky_enabled)
        mip = min(2, cfg.cubemap_mips - 1)  # LOD 2 (atmosphere.frag)
        cached = sample_cubemap(res[f"env_cubemap_mip{mip}"], d)
        cached = jnp.where((view.sky_enabled == 1)[..., None], cached, 0.0)
        sky = jnp.where((view.cubemap_enabled == 1)[..., None], cached, live)

        is_sky = res["gbuffer_depth"] >= 1.0
        color = res[target]
        out = jnp.where(
            is_sky[..., None],
            jnp.concatenate([sky, jnp.ones_like(sky[..., :1])], -1),
            color,
        )
        return {target: out}

    (
        graph.add_pass("atmosphere")
        .read("gbuffer_depth").read(f"env_cubemap_mip{min(2, cfg.cubemap_mips - 1)}")
        .write(target)
        .render(render)
        .build()
    )


# -- marching cubes (renderers/marching_cubes.rs) ------------------------------


def setup_marching_cubes_pass(
    graph: Graph, cfg, width: int, height: int,
    target: str = "deferred_output", voxel_size: float | None = None,
    color=(0.0, 1.0, 0.0, 1.0), flat_normals: bool = False,
) -> None:
    """32^3 isosurface extraction + forward draw with depth test against the
    scene (marching_cubes.rs:63-135: reset_counter -> compute dispatch ->
    cmd_draw_indirect). The indirect draw becomes: extract with capacity+mask,
    rasterize the slots (degenerate slots cover nothing), depth-test against
    gbuffer depth, lambert-shade with the pass color.

    voxel_size defaults to 32/cfg.mc_grid so the world-space domain is the
    reference's fixed [0,32]^3 (marching_cubes.comp density features) at any
    grid resolution — mc_grid only controls tessellation."""
    from rust_renderer_tpu.ops import marching_cubes as mc_ops

    if voxel_size is None:
        voxel_size = 32.0 / cfg.mc_grid

    graph.create_buffer("marching_cubes_draw_count", (1,), dtype=jnp.int32)

    def render(res, scene, view, u):
        result = mc_ops.marching_cubes(
            grid=cfg.mc_grid, voxel_size=voxel_size, time=view.time,
            flat_normals=flat_normals,
        )
        # Rasterize extracted triangles against the existing depth buffer.
        t = result.positions.shape[0]
        verts = result.positions.reshape(-1, 3)
        mvp = view.projection @ view.view
        clip = raster_ops.transform_vertices(verts, mvp)
        idx = jnp.arange(t * 3, dtype=jnp.int32).reshape(-1, 3)
        init = VisibilityBuffer(
            depth=res["gbuffer_depth"],
            tri=jnp.full((height, width), -1, jnp.int32),
            bary_u=jnp.zeros((height, width), jnp.float32),
            bary_v=jnp.zeros((height, width), jnp.float32),
        )
        vis = raster_ops.rasterize(clip, idx, width, height, init=init)
        covered = vis.tri >= 0

        normals = raster_ops.interpolate(vis, idx, result.normals.reshape(-1, 3))
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-9
        )
        sun = view.sun_dir / jnp.linalg.norm(view.sun_dir)
        ndotl = jnp.maximum(jnp.sum(normals * sun, axis=-1), 0.0)
        base = jnp.asarray(u["color"])[:3]
        shaded = base * (0.2 + 0.8 * ndotl[..., None])

        out = res[target]
        out = jnp.where(
            covered[..., None],
            jnp.concatenate([shaded, jnp.ones_like(ndotl)[..., None]], -1),
            out,
        )
        enabled = (view.marching_cubes_enabled == 1)[..., None]
        out = jnp.where(enabled, out, res[target])
        return {
            target: out,
            "gbuffer_depth": jnp.where(
                jnp.logical_and(covered, view.marching_cubes_enabled == 1),
                vis.depth, res["gbuffer_depth"],
            ),
            "marching_cubes_draw_count": result.vertex_count[None],
        }

    (
        graph.add_pass("marching_cubes")
        .read("gbuffer_depth").write(target).write("marching_cubes_draw_count")
        .uniforms("color", jnp.asarray(color, jnp.float32))
        .render(render)
        .build()
    )


# -- present (renderers/present.rs) --------------------------------------------


def setup_present_pass(graph: Graph, width: int, height: int,
                       source: str = "deferred_output",
                       fxaa_threshold: float = 0.45) -> None:
    """Fullscreen composite: FXAA (toggle) + linear->sRGB (present.frag)."""
    graph.create_texture("present_output", width, height, 3, clear=0.0)

    def render(res, scene, view, u):
        color = linear_to_srgb(jnp.maximum(res[source][..., :3], 0.0))
        color = fxaa_ops.fxaa(
            color, u["threshold"], view.fxaa_enabled, view.fxaa_debug
        )
        return {"present_output": color}

    (
        graph.add_pass("present")
        .read(source)
        .write("present_output")
        .uniforms("threshold", jnp.float32(fxaa_threshold))
        .render(render)
        .build()
    )


# -- forward (renderers/forward.rs, minimal mode) ------------------------------


def setup_forward_pass(graph: Graph, cfg, width: int, height: int,
                       cascade_matrices, cascade_splits,
                       scene_bvh=None) -> None:
    """Forward PBR + CSM (forward.vert/.frag). Visibility via the software
    rasterizer, or BVH primary rays when `scene_bvh` is given (identical
    image; the O(pixels x tris) rasterizer is for small meshes / cascades)."""
    graph.create_texture("forward_output", width, height, 4, clear=0.0)

    def render(res, scene, view, u):
        if scene_bvh is not None:
            from rust_renderer_tpu.ops import rays as rayops

            py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
            px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
            o, d = rayops.generate_camera_rays(
                view.inverse_view, view.inverse_projection, px, py, width, height
            )
            hit = bvh_ops.make_closest_hit(scene_bvh)(scene, o, d)
            gb = gbuffer_ops.from_rays(
                scene, hit, o, d, projection_view=view.projection @ view.view
            )
            vis_tri = jnp.where(hit.is_hit, hit.prim, -1)
            vis = VisibilityBuffer(
                depth=gb.depth, tri=vis_tri,
                bary_u=hit.u, bary_v=hit.v,
            )
        else:
            clip = raster_ops.transform_vertices(
                scene.positions, view.projection @ view.view
            )
            vis = raster_ops.rasterize(clip, scene.indices, width, height)
            gb = gbuffer_ops.from_visibility(scene, vis)

        material = jnp.clip(
            gb.pbr[..., 3].astype(jnp.int32), 0, scene.mat_roughness.shape[0] - 1
        )
        pixel = pbr_ops.PixelParams(
            position=gb.position[..., :3],
            base_color=jnp.power(jnp.maximum(gb.albedo[..., :3], 0.0), 2.2)
            * scene.mat_base_color[material][..., :3],
            normal=gb.normal[..., :3],
            metallic=gb.pbr[..., 0] * scene.mat_metallic[material],
            roughness=gb.pbr[..., 1] * scene.mat_roughness[material],
            occlusion=gb.pbr[..., 2],
        )
        lo = pbr_ops.shade_all_lights(pixel, scene, view)
        ambient = 0.03 * pixel.base_color * pixel.occlusion[..., None]
        color = ambient + lo

        csm, _ = shadow_ops.calculate_shadow(
            gb.position[..., :3], view.view, res["shadow_map"],
            u["cascade_vp"], u["cascade_splits"],
        )
        shadow = jnp.where(view.shadows_enabled == 1, csm, 1.0)
        color = color * shadow[..., None]
        covered = (vis.tri >= 0)[..., None]
        color = jnp.where(covered, color, 0.0)
        out = jnp.concatenate([color, jnp.ones_like(color[..., :1])], axis=-1)
        return {"forward_output": out, "gbuffer_depth": vis.depth}

    graph.create_texture("gbuffer_depth", width, height, 1, clear=1.0)
    (
        graph.add_pass("forward")
        .read("shadow_map")
        .write("forward_output").write("gbuffer_depth")
        .uniforms("cascade_vp", jnp.asarray(cascade_matrices))
        .uniforms("cascade_splits", jnp.asarray(cascade_splits))
        .render(render)
        .build()
    )
