"""Marching-cubes isosurface in the path-traced scene (BASELINE config 5).

Covers ops/mc_bvh.py (static-topology device-refit BVH over the MC grid) and
its integration into the PT graph: the dynamic tree must agree with
brute-force intersection of the extracted triangles, dynamic hits must shade
with MC normals/material, and the traced image must CHANGE frame to frame as
the isosurface animates (the reference rebuilds its TLAS per frame,
raytracing.rs:400-459).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


GRID = 8


def _mc_result(time=0.0, grid=GRID):
    from rust_renderer_tpu.ops import marching_cubes as mc

    # Scale the reference SDF's feature region (~[0,32]) into the test grid.
    def density(pos, t):
        return mc.default_density(pos * (32.0 / grid), t)

    return mc.marching_cubes(density_fn=density, grid=grid, time=time)


def _brute_closest(positions, valid, o, d, t_min=1e-3, t_max=1e4):
    """Reference: exhaustive Möller-Trumbore over the slot-major MC array."""
    v0 = positions[:, 0]
    e1 = positions[:, 1] - v0
    e2 = positions[:, 2] - v0
    ox = o[:, None, :]
    dx = d[:, None, :]
    pvec = np.cross(dx, e2[None])
    det = np.sum(e1[None] * pvec, axis=-1)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = ox - v0[None]
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1[None])
    v = np.sum(dx * qvec, -1) * inv
    t = np.sum(e2[None] * qvec, -1) * inv
    ok = (
        valid[None]
        & (np.abs(det) > 1e-12)
        & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min) & (t < t_max)
    )
    t = np.where(ok, t, np.inf)
    arg = np.argmin(t, axis=1)
    tb = t[np.arange(len(o)), arg]
    return tb, np.where(np.isfinite(tb), arg, -1)


def test_dynamic_bvh_matches_bruteforce():
    from rust_renderer_tpu.ops import mc_bvh

    res = _mc_result(time=1.7)
    assert int(np.sum(np.asarray(res.valid))) > 50, "SDF emitted no surface"
    dyn = mc_bvh.build_dynamic_scene(res, GRID, material_id=0)

    rng = np.random.default_rng(11)
    n = 512
    center = np.full(3, GRID / 2.0, np.float32)
    o = (center + rng.normal(0, GRID, (n, 3))).astype(np.float32)
    d = (center + rng.normal(0, GRID / 3, (n, 3)) - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, prim, u, v = mc_bvh._dyn_traverse(
        dyn, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4
    )
    t = np.asarray(t)
    prim = np.asarray(prim)

    tb, primb = _brute_closest(
        np.asarray(res.positions), np.asarray(res.valid), o, d
    )
    hit = np.isfinite(tb)
    assert hit.sum() > 30, "test rays barely hit the surface"
    assert np.array_equal(np.asarray(prim >= 0) & np.isfinite(t), hit)
    np.testing.assert_allclose(t[hit], tb[hit], rtol=1e-4, atol=1e-4)
    # Same triangle except exact-tie cases.
    agree = (prim[hit] == primb[hit]).mean()
    assert agree > 0.99


def test_dynamic_bvh_row_kernel_matches():
    """The paired-row dynamic tree qualifies for the production row-cursor
    kernel (round-5 layout: 2 morton-adjacent cells per 512 B leaf row +
    wnode_meta from the static topology). On CPU _dyn_traverse falls back
    to the XLA walk, so this drives the Pallas row path in interpret mode
    explicitly and checks it against brute force."""
    from rust_renderer_tpu.ops import mc_bvh
    from tests.test_pallas_traversal import _pallas_traverse

    res = _mc_result(time=1.7)
    dyn = mc_bvh.build_dynamic_scene(res, GRID, material_id=0)
    assert dyn.bvh.wnode_meta is not None

    rng = np.random.default_rng(13)
    n = 1024
    center = np.full(3, GRID / 2.0, np.float32)
    o = (center + rng.normal(0, GRID, (n, 3))).astype(np.float32)
    d = (center + rng.normal(0, GRID / 3, (n, 3)) - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    t, prim, _, _ = _pallas_traverse(dyn.bvh, o, d, row_cursors=8,
                                     skip_drain=True)
    t, prim = np.asarray(t), np.asarray(prim)
    tb, _ = _brute_closest(np.asarray(res.positions), np.asarray(res.valid),
                           np.asarray(o), np.asarray(d))
    hit = np.isfinite(tb)
    assert hit.sum() > 60
    np.testing.assert_array_equal(prim >= 0, hit)
    np.testing.assert_allclose(t[hit], tb[hit], rtol=1e-4, atol=1e-4)

    ta, pa, _, _ = _pallas_traverse(dyn.bvh, o, d, any_hit=True,
                                    row_cursors=8, skip_drain=True,
                                    skip_expand=True)
    np.testing.assert_array_equal(np.asarray(pa) >= 0, hit)


def test_dynamic_any_hit():
    from rust_renderer_tpu.ops import mc_bvh

    res = _mc_result(time=1.7)
    dyn = mc_bvh.build_dynamic_scene(res, GRID, material_id=0)

    rng = np.random.default_rng(3)
    n = 256
    center = np.full(3, GRID / 2.0, np.float32)
    o = (center + rng.normal(0, GRID, (n, 3))).astype(np.float32)
    d = (center + rng.normal(0, GRID / 3, (n, 3)) - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, prim, _, _ = mc_bvh._dyn_traverse(
        dyn, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4, any_hit=True
    )
    tb, _ = _brute_closest(np.asarray(res.positions), np.asarray(res.valid), o, d)
    np.testing.assert_array_equal(np.asarray(prim) >= 0, np.isfinite(tb))


def test_pt_graph_traces_animated_isosurface():
    """PT frames with MC enabled: the isosurface is visible (dynamic-material
    pixels exist in the gbuffer) and the geometry CHANGES between frames as
    the sphere pulses."""
    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models import create_cornell_box_scene
    from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig

    size = 64
    cfg = StaticConfig(
        shadow_map_size=64, cubemap_size=16, cubemap_mips=2,
        irradiance_size=8, brdf_lut_size=16, num_bounces=2, mc_grid=GRID,
    )
    app = Application(size, size, RenderGraphMode.PATH_TRACED, cfg)

    # One point light keeps the direct-lighting chain in the graph — the
    # zero-light fast path (renderers/__init__.py skip_restir) otherwise
    # builds the PT graph WITHOUT the gbuffer this test inspects.
    def scene_with_light(renderer, camera):
        create_cornell_box_scene(renderer, camera)
        renderer.add_light([0.0, 1.9, 0.0], [1.0, 1.0, 1.0])

    app.create_scene(scene_with_light)
    app.view = app.view.replace(marching_cubes_enabled=np.uint32(1))
    # Aim the camera at the MC region — the graph extracts over the fixed
    # [0,32]^3 world domain at any mc_grid tessellation.
    app.camera.set_position_target([58.0, 38.0, 58.0], [10.0, 18.0, 10.0])

    app.run(num_frames=1)
    mat_plane0 = np.asarray(app.graph.render(app.scene, app.view)["gbuffer_pbr"])[..., 3]
    mc_mat = app.renderer.ensure_mc_material()
    count0 = int((mat_plane0 == mc_mat).sum())
    assert count0 > 20, f"MC surface not visible in PT gbuffer ({count0} px)"

    # Advance time: the pulsing-sphere SDF must change the traced geometry.
    draw0 = int(np.asarray(app.graph.state.get("marching_cubes_draw_count",
                                               app.graph.render(app.scene, app.view)["marching_cubes_draw_count"]))[0])
    app.view = app.view.replace(time=np.float32(4.0))
    res1 = app.graph.render(app.scene, app.view)
    draw1 = int(np.asarray(res1["marching_cubes_draw_count"])[0])
    assert draw0 != draw1, "isosurface did not animate with time"

    # Toggle off: no MC pixels.
    app.view = app.view.replace(marching_cubes_enabled=np.uint32(0))
    app.render_frame()
    mat_plane_off = np.asarray(
        app.graph.render(app.scene, app.view)["gbuffer_pbr"]
    )[..., 3]
    assert int((mat_plane_off == mc_mat).sum()) == 0
