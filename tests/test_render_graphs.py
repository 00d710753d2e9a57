"""End-to-end render-graph tests for all modes (small resolutions)."""

import numpy as np
import jax.numpy as jnp
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.app.main import Application
from rust_renderer_tpu.models import create_rtiow_scene
from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.renderers import (
    build_minimal_forward_render_graph,
    build_path_tracing_render_graph,
    build_render_graph,
)
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.settings import RenderGraphMode, RenderSettings, StaticConfig
from rust_renderer_tpu.utils import math3d

W = H = 32
CFG = StaticConfig(
    width=W, height=H, shadow_map_size=64, cubemap_size=16, cubemap_mips=2,
    irradiance_size=8, brdf_lut_size=16, num_bounces=1,
)


@pytest.fixture(scope="module")
def setup():
    r = rt.Renderer()
    cam = rt.Camera([3, 2, 5], [0, 0.5, 0], aspect_ratio=1.0, z_near=0.1, z_far=100.0)
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    r.add_light([2.0, 3.0, 2.0], [1.0, 1.0, 1.0], 1.0)
    scene = r.pack()
    b = bvh_ops.build_scene_bvh(scene)
    view = RenderSettings.default(num_lights=r.get_num_lights()).with_camera(cam, W, H)
    view = view.replace(total_samples=jnp.uint32(1))
    sun = np.array([0.0, 0.90631, 0.42262])
    return r, cam, scene, b, view, sun


def test_rasterized_graph_renders(setup):
    _, cam, scene, b, view, sun = setup
    g = rt.Graph()
    g.new_frame(); g.clear()
    build_render_graph(g, CFG, cam, b, sun, need_environment_update=True)
    res = g.render(scene, view)
    out = np.asarray(res["present_output"])
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    # Sky is brighter at the top than the (shadowed) floor is dark: sanity
    # that geometry and sky both appear.
    assert out[2, W // 2].mean() > 0.1  # sky
    assert (np.asarray(res["gbuffer_depth"]) < 1.0).mean() > 0.3  # geometry
    # Persistent env resources were produced.
    assert float(np.asarray(res["irradiance_map"]).mean()) > 0.0


def test_rasterized_env_cached_second_frame(setup):
    _, cam, scene, b, view, sun = setup
    g = rt.Graph()
    g.new_frame(); g.clear()
    build_render_graph(g, CFG, cam, b, sun, need_environment_update=True)
    res1 = g.render(scene, view)
    irr1 = np.asarray(res1["irradiance_map"])
    g.new_frame(); g.clear()
    build_render_graph(g, CFG, cam, b, sun, need_environment_update=False)
    res2 = g.render(scene, view)
    np.testing.assert_allclose(np.asarray(res2["irradiance_map"]), irr1)


def test_minimal_graph_renders(setup):
    _, cam, scene, b, view, sun = setup
    g = rt.Graph()
    g.new_frame(); g.clear()
    build_minimal_forward_render_graph(g, CFG, cam, b, sun)
    res = g.render(scene, view)
    out = np.asarray(res["present_output"])
    assert np.isfinite(out).all()
    assert out.max() > 0.1  # lit geometry visible


def test_pt_graph_reservoir_feedback(setup):
    """Spatial reservoirs persist across frames and feed temporal reuse."""
    _, cam, scene, b, view, sun = setup
    g = rt.Graph()
    for f in range(1, 3):
        g.new_frame(); g.clear()
        build_path_tracing_render_graph(g, CFG, cam, b, sun)
        res = g.render(scene, view.replace(total_samples=jnp.uint32(f)))
    out = np.asarray(res["present_output"])
    assert np.isfinite(out).all()
    m = np.asarray(g.state["spatial_reuse_reservoirs_M"])
    assert m.max() >= 1  # temporal reuse accumulated reservoir history


def test_pt_graph_zero_lights_skips_restir_bit_identical(setup):
    """With a zero-light scene the direct-lighting chain selects nothing —
    num_lights=0 builds the graph without gbuffer/ReSTIR passes and the
    output must match the full chain bit for bit (every pass re-seeds its
    own RNG, so dropping a pass changes no other pass's stream)."""
    _, cam, _, _, _, sun = setup
    r0 = rt.Renderer()
    cam0 = rt.Camera([3, 2, 5], [0, 0.5, 0], aspect_ratio=1.0,
                     z_near=0.1, z_far=100.0)
    r0.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r0.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    scene0 = r0.pack()
    b0 = bvh_ops.build_scene_bvh(scene0)
    view0 = RenderSettings.default(num_lights=0).with_camera(cam0, W, H)

    def run(num_lights):
        g = rt.Graph()
        outs = []
        for f in range(1, 3):
            g.new_frame(); g.clear()
            build_path_tracing_render_graph(g, CFG, cam0, b0, sun,
                                            num_lights=num_lights)
            res = g.render(scene0, view0.replace(total_samples=jnp.uint32(f)))
            outs.append(np.asarray(res["present_output"]))
        return g, outs

    g_full, full = run(None)
    g_skip, skip = run(0)
    assert any(p.name == "initial_ris" for p in g_full.passes)
    assert not any(p.name == "initial_ris" for p in g_skip.passes)
    assert "spatial_reuse_reservoirs_M" not in g_skip.state
    for a, c in zip(full, skip):
        np.testing.assert_array_equal(a, c)


def test_pt_graph_accumulation_persists(setup):
    _, cam, scene, b, view, sun = setup
    g = rt.Graph()
    outs = []
    for f in range(1, 4):
        g.new_frame(); g.clear()
        build_path_tracing_render_graph(g, CFG, cam, b, sun)
        res = g.render(scene, view.replace(total_samples=jnp.uint32(f)))
        outs.append(np.asarray(res["pt_output"]))
    acc = np.asarray(g.state["accumulation_image"])
    # Accumulation grows with frames (values roughly f x single frame).
    assert acc.mean() > outs[0].mean() * 0.8


def test_pt_graph_split_program_bit_identical(setup):
    """StaticConfig.split_pt_program only changes XLA program boundaries
    (PassBuilder.isolate on reference_pt) — two frames must match the fused
    graph bit for bit, including the persistent reservoir feedback."""
    _, cam, scene, b, view, sun = setup

    def run(cfg):
        g = rt.Graph()
        outs = []
        for f in range(1, 3):
            g.new_frame(); g.clear()
            build_path_tracing_render_graph(g, cfg, cam, b, sun)
            res = g.render(scene, view.replace(total_samples=jnp.uint32(f)))
            outs.append(np.asarray(res["present_output"]))
        return outs

    fused = run(CFG)
    split = run(CFG.replace(split_pt_program=True))
    for a, c in zip(fused, split):
        np.testing.assert_array_equal(a, c)


def test_application_mode_switching():
    cfg = StaticConfig(
        width=W, height=H, shadow_map_size=64, cubemap_size=32, cubemap_mips=3,
        irradiance_size=8, brdf_lut_size=32, num_bounces=2,
    )
    app = Application(W, H, RenderGraphMode.PATH_TRACED, cfg)
    app.create_scene(create_rtiow_scene)
    img1 = app.run(num_frames=2)
    assert img1.shape == (H, W, 3)
    assert app.total_samples == 2

    # Hotkey '4' switches to MINIMAL and resets accumulation (main.rs:415-428).
    app.input.begin_frame()
    app.input.set_key_down("4")
    app.render_frame()
    assert app.render_graph_mode == RenderGraphMode.MINIMAL
    assert app.total_samples == 1  # reset + one new frame


def test_application_camera_move_resets_accumulation():
    cfg = StaticConfig(
        width=16, height=16, shadow_map_size=32, cubemap_size=16, cubemap_mips=2,
        irradiance_size=8, brdf_lut_size=16, num_bounces=2,
    )
    app = Application(16, 16, RenderGraphMode.PATH_TRACED, cfg)
    app.create_scene(create_rtiow_scene)
    app.run(num_frames=3)
    assert app.total_samples == 3
    app.input.begin_frame()
    app.input.set_key_down("w")  # move forward
    app.render_frame()
    app.input.set_key_up("w")
    assert app.total_samples == 1
