"""Debug/diagnostic harnesses: FXAA edge-direction debug, FURNACE_TEST,
cascade debug tint, the NaN sanitizer mode, and the terminal viewer.

Reference analogs: fxaa.glsl:247-258 (debug colors), reference.rmiss:13-28
(FURNACE_TEST define), deferred.frag:104-107 (CASCADE_DEBUG), the Vulkan
validation layer enabled at vulkan_base.rs:170 (sanitizer), and the
winit/egui presentation loop (prototype/src/main.rs:362-552).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rust_renderer_tpu.graph import Graph
from rust_renderer_tpu.ops import fxaa as fxaa_ops
from rust_renderer_tpu.settings import RenderSettings, StaticConfig


def _edge_image(h=32, w=32):
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2:, :] = 1.0  # hard vertical edge
    return jnp.asarray(img)


def test_fxaa_debug_paints_edge_direction():
    img = _edge_image()
    out = np.asarray(fxaa_ops.fxaa(img, debug=1))
    # the vertical edge's AA pixels must be painted pure green (fg debug)
    painted = (out[:, :, 1] == 1.0) & (out[:, :, 0] == 0.0) & (out[:, :, 2] == 0.0)
    assert painted.any(), "debug mode painted no edge pixels"
    # debug off: no such pure-green marker pixels appear from blending
    out_off = np.asarray(fxaa_ops.fxaa(img, debug=0))
    assert not np.array_equal(out, out_off)


def test_furnace_test_miss_is_white():
    import rust_renderer_tpu as rt
    from rust_renderer_tpu.models import create_rtiow_scene
    from rust_renderer_tpu.ops import pathtrace

    renderer = rt.Renderer()
    camera = rt.Camera([0, 1, 4], [0, 0.5, -1], fov_degrees=60.0,
                       aspect_ratio=1.0)
    create_rtiow_scene(renderer, camera)
    scene = renderer.pack()
    cfg = StaticConfig(width=32, height=32, samples_per_frame=1,
                       num_bounces=2, furnace_test=True)
    view = RenderSettings.default(num_lights=0).with_camera(camera, 32, 32)
    view = view.replace(
        total_samples=np.uint32(1),
        sky_enabled=np.int32(0),   # furnace overrides even sky-off
        sun_shadow_enabled=np.int32(0),
        lights_enabled=np.int32(0),
    )
    accum = jnp.zeros((32, 32, 3), jnp.float32)
    res = pathtrace.path_trace(scene, view, cfg, accum)
    out = np.asarray(res.output)
    # top rows look at the sky: with FURNACE_TEST they are pure white even
    # though sky_enabled=0 (which would normally make them black)
    assert np.allclose(out[0, :, :], 1.0, atol=1e-5)

    cfg_off = cfg.replace(furnace_test=False)
    res_off = pathtrace.path_trace(scene, view, cfg_off, accum)
    assert np.allclose(np.asarray(res_off.output)[0, :, :], 0.0, atol=1e-5)


def test_cascade_debug_tints_output():
    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models import create_cornell_box_scene
    from rust_renderer_tpu.settings import RenderGraphMode

    cfg = StaticConfig(
        shadow_map_size=64, cubemap_size=16, cubemap_mips=2,
        irradiance_size=8, brdf_lut_size=16, num_bounces=2,
    )
    app = Application(64, 64, RenderGraphMode.RASTERIZED, cfg)
    app.create_scene(create_cornell_box_scene)
    base = app.run(num_frames=1)
    app.view = app.view.replace(cascade_debug=np.int32(1))
    app.reset_accumulation()
    tinted = app.run(num_frames=1)
    assert np.isfinite(tinted).all()
    assert not np.allclose(base, tinted), "cascade debug tint had no effect"


def test_sanitizer_reports_nonfinite_pass_output():
    g = Graph(sanitize=True)
    g.create_texture("bad", 8, 8, 1)
    (
        g.add_pass("poison")
        .write("bad")
        .render(lambda res, s, v, u: {"bad": jnp.full((8, 8), jnp.nan)})
        .build()
    )
    g.render(scene=None, view=None)
    assert g.last_sanitizer_report.get("poison/bad") == 64

    g2 = Graph(sanitize=True)
    g2.create_texture("ok", 8, 8, 1)
    (
        g2.add_pass("clean")
        .write("ok")
        .render(lambda res, s, v, u: {"ok": jnp.zeros((8, 8))})
        .build()
    )
    g2.render(scene=None, view=None)
    assert g2.last_sanitizer_report == {}


def test_viewer_gizmo_moves_instance():
    from rust_renderer_tpu.app import viewer
    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models import create_cornell_box_scene
    from rust_renderer_tpu.settings import RenderGraphMode

    cfg = StaticConfig(shadow_map_size=32, cubemap_size=8, cubemap_mips=2,
                       irradiance_size=4, brdf_lut_size=8, num_bounces=1)
    app = Application(32, 32, RenderGraphMode.MINIMAL, cfg)
    app.create_scene(create_cornell_box_scene)
    app.total_samples = 7
    state = {}
    app.input.begin_frame()
    app.input.set_key_down("tab")
    viewer._handle_gizmo(app, state)
    assert state["gizmo"] == 0
    before = np.array(app.renderer.instances[0].transform)
    app.input.begin_frame()
    app.input.set_key_down("shift+l")
    viewer._handle_gizmo(app, state)
    after = np.array(app.renderer.instances[0].transform)
    assert after[0, 3] == before[0, 3] + 0.5
    assert app.total_samples == 0  # accumulation reset (main.rs:344-359)


def test_viewer_ansi_raster_and_keysource():
    from rust_renderer_tpu.app import viewer
    from rust_renderer_tpu.input import Input

    img = np.random.default_rng(0).random((64, 48, 3)).astype(np.float32)
    s = viewer.frame_to_ansi(img, cols=20, rows=10)
    lines = s.split("\n")
    assert len(lines) == 10
    assert lines[0].count("▀") == 20

    # Without a tty the key source is inert but safe.
    inp = Input()
    src = viewer.StdinKeySource()
    src._fd = None
    with src:
        src.pump(inp)
    assert not src.quit_requested
