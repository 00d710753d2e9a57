"""Graph.render_loop / Application.run_on_device: N frames in one jitted
lax.scan must reproduce the host frame loop exactly (VERDICT r3 #2 — the
swapchain steady-state analog; reference never blocks on readback,
utopian/src/vulkan_base.rs:389-424).

view.time is excluded from the equality claim only for marching-cubes
scenes (the sole consumer); these scenes don't enable MC.
"""

import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.app.main import Application
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig
from rust_renderer_tpu.utils import math3d

W = H = 32
CFG = StaticConfig(
    width=W, height=H, shadow_map_size=64, cubemap_size=16, cubemap_mips=2,
    irradiance_size=8, brdf_lut_size=16, num_bounces=2,
)


def _tiny_scene(r: rt.Renderer, cam: rt.Camera) -> None:
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    r.add_light([2.0, 3.0, 2.0], [1.0, 1.0, 1.0], 1.0)
    r.add_light([-2.0, 2.0, -1.0], [1.0, 0.5, 0.2], 0.7)
    cam.set_position_target([3, 2, 5], [0, 0.5, 0])


def _make_app(mode) -> Application:
    app = Application(W, H, mode, CFG)
    app.create_scene(_tiny_scene)
    # The RNG seeds from view.time (renderers._rng_for); freeze the host
    # clock so host-loop and device-loop frames draw identical samples.
    app.fps_timer.elapsed_seconds = lambda: 0.0
    return app


def test_pt_loop_matches_host_loop():
    """3 host frames == one 3-frame device loop, bit-exact: accumulation,
    ReSTIR reservoir carry (temporal reuse reads frame k-1's spatial
    output), and the presented image."""
    n = 3
    host = _make_app(RenderGraphMode.PATH_TRACED)
    host.run(num_frames=n, present_every=0)

    loop = _make_app(RenderGraphMode.PATH_TRACED)
    img = loop.run_on_device(n, tstep=0.0)

    # Tolerances: the scan body and the straight-line frame are different
    # XLA programs; fusion/reassociation differences cost ~1 ulp per op
    # chain (measured maxdiff 1.2e-7 single-frame). Semantics (RNG streams,
    # reservoir carry, counters) are integer/exact.
    np.testing.assert_allclose(
        np.asarray(host.graph.state["accumulation_image"]),
        np.asarray(loop.graph.state["accumulation_image"]),
        rtol=2e-5, atol=2e-5,
    )
    for k in loop.graph.state:
        if k.startswith("spatial_reuse_reservoirs"):
            np.testing.assert_allclose(
                np.asarray(host.graph.state[k]),
                np.asarray(loop.graph.state[k]), err_msg=k,
                rtol=2e-5, atol=2e-5,
            )
    assert host.total_samples == loop.total_samples == n
    assert np.isfinite(np.asarray(img)).all()


def test_pt_loop_then_host_frame_continues_protocol():
    """Interleaving run_on_device and run must keep the accumulation
    protocol consistent (host-side counters mirrored)."""
    a = _make_app(RenderGraphMode.PATH_TRACED)
    a.run_on_device(2, tstep=0.0)
    a.run(num_frames=1, present_every=0)

    b = _make_app(RenderGraphMode.PATH_TRACED)
    b.run(num_frames=3, present_every=0)

    assert a.total_samples == b.total_samples
    np.testing.assert_allclose(
        np.asarray(a.graph.state["accumulation_image"]),
        np.asarray(b.graph.state["accumulation_image"]),
        rtol=2e-5, atol=2e-5,
    )


def test_raster_loop_matches_host_frame():
    """RASTERIZED frames carry no cross-frame state; the loop's last frame
    must equal a host-rendered frame (and the carried checksum keeps every
    iteration live — see Graph.render_loop)."""
    host = _make_app(RenderGraphMode.RASTERIZED)
    host_img = host.run(num_frames=2, present_every=0)

    loop = _make_app(RenderGraphMode.RASTERIZED)
    loop.run(num_frames=1, present_every=0)  # env capture path parity
    img = np.asarray(loop.run_on_device(2, tstep=0.0))

    host_img = np.asarray(host_img)
    # FXAA / shadow-edge branches are binary decisions: a 1-ulp input
    # difference between the two XLA programs can flip a few pixels
    # entirely. Require the field to match and outliers to be rare.
    diff = np.abs(img - host_img)
    assert (diff > 2e-4).mean() < 0.02, (diff > 2e-4).mean()
    assert np.median(diff) < 2e-5


def test_mc_loop_matches_host_loop():
    """BASELINE config 5 on the device loop (VERDICT r4 #2): the
    marching-cubes extract/refit chain is a leading ISOLATED prefix, so
    render_loop batches it over all frames in its own program (lax.map,
    stacked tables) and the PT scan indexes the stacks at frame k — no
    host-loop fallback, same images as the host loop."""
    n = 2
    cfg = CFG.replace(mc_grid=8)

    def make():
        app = Application(W, H, RenderGraphMode.PATH_TRACED, cfg)
        app.create_scene(_tiny_scene)
        app.fps_timer.elapsed_seconds = lambda: 0.0
        app.view = app.view.replace(marching_cubes_enabled=np.uint32(1))
        return app

    host = make()
    host.run(num_frames=n, present_every=0)

    loop = make()
    host_frames = 0
    orig = loop.render_frame

    def counting_render_frame(*a, **k):
        nonlocal host_frames
        host_frames += 1
        return orig(*a, **k)

    loop.render_frame = counting_render_frame
    img = loop.run_on_device(n, tstep=0.0)
    assert host_frames == 0, "MC graph fell back to the host loop"
    np.testing.assert_allclose(
        np.asarray(host.graph.state["accumulation_image"]),
        np.asarray(loop.graph.state["accumulation_image"]),
        rtol=2e-5, atol=2e-5,
    )
    assert host.total_samples == loop.total_samples == n
    assert np.isfinite(np.asarray(img)).all()


def test_mc_loop_animates_across_frames():
    """With tstep > 0 the batched prefix must hand each scanned frame ITS
    OWN refit tables (the pulsing SDF changes the draw count), not frame
    0's."""
    cfg = CFG.replace(mc_grid=8)
    app = Application(W, H, RenderGraphMode.PATH_TRACED, cfg)
    app.create_scene(_tiny_scene)
    app.fps_timer.elapsed_seconds = lambda: 0.0
    app.view = app.view.replace(marching_cubes_enabled=np.uint32(1))
    app.run_on_device(2, tstep=2.0)
    # Recompute the two extracts the prefix program should have produced.
    from rust_renderer_tpu.ops import marching_cubes as mc_ops

    counts = []
    for t in (0.0, 2.0):
        r = mc_ops.marching_cubes(grid=8, voxel_size=32.0 / 8,
                                  time=np.float32(t))
        counts.append(int(np.asarray(r.vertex_count)))
    assert counts[0] != counts[1], "SDF did not animate — test is vacuous"


def test_device_loop_unsupported_shapes_fall_back():
    """Graph.device_loop_unsupported_reason is the single predicate for
    render_loop's ValueError AND run_on_device's host fallback: all-
    isolated graphs (the scan would render zero frames) and prefix passes
    chaining per-frame persistent state (lax.map has no carry) must be
    rejected, not silently mis-rendered."""
    import jax.numpy as jnp
    import pytest

    def img_pass(res, scene, view, u):
        return {"present_output": jnp.zeros((8, 8, 3), jnp.float32)}

    g = rt.Graph()
    g.create_texture("present_output", 8, 8, 3)
    g.new_frame(); g.clear()
    g.add_pass("only").write("present_output").render(img_pass).isolate() \
        .build()
    assert "isolated" in g.device_loop_unsupported_reason()


def test_device_loop_rejects_persistent_prefix_chain():
    import jax.numpy as jnp
    import pytest

    from rust_renderer_tpu.settings import RenderSettings

    g = rt.Graph()
    g.create_buffer("acc", (4,), persistent=True)
    g.create_texture("present_output", 8, 8, 3)

    def pre(res, scene, view, u):
        return {"acc": res["acc"] + 1.0}

    def main_pass(res, scene, view, u):
        return {"present_output": jnp.zeros((8, 8, 3), jnp.float32)}

    g.new_frame(); g.clear()
    g.add_pass("pre").read("acc").write("acc").render(pre).isolate().build()
    g.add_pass("m").write("present_output").render(main_pass).build()
    reason = g.device_loop_unsupported_reason()
    assert reason is not None and "persistent" in reason
    with pytest.raises(ValueError):
        g.render_loop(None, RenderSettings.default(), 2)


def test_mc_loop_sanitize_clean():
    """--sanitize composes with the MC device loop: the refit tables'
    bitcast int32 id/ref columns are sanitize-exempt (they alias NaN bit
    patterns), so a clean animated-MC dispatch reports nothing."""
    cfg = CFG.replace(mc_grid=8)
    app = Application(W, H, RenderGraphMode.PATH_TRACED, cfg, sanitize=True)
    app.create_scene(_tiny_scene)
    app.fps_timer.elapsed_seconds = lambda: 0.0
    app.view = app.view.replace(marching_cubes_enabled=np.uint32(1))
    img = app.run_on_device(2, tstep=0.0)
    assert np.isfinite(np.asarray(img)).all()
    assert app.graph.last_sanitizer_report == {}


def test_loop_sanitize_counts_nonfinite():
    """Sanitize on the device loop (VERDICT r4 #7): per-(pass, resource)
    non-finite counts ride the scan carry and are summed over the N frames
    — the production path and the validation-layer analog are no longer
    mutually exclusive."""
    import jax.numpy as jnp

    g = rt.Graph(sanitize=True)
    g.create_texture("present_output", 8, 8, 3)
    g.create_texture("aux", 8, 8, 1)

    def bad(res, scene, view, u):
        img = jnp.zeros((8, 8, 3), jnp.float32).at[0, 0, 0].set(jnp.nan)
        return {"present_output": img,
                "aux": jnp.zeros((8, 8), jnp.float32)}

    g.new_frame(); g.clear()
    g.add_pass("bad").write("present_output").write("aux").render(bad).build()
    from rust_renderer_tpu.settings import RenderSettings

    g.render_loop(None, RenderSettings.default(), 3)
    assert g.last_sanitizer_report == {"bad/present_output": 3}


def test_loop_sanitize_app_clean():
    """A clean scene through --sanitize + run_on_device reports nothing."""
    app = Application(W, H, RenderGraphMode.PATH_TRACED, CFG, sanitize=True)
    app.create_scene(_tiny_scene)
    app.fps_timer.elapsed_seconds = lambda: 0.0
    img = app.run_on_device(2, tstep=0.0)
    assert np.isfinite(np.asarray(img)).all()
    assert app.graph.last_sanitizer_report == {}
