"""Row-band sharding of the RASTERIZED graph on the 8-device virtual mesh.

VERDICT r3 #5b/c: the raster post stack (gbuffer -> ssao -> deferred ->
atmosphere -> present/FXAA) runs with image-space resources sharded by rows
(Graph.shard_image_rows). SSAO/FXAA neighbor taps are static shifts, so the
XLA SPMD partitioner inserts the band-edge halo exchanges — the sharded frame
must match the single-device frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.renderers import (
    build_minimal_forward_render_graph,
    build_render_graph,
)
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.settings import RenderSettings, StaticConfig
from rust_renderer_tpu.utils import math3d

W, H = 32, 64  # H divisible by the 8-device mesh
CFG = StaticConfig(
    width=W, height=H, shadow_map_size=64, cubemap_size=16, cubemap_mips=2,
    irradiance_size=8, brdf_lut_size=16, num_bounces=1,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


@pytest.fixture(scope="module")
def setup():
    r = rt.Renderer()
    cam = rt.Camera([3, 2, 5], [0, 0.5, 0], aspect_ratio=W / H,
                    z_near=0.1, z_far=100.0)
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    r.add_light([2.0, 3.0, 2.0], [1.0, 1.0, 1.0], 1.0)
    scene = r.pack()
    b = bvh_ops.build_scene_bvh(scene)
    view = RenderSettings.default(num_lights=r.get_num_lights()).with_camera(
        cam, W, H)
    view = view.replace(total_samples=jnp.uint32(1))
    sun = np.array([0.0, 0.90631, 0.42262])
    return cam, scene, b, view, sun


def _render(setup_vals, builder, mesh=None):
    cam, scene, b, view, sun = setup_vals
    g = rt.Graph()
    if mesh is not None:
        g.shard_image_rows(mesh, H, W)
    g.new_frame(); g.clear()
    builder(g, CFG, cam, b, sun)
    return g.render(scene, view)


def _raster_builder(g, cfg, cam, b, sun):
    build_render_graph(g, cfg, cam, b, sun, need_environment_update=True)


def test_rasterized_rowband_matches_single_device(setup):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("rows",))
    res1 = _render(setup, _raster_builder)
    res8 = _render(setup, _raster_builder, mesh=mesh)
    out1 = np.asarray(res1["present_output"])
    out8 = np.asarray(res8["present_output"])
    assert np.isfinite(out8).all()
    # The partitioned program reassociates some reductions; tolerance is
    # float-noise scale, not algorithmic.
    np.testing.assert_allclose(out1, out8, atol=3e-5)
    # Image-space resources really live distributed over the mesh.
    assert len(res8["present_output"].sharding.device_set) == 8
    assert len(res8["ssao_output"].sharding.device_set) == 8
    # Light-space resources stay replicated (every band reads the atlas).
    assert res8["shadow_map"].sharding.is_fully_replicated


def test_minimal_rowband_matches_single_device(setup):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("rows",))
    res1 = _render(setup, build_minimal_forward_render_graph)
    res8 = _render(setup, build_minimal_forward_render_graph, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res1["present_output"]),
        np.asarray(res8["present_output"]), atol=3e-5)
    assert len(res8["present_output"].sharding.device_set) == 8
