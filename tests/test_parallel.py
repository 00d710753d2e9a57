"""Multi-device tile sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_rtiow_scene
from rust_renderer_tpu.ops import pathtrace
from rust_renderer_tpu.parallel import make_tile_mesh, render_tiled
from rust_renderer_tpu.settings import RenderSettings, StaticConfig

SIZE = 32


def _setup():
    r = rt.Renderer()
    cam = rt.Camera([0, 1, 4], [0, 0.5, -1], aspect_ratio=1.0)
    create_rtiow_scene(r, cam)
    scene = r.pack()
    cfg = StaticConfig(width=SIZE, height=SIZE, samples_per_frame=1, num_bounces=1)
    view = RenderSettings.default(num_lights=0).with_camera(cam, SIZE, SIZE)
    view = view.replace(total_samples=jnp.uint32(1), lights_enabled=jnp.int32(0))
    return scene, cfg, view


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_tiled_matches_single_chip():
    scene, cfg, view = _setup()
    accum = jnp.zeros((SIZE, SIZE, 3), jnp.float32)

    single = jax.jit(lambda s, v, a: pathtrace.path_trace(s, v, cfg, a))(scene, view, accum)

    mesh = make_tile_mesh(8)
    tiled = jax.jit(lambda s, v, a: render_tiled(s, v, cfg, a, mesh))(scene, view, accum)

    np.testing.assert_allclose(
        np.asarray(single.output), np.asarray(tiled.output), atol=2e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_tiled_output_sharded():
    scene, cfg, view = _setup()
    accum = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    mesh = make_tile_mesh(8)
    res = jax.jit(lambda s, v, a: render_tiled(s, v, cfg, a, mesh))(scene, view, accum)
    # Output really is distributed over the mesh.
    assert len(res.output.sharding.device_set) == 8
