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


# -- flagship chain sharding (parallel/flagship.py) ---------------------------


def _setup_flagship():
    from rust_renderer_tpu.models import create_cube_scene
    from rust_renderer_tpu.ops import bvh as bvh_ops

    r = rt.Renderer()
    cam = rt.Camera([-2.5, 3.0, -2.5], [10.0, 1.0, 10.0], aspect_ratio=1.0)
    create_cube_scene(r, cam)
    for i in range(4):
        r.add_light([float(i) * 4.0, 3.0, float(i % 2) * 4.0], [1.0, 1.0, 1.0])
    scene = r.pack()
    bvh = bvh_ops.build_scene_bvh(scene)
    cfg = StaticConfig(width=SIZE, height=SIZE, samples_per_frame=1, num_bounces=2)
    view = RenderSettings.default(
        num_lights=r.get_num_lights()
    ).with_camera(cam, SIZE, SIZE)
    view = view.replace(total_samples=jnp.uint32(1))
    return scene, bvh, cfg, view


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_flagship_tiled_matches_single_chip():
    """The sharded flagship chain (BVH + full ReSTIR with all_gather
    collectives + reservoir-NEE PT) is bit-identical to the unsharded one."""
    from rust_renderer_tpu.ops import bvh as bvh_ops
    from rust_renderer_tpu.ops.restir import Reservoir
    from rust_renderer_tpu.parallel import (
        flagship_step, render_flagship_tiled, shard_flagship_inputs,
    )

    scene, bvh, cfg, view = _setup_flagship()
    closest = bvh_ops.make_closest_hit(bvh)
    any_hit = bvh_ops.make_any_hit(bvh)
    accum0 = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    res0 = Reservoir.empty((SIZE, SIZE))

    # Unsharded chain, two frames (frame 2 reads frame 1's spatial reservoirs).
    single = jax.jit(
        lambda s, v, a, r: flagship_step(s, v, cfg, a, r, closest, any_hit)
    )
    out1, acc1, sp1 = single(scene, view, accum0, res0)
    view2 = view.replace(total_samples=jnp.uint32(2))
    out2, _, _ = single(scene, view2, acc1, sp1)

    mesh = make_tile_mesh(8)
    accum_s, res_s = shard_flagship_inputs(mesh, accum0, res0)
    tiled = jax.jit(
        lambda s, v, a, r: render_flagship_tiled(
            s, v, cfg, a, r, closest, any_hit, mesh
        )
    )
    t_out1, t_acc1, t_sp1 = tiled(scene, view, accum_s, res_s)
    t_out2, _, _ = tiled(scene, view2, t_acc1, t_sp1)

    assert len(t_out1.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(sp1.Y), np.asarray(t_sp1.Y))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(t_out1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(t_out2), atol=2e-5)
