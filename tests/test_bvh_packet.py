"""Packet traversal must agree exactly with per-ray traversal."""

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.scene import ModelLoader
from rust_renderer_tpu.utils import math3d


def _scene_bvh():
    r = rt.Renderer()
    r.add_model(ModelLoader.load_cube(), math3d.translation([0, 0.5, 0]))
    r.add_model(ModelLoader.load_cube(), math3d.scale([20.0, 0.1, 20.0]))
    rng = np.random.default_rng(3)
    for _ in range(6):
        s = ModelLoader.load_sphere(stacks=8, slices=8)
        r.add_model(
            s, math3d.translation(rng.uniform(-4, 4, 3)) @ math3d.scale(0.5)
        )
    scene = r.pack()
    return scene, bvhmod.build_scene_bvh(scene)


def _camera_rays(h, w):
    cam = rt.Camera([3, 2, 5], [0, 0.5, 0], aspect_ratio=w / h, z_near=0.1, z_far=100.0)
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    iv = jnp.asarray(np.linalg.inv(cam.get_view()))
    ip = jnp.asarray(np.linalg.inv(cam.get_projection()))
    return rayops.generate_camera_rays(iv, ip, px, py, w, h)


def test_packet_matches_per_ray_image():
    scene, b = _scene_bvh()
    o, d = _camera_rays(64, 64)
    t1, p1, u1, v1 = jax.jit(lambda o, d: bvhmod.traverse(b, o, d))(o, d)
    t2, p2, u2, v2 = jax.jit(lambda o, d: bvhmod.traverse_packet(b, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    hit = np.asarray(p1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1)[hit], np.asarray(u2)[hit], atol=1e-6)


def test_packet_random_rays_padding_path():
    """Non-2D shapes go through the pad/flatten path."""
    scene, b = _scene_bvh()
    rng = np.random.default_rng(7)
    n = 1000  # deliberately not a multiple of the packet size
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    t1, p1, _, _ = jax.jit(lambda o, d: bvhmod.traverse(b, o, d))(o, d)
    t2, p2, _, _ = jax.jit(lambda o, d: bvhmod.traverse_packet(b, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_packet_any_hit_matches():
    scene, b = _scene_bvh()
    o, d = _camera_rays(32, 32)
    ah_ray = bvhmod.make_any_hit(b, packet=False)
    ah_pkt = bvhmod.make_any_hit(b, packet=True)
    r1 = jax.jit(lambda o, d: ah_ray(scene, o, d))(o, d)
    r2 = jax.jit(lambda o, d: ah_pkt(scene, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_packet_respects_t_max():
    scene, b = _scene_bvh()
    o, d = _camera_rays(32, 32)
    t, prim, _, _ = jax.jit(
        lambda o, d: bvhmod.traverse_packet(b, o, d, 1e-3, 3.0)
    )(o, d)
    tt = np.asarray(t)
    assert np.all(tt[np.asarray(prim) >= 0] <= 3.0)
