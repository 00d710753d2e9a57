"""Bindless texture sampling + marching-cubes noise unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops.texture import sample_texture_bilinear
from rust_renderer_tpu.ops.noise import fbm, noised


def _checker(size=8):
    t = np.zeros((1, size, size, 4), np.uint8)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    t[0, (yy + xx) % 2 == 0] = 255
    return jnp.asarray(t)


def test_bilinear_texel_centers_exact():
    tex = _checker(8)
    # Sample exactly at texel centers: no filtering blur.
    uv = jnp.asarray([[(0.5) / 8, (0.5) / 8], [(1.5) / 8, (0.5) / 8]])
    out = np.asarray(jax.jit(sample_texture_bilinear)(
        tex, jnp.zeros(2, jnp.int32), uv
    ))
    np.testing.assert_allclose(out[0], [1, 1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 0, 0, 0], atol=1e-6)


def test_bilinear_midpoint_blends():
    tex = _checker(8)
    uv = jnp.asarray([[(1.0) / 8, (0.5) / 8]])  # halfway between texels
    out = np.asarray(jax.jit(sample_texture_bilinear)(
        tex, jnp.zeros(1, jnp.int32), uv
    ))
    np.testing.assert_allclose(out[0][:3], 0.5, atol=1e-2)


def test_mirrored_repeat_addressing():
    tex = _checker(8)
    # uv and its mirror produce the same value at the boundary reflection.
    uv_a = jnp.asarray([[1.02, 0.3]])
    uv_b = jnp.asarray([[0.98, 0.3]])
    f = jax.jit(sample_texture_bilinear)
    a = np.asarray(f(tex, jnp.zeros(1, jnp.int32), uv_a))
    b = np.asarray(f(tex, jnp.zeros(1, jnp.int32), uv_b))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_texture_id_selects_layer():
    t = np.zeros((2, 4, 4, 4), np.uint8)
    t[1] = 255
    tex = jnp.asarray(t)
    uv = jnp.asarray([[0.5, 0.5], [0.5, 0.5]])
    out = np.asarray(jax.jit(sample_texture_bilinear)(
        tex, jnp.asarray([0, 1], jnp.int32), uv
    ))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, atol=1e-6)


def test_noise_range_and_determinism():
    p = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (256, 3)).astype(np.float32))
    n1 = np.asarray(jax.jit(noised)(p))
    n2 = np.asarray(jax.jit(noised)(p))
    np.testing.assert_array_equal(n1, n2)
    assert n1.min() >= -1.001 and n1.max() <= 1.001
    assert n1.std() > 0.05  # actually varies


def test_fbm_smoother_than_noise():
    p = jnp.asarray(np.stack([np.linspace(0, 10, 512)] * 3, -1).astype(np.float32))
    n = np.asarray(jax.jit(noised)(p))
    f = np.asarray(jax.jit(lambda p: fbm(p, octaves=4))(p))
    assert np.isfinite(f).all()
    assert abs(f.mean()) < 0.5
