"""Atmosphere model + cubemap machinery unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import atmosphere
from rust_renderer_tpu.ops.cubemap import (
    direction_to_face_uv,
    face_directions,
    sample_cubemap,
    sample_cubemap_lod,
)
from rust_renderer_tpu.ops.colors import linear_to_srgb, srgb_to_linear, luminance


def test_sky_is_blue_at_zenith():
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    sun = jnp.asarray([0.0, 0.9, 0.43])
    sun = sun / jnp.linalg.norm(sun)
    sky = np.asarray(jax.jit(
        lambda o, d: atmosphere.sky_radiance(o, d, sun, jnp.int32(1))
    )(o, up))[0]
    assert sky[2] > sky[0]  # blue dominates red (Rayleigh)
    assert 0.0 < sky[2] <= 1.0  # clamped HDR


def test_sky_disabled_is_black():
    o = jnp.asarray([[0.0, 1.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    sun = jnp.asarray([0.0, 1.0, 0.0])
    sky = np.asarray(jax.jit(
        lambda o, d: atmosphere.sky_radiance(o, d, sun, jnp.int32(0))
    )(o, d))
    np.testing.assert_allclose(sky, 0.0)


def test_sky_brighter_toward_sun():
    sun = jnp.asarray([0.707, 0.707, 0.0])
    o = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    d = jnp.asarray([[0.6, 0.8, 0.0], [-0.6, 0.8, 0.0]])  # toward / away
    sky = np.asarray(jax.jit(
        lambda o, d: atmosphere.sky_radiance(o, d, sun, jnp.int32(1))
    )(o, d))
    assert luminance(jnp.asarray(sky[0])) > luminance(jnp.asarray(sky[1]))


def test_phase_functions_normalizedish():
    # Rayleigh phase at costh=0: 3/(16 pi).
    assert np.isclose(float(atmosphere._phase_rayleigh(jnp.float32(0.0))),
                      3.0 / (16.0 * np.pi), rtol=1e-5)


# -- cubemap ------------------------------------------------------------------


def test_face_directions_centers():
    d = np.asarray(face_directions(0, 4))  # +X face
    assert np.all(d[..., 0] > 0)  # all directions point +X
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_direction_face_roundtrip():
    """face_directions -> direction_to_face_uv recovers face and uv."""
    for f in range(6):
        d = face_directions(f, 8)
        face, u, v = jax.jit(direction_to_face_uv)(d)
        assert np.all(np.asarray(face) == f), f"face {f}"
        # Texel centers: uv = (i + 0.5) / 8.
        expect = (np.arange(8) + 0.5) / 8
        np.testing.assert_allclose(np.asarray(u)[0, :], expect, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v)[:, 0], expect, atol=1e-5)


def test_sample_cubemap_face_colors():
    cube = np.zeros((6, 8, 8, 3), np.float32)
    for f in range(6):
        cube[f] = f + 1
    cube = jnp.asarray(cube)
    dirs = jnp.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        jnp.float32,
    )
    out = np.asarray(jax.jit(sample_cubemap)(cube, dirs))
    np.testing.assert_allclose(out[:, 0], np.arange(1, 7), atol=1e-5)


def test_sample_cubemap_lod_blends():
    chain = [jnp.full((6, 8, 8, 3), 1.0), jnp.full((6, 4, 4, 3), 3.0)]
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    mid = np.asarray(jax.jit(
        lambda d: sample_cubemap_lod(chain, d, jnp.asarray([0.5]))
    )(d))
    np.testing.assert_allclose(mid, 2.0, atol=1e-5)


# -- color space ---------------------------------------------------------------


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    y = srgb_to_linear(linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_luminance_weights():
    assert np.isclose(float(luminance(jnp.asarray([1.0, 1.0, 1.0]))), 1.0, atol=1e-6)
    assert float(luminance(jnp.asarray([0.0, 1.0, 0.0]))) > float(
        luminance(jnp.asarray([1.0, 0.0, 0.0]))
    )
