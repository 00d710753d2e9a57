"""Bindless texture-array sampling.

The reference samples combined-image descriptors with a linear,
mirrored-repeat sampler (utopian/src/texture.rs:85-98) and no mips (images
are created with a single level, texture.rs:36-60). Here textures live in one
(N, S, S, 4) uint8 array; sampling is gathers + lerps, vectorized over pixel
batches. uv convention matches GLSL `texture()`: (0,0) = top-left texel
origin, v increasing downward in memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mirror_repeat(coord: jax.Array, size: int) -> jax.Array:
    """MIRRORED_REPEAT addressing in texel space (float in, float out)."""
    period = 2.0 * size
    m = jnp.mod(coord, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m < size, m, period - 1.0 - m)


def sample_texture_nearest_mip0(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Nearest-neighbor fetch, normalized [0,1] output. uv: (...,2)."""
    size = textures.shape[1]
    x = _mirror_repeat(uv[..., 0] * size, size).astype(jnp.int32).clip(0, size - 1)
    y = _mirror_repeat(uv[..., 1] * size, size).astype(jnp.int32).clip(0, size - 1)
    texel = textures[tex_id, y, x]
    return texel.astype(jnp.float32) / 255.0


def sample_texture_bilinear(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch with mirrored-repeat, normalized [0,1] output.

    textures: (N,S,S,4) uint8; tex_id: (...,) i32; uv: (...,2) f32.
    Returns (...,4) f32.
    """
    size = textures.shape[1]
    # Texel-center convention: sample point in texel space.
    fx = uv[..., 0] * size - 0.5
    fy = uv[..., 1] * size - 0.5
    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    wx = (fx - x0f)[..., None]
    wy = (fy - y0f)[..., None]

    def fetch(xi, yi):
        x = _mirror_repeat(xi, size).astype(jnp.int32).clip(0, size - 1)
        y = _mirror_repeat(yi, size).astype(jnp.int32).clip(0, size - 1)
        return textures[tex_id, y, x].astype(jnp.float32) / 255.0

    c00 = fetch(x0f, y0f)
    c10 = fetch(x0f + 1, y0f)
    c01 = fetch(x0f, y0f + 1)
    c11 = fetch(x0f + 1, y0f + 1)
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy
