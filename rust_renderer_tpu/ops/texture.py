"""Bindless texture-array sampling.

The reference samples combined-image descriptors with a linear,
mirrored-repeat sampler (utopian/src/texture.rs:85-98) and no mips (images
are created with a single level, texture.rs:36-60). Here textures live in one
(N, S, S, 4) uint8 array; uv convention matches GLSL `texture()`: (0,0) =
top-left texel origin, v increasing downward in memory.

Sampling is packed-row gathers: per-lane multi-array gathers lower to table
scans on TPU (measured 117 ms/frame of texture taps at 512² — the
leaf_packed lesson, PERFORMANCE.md). Each texel's RGBA8 packs into one
uint32, each table row holds a texel's full 2x2 bilinear quad, so a bilinear
tap is ONE row gather + shifts/masks to unpack. The quad table is built
inside the jit from the texture array; XLA CSEs it across a frame's many
sample sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops.gather import row_gather


def _mirror_repeat(coord: jax.Array, size: int) -> jax.Array:
    """MIRRORED_REPEAT addressing in texel space (float in, float out)."""
    period = 2.0 * size
    m = jnp.mod(coord, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m < size, m, period - 1.0 - m)


def pack_textures_quad(textures: jax.Array) -> jax.Array:
    """(N, S, S, 4) uint8 -> (N*S*S, 4) uint32 bilinear-quad rows.

    Row (n, y, x) holds RGBA8-in-u32 texels (y,x), (y,x+1), (y+1,x),
    (y+1,x+1) with clamp-to-edge neighbors baked in (mirrored-repeat is
    applied to the sample COORDINATE before indexing, which is equivalent —
    mirroring is an isometry of texel space)."""
    t = textures.astype(jnp.uint32)
    packed = (
        t[..., 0]
        | (t[..., 1] << 8)
        | (t[..., 2] << 16)
        | (t[..., 3] << 24)
    )  # (N, S, S)
    right = jnp.concatenate([packed[:, :, 1:], packed[:, :, -1:]], axis=2)
    down = jnp.concatenate([packed[:, 1:], packed[:, -1:]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.stack([packed, right, down, downright], axis=-1).reshape(-1, 4)


def _unpack_rgba8(word: jax.Array) -> jax.Array:
    """(R,) uint32 -> (R, 4) f32 in [0, 1]."""
    return jnp.stack(
        [
            (word & 0xFF).astype(jnp.float32),
            ((word >> 8) & 0xFF).astype(jnp.float32),
            ((word >> 16) & 0xFF).astype(jnp.float32),
            ((word >> 24) & 0xFF).astype(jnp.float32),
        ],
        axis=-1,
    ) / 255.0


def sample_texture_nearest_mip0(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Nearest-neighbor fetch, normalized [0,1] output. uv: (...,2)."""
    size = textures.shape[1]
    shape = tex_id.shape
    x = _mirror_repeat(uv[..., 0] * size, size).astype(jnp.int32).clip(0, size - 1)
    y = _mirror_repeat(uv[..., 1] * size, size).astype(jnp.int32).clip(0, size - 1)
    row = tex_id * (size * size) + y * size + x
    quad = row_gather(pack_textures_quad(textures), row.reshape(-1))
    return _unpack_rgba8(quad[:, 0]).reshape(shape + (4,))


def sample_texture_bilinear(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch with mirrored-repeat, normalized [0,1] output.

    textures: (N,S,S,4) uint8; tex_id: (...,) i32; uv: (...,2) f32.
    Returns (...,4) f32. One packed-row gather per tap: the mirrored-repeat
    map is applied to the float sample coordinate (equivalent to mirroring
    each corner — mirroring is an isometry, and clamping the mirrored
    coordinate to [0, S-1] before floor/frac reproduces the corner clamps).
    """
    size = textures.shape[1]
    shape = tex_id.shape
    fx = jnp.clip(_mirror_repeat(uv[..., 0] * size - 0.5, size), 0.0, size - 1.0)
    fy = jnp.clip(_mirror_repeat(uv[..., 1] * size - 0.5, size), 0.0, size - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0).reshape(-1, 1)
    wy = (fy - y0).reshape(-1, 1)
    row = (
        tex_id * (size * size)
        + y0.astype(jnp.int32) * size
        + x0.astype(jnp.int32)
    )
    quad = row_gather(pack_textures_quad(textures), row.reshape(-1))  # (R, 4) u32
    c00 = _unpack_rgba8(quad[:, 0])
    c10 = _unpack_rgba8(quad[:, 1])
    c01 = _unpack_rgba8(quad[:, 2])
    c11 = _unpack_rgba8(quad[:, 3])
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return (top * (1 - wy) + bot * wy).reshape(shape + (4,))
