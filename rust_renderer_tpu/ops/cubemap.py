"""Cubemap storage, sampling, and per-face ray directions.

The reference's environment pipeline renders atmosphere/irradiance/specular
into Vulkan cubemaps (utopian/src/renderers/ibl.rs). Here a cubemap is a
(6, S, S, C) array with the standard Vulkan/GL face order and orientations:

face 0 +X, 1 -X, 2 +Y, 3 -Y, 4 +Z, 5 -Z

Sampling is nearest/bilinear-by-face (faces are looked up per pixel with
gathers); LOD chains are Python lists of (6, S>>l, S>>l, C) arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-face basis: direction = normalize(forward + u*right + v*up),
# u, v in [-1, 1], v increasing DOWN the image (texel row order).
_FACE_FORWARD = jnp.asarray(
    [
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ]
)
_FACE_RIGHT = jnp.asarray(
    [
        [0.0, 0.0, -1.0],
        [0.0, 0.0, 1.0],
        [1.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
    ]
)
_FACE_UP = jnp.asarray(
    [
        [0.0, -1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
        [0.0, -1.0, 0.0],
        [0.0, -1.0, 0.0],
    ]
)


def face_directions(face: int, size: int) -> jax.Array:
    """(S, S, 3) unit directions through the texel centers of one face."""
    ts = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    v, u = jnp.meshgrid(ts, ts, indexing="ij")
    d = (
        _FACE_FORWARD[face]
        + u[..., None] * _FACE_RIGHT[face]
        + v[..., None] * _FACE_UP[face]
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def direction_to_face_uv(d: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Direction (..., 3) -> (face i32, u, v) with u, v in [0, 1]."""
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    az = jnp.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]

    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)

    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)

    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-12)
    fwd = _FACE_FORWARD[face]
    right = _FACE_RIGHT[face]
    up = _FACE_UP[face]
    u = jnp.sum(d * right, axis=-1) / major
    v = jnp.sum(d * up, axis=-1) / major
    return face, u * 0.5 + 0.5, v * 0.5 + 0.5


def sample_cubemap(cube: jax.Array, d: jax.Array) -> jax.Array:
    """Bilinear sample (within the chosen face) of a (6,S,S,C) cubemap."""
    face, u, v = direction_to_face_uv(d)
    size = cube.shape[1]
    fx = u * size - 0.5
    fy = v * size - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def fetch(xi, yi):
        x = jnp.clip(xi, 0, size - 1).astype(jnp.int32)
        y = jnp.clip(yi, 0, size - 1).astype(jnp.int32)
        return cube[face, y, x]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return top * (1 - wy) + bot * wy


def sample_cubemap_lod(chain: list[jax.Array], d: jax.Array, lod: jax.Array) -> jax.Array:
    """Trilinear-across-levels sample of a mip chain (textureLod analog)."""
    n_levels = len(chain)
    lod = jnp.clip(lod, 0.0, n_levels - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(jnp.float32))[..., None]
    # Static unroll over levels; per-pixel select (levels have distinct
    # shapes, so gather per level then blend by mask).
    out_lo = jnp.zeros(d.shape[:-1] + (chain[0].shape[-1],), chain[0].dtype)
    out_hi = jnp.zeros_like(out_lo)
    for lvl in range(n_levels):
        s = sample_cubemap(chain[lvl], d)
        out_lo = jnp.where((lo == lvl)[..., None], s, out_lo)
        out_hi = jnp.where((jnp.minimum(lo + 1, n_levels - 1) == lvl)[..., None], s, out_hi)
    return out_lo * (1 - frac) + out_hi * frac
