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
    # d . right / d . up unrolled per face as selects: indexing the (6,3)
    # basis tables with a per-lane face lowers to three table-scan gathers
    # (~3.7 ms each per 1080p sample site, round-3 frame trace); the basis
    # rows above stay as documentation + face_directions' static path.
    u = jnp.where(
        is_x, jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(
        is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y),
    )
    u = u / major
    v = v / major
    return face, u * 0.5 + 0.5, v * 0.5 + 0.5


def pack_cubemap(cube: jax.Array) -> jax.Array:
    """(6, S, S, C) -> (6*S*S, 4C) bilinear-quad rows.

    Row (face, y, x) holds texels (y, x), (y, x+1), (y+1, x), (y+1, x+1)
    with clamp-to-edge neighbors baked in, so a bilinear tap is ONE packed
    row gather instead of four per-lane 3D gathers (which lower to table
    scans on TPU — measured 167 ms/frame of cubemap sampling at 512²; the
    leaf_packed lesson, PERFORMANCE.md). Built inside the jit from the
    cubemap resource; XLA CSEs the pack across a frame's sample sites.
    """
    right = jnp.concatenate([cube[:, :, 1:], cube[:, :, -1:]], axis=2)
    down = jnp.concatenate([cube[:, 1:], cube[:, -1:]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    quad = jnp.concatenate([cube, right, down, downright], axis=-1)
    return quad.reshape(-1, 4 * cube.shape[-1])


def _bilerp_rows(rows: jax.Array, c: int, wx: jax.Array, wy: jax.Array,
                 shape) -> jax.Array:
    c00 = rows[:, 0:c]
    c10 = rows[:, c:2 * c]
    c01 = rows[:, 2 * c:3 * c]
    c11 = rows[:, 3 * c:4 * c]
    wx = wx.reshape(-1, 1)
    wy = wy.reshape(-1, 1)
    top = c00 * (1 - wx) + c10 * wx
    bot = c01 * (1 - wx) + c11 * wx
    return (top * (1 - wy) + bot * wy).reshape(shape + (c,))


def _face_uv_to_rowparams(face, u, v, size: int):
    """(face, u, v) -> (row index, wx, wy) for a packed quad table.

    Clamping the texel-space sample point to [0, S-1] before floor/frac is
    exactly clamp-to-edge bilinear (identical to clamping each corner)."""
    fx = jnp.clip(u * size - 0.5, 0.0, size - 1.0)
    fy = jnp.clip(v * size - 0.5, 0.0, size - 1.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    row = face * (size * size) + y0.astype(jnp.int32) * size + x0.astype(jnp.int32)
    return row, fx - x0, fy - y0


def sample_cubemap(cube: jax.Array, d: jax.Array) -> jax.Array:
    """Bilinear sample (within the chosen face) of a (6,S,S,C) cubemap.
    One packed-row gather per tap (see pack_cubemap)."""
    from rust_renderer_tpu.ops.gather import row_gather

    face, u, v = direction_to_face_uv(d)
    size = cube.shape[1]
    c = cube.shape[-1]
    row, wx, wy = _face_uv_to_rowparams(face, u, v, size)
    rows = row_gather(pack_cubemap(cube), row.reshape(-1))
    return _bilerp_rows(rows, c, wx, wy, d.shape[:-1])


def sample_cubemap_lod(chain: list[jax.Array], d: jax.Array, lod: jax.Array) -> jax.Array:
    """Trilinear-across-levels sample of a mip chain (textureLod analog).

    All levels' quad tables are concatenated into ONE packed table with
    static row offsets; the per-pixel (level, texel) resolves to a single
    row index by a static unroll of cheap integer selects, so the whole
    trilinear fetch is TWO row gathers (lo + hi level) instead of
    4 gathers x n_levels."""
    from rust_renderer_tpu.ops.gather import row_gather

    n_levels = len(chain)
    c = chain[0].shape[-1]
    lod = jnp.clip(lod, 0.0, n_levels - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_levels - 1)
    frac = (lod - lo.astype(jnp.float32))[..., None]

    face, u, v = direction_to_face_uv(d)
    table = jnp.concatenate([pack_cubemap(cm) for cm in chain], axis=0)

    def level_params(level_sel):
        row = jnp.zeros(face.shape, jnp.int32)
        wx = jnp.zeros(face.shape, jnp.float32)
        wy = jnp.zeros(face.shape, jnp.float32)
        offset = 0
        for lvl, cm in enumerate(chain):
            size = cm.shape[1]
            r, x, y = _face_uv_to_rowparams(face, u, v, size)
            m = level_sel == lvl
            row = jnp.where(m, offset + r, row)
            wx = jnp.where(m, x, wx)
            wy = jnp.where(m, y, wy)
            offset += 6 * size * size
        return row, wx, wy

    shape = d.shape[:-1]
    row_lo, wx_lo, wy_lo = level_params(lo)
    row_hi, wx_hi, wy_hi = level_params(hi)
    out_lo = _bilerp_rows(row_gather(table, row_lo.reshape(-1)), c, wx_lo, wy_lo, shape)
    out_hi = _bilerp_rows(row_gather(table, row_hi.reshape(-1)), c, wx_hi, wy_hi, shape)
    return out_lo * (1 - frac) + out_hi * frac
