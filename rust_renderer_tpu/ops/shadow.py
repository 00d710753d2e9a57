"""Cascaded shadow maps: split math, cascade fitting, PCF lookup.

Rebuild of utopian/src/renderers/shadow.rs (host-side cascade math — the
GPU Gems 3 ch.10 log/uniform split with lambda 0.927, per-cascade ortho
fitted to the frustum-slice bounding sphere with radius snapped to 1/16,
shadow.rs:36-109) and utopian/shaders/include/shadow_mapping.glsl (cascade
selection by view-space depth, 3x3 PCF, bias 0.0005, shadow factor 0.3).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rust_renderer_tpu.utils import math3d

CASCADE_COUNT = 4
CASCADE_SPLIT_LAMBDA = 0.927
SHADOW_BIAS = 0.0005
SHADOW_FACTOR = 0.3


def cascade_splits(near: float, far: float, count: int = CASCADE_COUNT,
                   split_lambda: float = CASCADE_SPLIT_LAMBDA) -> np.ndarray:
    """Normalized split positions in (0,1] (shadow.rs:36-46)."""
    clip_range = far - near
    ratio = far / near
    out = np.empty(count, np.float32)
    for i in range(count):
        p = (i + 1) / count
        log = near * ratio**p
        uniform = near + clip_range * p
        d = split_lambda * (log - uniform) + uniform
        out[i] = (d - near) / clip_range
    return out


def cascade_matrices(
    view: np.ndarray,
    projection: np.ndarray,
    near: float,
    far: float,
    sun_dir: np.ndarray,
    count: int = CASCADE_COUNT,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-cascade light view-projection matrices + split depths
    (shadow.rs:49-131). Host-side numpy (runs per frame on CPU, tiny)."""
    splits = cascade_splits(near, far, count)
    clip_range = far - near

    corners_ndc = np.array(
        [
            [-1, 1, 0], [1, 1, 0], [1, -1, 0], [-1, -1, 0],
            [-1, 1, 1], [1, 1, 1], [1, -1, 1], [-1, -1, 1],
        ],
        np.float32,
    )
    inv_cam = np.linalg.inv(projection @ view)
    corners = []
    for c in corners_ndc:
        h = inv_cam @ np.append(c, 1.0)
        corners.append(h[:3] / h[3])
    corners = np.stack(corners)

    matrices = np.zeros((count, 4, 4), np.float32)
    split_depths = np.zeros(count, np.float32)
    last_split = 0.0
    for i in range(count):
        split = float(splits[i])
        fc = corners.copy()
        for k in range(4):
            dist = fc[k + 4] - fc[k]
            fc[k + 4] = fc[k] + dist * split
            fc[k] = fc[k] + dist * last_split

        center = fc.mean(0)
        radius = float(np.max(np.linalg.norm(fc - center, axis=-1)))
        radius = np.ceil(radius * 16.0) / 16.0

        max_extents = np.array([radius] * 3, np.float32)
        min_extents = -max_extents

        light_view = math3d.look_at_rh(
            center - sun_dir * min_extents[2], center, np.array([0.0, 1.0, 0.0])
        )
        light_ortho = math3d.orthographic_rh(
            min_extents[0], max_extents[0], min_extents[1], max_extents[1],
            -(max_extents[2] - min_extents[2]), max_extents[2] - min_extents[2],
        )
        matrices[i] = light_ortho @ light_view
        split_depths[i] = near + split * clip_range
        last_split = split

    return matrices, split_depths


def calculate_shadow(
    position: jax.Array,  # (H, W, 3) world positions
    view_matrix: jax.Array,  # (4, 4)
    shadow_map: jax.Array,  # (CASCADES, S, S) depth
    cascade_view_proj: jax.Array,  # (CASCADES, 4, 4)
    cascade_split_depths: jax.Array,  # (CASCADES,)
) -> tuple[jax.Array, jax.Array]:
    """Per-pixel CSM factor (shadow_mapping.glsl:8-54): cascade select by
    view-space z, 3x3 PCF, out-of-frustum = lit. Returns (shadow, cascade).

    TPU formulation: the per-pixel cascade matrix fetch is a static unroll +
    select over the <= 4 cascades, and the 9 PCF taps come from FOUR packed
    quad-row gathers — the shadow map reshaped to non-overlapping 2x2 quads
    (C*(S/2)^2, 4) — instead of nine per-lane 3D gathers (which lower to
    table scans; measured 54 ms/frame at 512², PERFORMANCE.md). A 3x3
    window spans at most 2 quads per axis; the 9 taps select out of the 16
    fetched texels by parity. Exact same values as the direct formulation.
    """
    n_cascades = shadow_map.shape[0]
    size = shadow_map.shape[1]

    view_z = (
        position @ view_matrix[2, :3] + view_matrix[2, 3]
    )  # view-space z (negative in front)

    cascade = jnp.zeros(position.shape[:-1], jnp.int32)
    for i in range(n_cascades - 1):
        cascade = jnp.where(view_z < -cascade_split_depths[i], i + 1, cascade)

    # Per-cascade projection, statically unrolled + selected (a per-pixel
    # (4,4) matrix gather from a 4-row table lowers to a table scan).
    lsp = jnp.zeros(position.shape[:-1] + (3,), jnp.float32)
    lsw = jnp.zeros(position.shape[:-1], jnp.float32)
    for i in range(n_cascades):
        mi = cascade_view_proj[i]
        lsp_i = position @ mi[:3, :3].T + mi[:3, 3]
        lsw_i = position @ mi[3, :3] + mi[3, 3]
        sel = cascade == i
        lsp = jnp.where(sel[..., None], lsp_i, lsp)
        lsw = jnp.where(sel, lsw_i, lsw)
    proj = lsp / jnp.maximum(jnp.abs(lsw), 1e-9)[..., None] * jnp.sign(lsw)[..., None]
    uv = proj[..., :2] * 0.5 + 0.5
    # FLIP_UV_Y (view.glsl:40-45).
    depth_ref = proj[..., 2]

    in_range = (depth_ref <= 1.0) & (depth_ref > -1.0)

    # Base texel: floor + per-tap clamp reproduces the per-tap
    # truncate-then-clamp exactly (they only differ for coordinates the
    # clamp sends to texel 0 anyway).
    fx = uv[..., 0] * size
    fy = (1.0 - uv[..., 1]) * size
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)

    # Quad-packed shadow map: (C, S, S) -> (C*(S/2)*(S/2), 4) rows of
    # non-overlapping 2x2 blocks [ (2q, 2p), (2q, 2p+1), (2q+1, 2p),
    # (2q+1, 2p+1) ].
    half = size // 2
    quads = (
        shadow_map.reshape(n_cascades, half, 2, half, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 4)
    )

    def quad_row(qy, qx):
        return cascade * (half * half) + qy * half + qx

    qx_lo = jnp.clip(x0 - 1, 0, size - 1) >> 1
    qx_hi = jnp.clip(x0 + 1, 0, size - 1) >> 1
    qy_lo = jnp.clip(y0 - 1, 0, size - 1) >> 1
    qy_hi = jnp.clip(y0 + 1, 0, size - 1) >> 1

    from rust_renderer_tpu.ops.gather import row_gather

    shape = x0.shape

    def fetch(qy, qx):
        rows = row_gather(quads, quad_row(qy, qx).reshape(-1))
        return rows.reshape(shape + (4,))

    q_ll = fetch(qy_lo, qx_lo)
    q_lh = fetch(qy_lo, qx_hi)
    q_hl = fetch(qy_hi, qx_lo)
    q_hh = fetch(qy_hi, qx_hi)

    def tap(dy: int, dx: int) -> jax.Array:
        cx = jnp.clip(x0 + dx, 0, size - 1)
        cy = jnp.clip(y0 + dy, 0, size - 1)
        use_lo_x = (cx >> 1) == qx_lo
        use_lo_y = (cy >> 1) == qy_lo
        q = jnp.where(
            use_lo_y[..., None],
            jnp.where(use_lo_x[..., None], q_ll, q_lh),
            jnp.where(use_lo_x[..., None], q_hl, q_hh),
        )
        i = cy & 1
        j = cx & 1
        return jnp.where(
            i == 0,
            jnp.where(j == 0, q[..., 0], q[..., 1]),
            jnp.where(j == 0, q[..., 2], q[..., 3]),
        )

    shadow = jnp.zeros(position.shape[:-1], jnp.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            closest = tap(dy, dx)
            lit = jnp.where(
                depth_ref - SHADOW_BIAS > closest, SHADOW_FACTOR, 1.0
            )
            shadow = shadow + jnp.where(in_range, lit, 1.0)

    return shadow / 9.0, cascade


def cascade_debug_color(cascade: jax.Array) -> jax.Array:
    """shadow_mapping.glsl:56-68 (static unroll — no per-pixel table gather)."""
    colors = (
        (1.0, 0.25, 0.25),
        (0.25, 1.0, 0.25),
        (0.25, 0.25, 1.0),
        (1.0, 1.0, 0.25),
    )
    c = jnp.clip(cascade, 0, 3)
    out = jnp.zeros(cascade.shape + (3,), jnp.float32)
    for i, col in enumerate(colors):
        out = jnp.where((c == i)[..., None], jnp.asarray(col, jnp.float32), out)
    return out
