"""FXAA 3.11-style antialiasing (rebuild of utopian/shaders/include/fxaa.glsl,
itself following Simon Rodriguez's "implementing FXAA" write-up).

Stages: luma edge detection against relative/absolute thresholds, horizontal/
vertical edge classification, edge endpoint search (iterative walk with the
quality step table), edge-center offset, and subpixel blending. Vectorized
over the full image; the per-pixel iterative walk becomes a fixed unrolled
loop with per-lane done-masks.

The settings UBO of the present pass (enabled, debug, threshold 0.45,
renderers/present.rs:13-31) maps to the function arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops.colors import luminance

EDGE_THRESHOLD_MIN = 0.0312
ITERATIONS = 7
QUALITY = (1.0, 1.0, 1.0, 1.5, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 4.0, 8.0)
SUBPIXEL_QUALITY = 0.75


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Clamped-edge neighbor fetch (textureOffset clamp semantics: border
    pixels must see their own edge, not the opposite border)."""
    h, w = img.shape[:2]
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def _sample_bilinear(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """img: (H, W, C); u, v in pixel units."""
    h, w = img.shape[:2]
    x0 = jnp.floor(u - 0.5)
    y0 = jnp.floor(v - 0.5)
    fx = (u - 0.5 - x0)[..., None]
    fy = (v - 0.5 - y0)[..., None]

    def at(xi, yi):
        x = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        y = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return img[y, x]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy


def fxaa(color: jax.Array, threshold: jax.Array | float = 0.45,
         enabled: jax.Array | int = 1,
         debug: jax.Array | int = 0) -> jax.Array:
    """color: (H, W, 3) in display (sRGB-ish) space. threshold is the
    relative edge threshold from the present pass settings. debug=1 paints
    antialiased pixels red (horizontal edge) / green (vertical edge), the
    edge-direction debug view of fxaa.glsl:247-258."""
    h, w = color.shape[:2]
    luma = luminance(color)

    l_c = luma
    l_d = _shift(luma, 1, 0)
    l_u = _shift(luma, -1, 0)
    l_l = _shift(luma, 0, -1)
    l_r = _shift(luma, 0, 1)

    l_min = jnp.minimum(l_c, jnp.minimum(jnp.minimum(l_d, l_u), jnp.minimum(l_l, l_r)))
    l_max = jnp.maximum(l_c, jnp.maximum(jnp.maximum(l_d, l_u), jnp.maximum(l_l, l_r)))
    l_range = l_max - l_min

    no_edge = l_range < jnp.maximum(EDGE_THRESHOLD_MIN, l_max * 0.125 * threshold)

    l_dl = _shift(luma, 1, -1)
    l_ur = _shift(luma, -1, 1)
    l_ul = _shift(luma, -1, -1)
    l_dr = _shift(luma, 1, 1)

    l_down_up = l_d + l_u
    l_left_right = l_l + l_r
    l_left_corners = l_dl + l_ul
    l_down_corners = l_dl + l_dr
    l_right_corners = l_dr + l_ur
    l_up_corners = l_ur + l_ul

    edge_h = (
        jnp.abs(-2.0 * l_l + l_left_corners)
        + jnp.abs(-2.0 * l_c + l_down_up) * 2.0
        + jnp.abs(-2.0 * l_r + l_right_corners)
    )
    edge_v = (
        jnp.abs(-2.0 * l_u + l_up_corners)
        + jnp.abs(-2.0 * l_c + l_left_right) * 2.0
        + jnp.abs(-2.0 * l_d + l_down_corners)
    )
    is_horizontal = edge_h >= edge_v

    l1 = jnp.where(is_horizontal, l_u, l_l)
    l2 = jnp.where(is_horizontal, l_d, l_r)
    grad1 = l1 - l_c
    grad2 = l2 - l_c
    is_1_steepest = jnp.abs(grad1) >= jnp.abs(grad2)
    grad_scaled = 0.25 * jnp.maximum(jnp.abs(grad1), jnp.abs(grad2))

    step_len = jnp.where(is_1_steepest, -1.0, 1.0)
    l_local_avg = jnp.where(
        is_1_steepest, 0.5 * (l1 + l_c), 0.5 * (l2 + l_c)
    )

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    cur_u = jnp.where(is_horizontal, xs, xs + step_len * 0.5)
    cur_v = jnp.where(is_horizontal, ys + step_len * 0.5, ys)

    off_u = jnp.where(is_horizontal, 1.0, 0.0)
    off_v = jnp.where(is_horizontal, 0.0, 1.0)

    # March both directions along the edge.
    u1, v1 = cur_u - off_u, cur_v - off_v
    u2, v2 = cur_u + off_u, cur_v + off_v
    luma_img = luma[..., None]
    l_end1 = _sample_bilinear(luma_img, u1, v1)[..., 0] - l_local_avg
    l_end2 = _sample_bilinear(luma_img, u2, v2)[..., 0] - l_local_avg
    reached1 = jnp.abs(l_end1) >= grad_scaled
    reached2 = jnp.abs(l_end2) >= grad_scaled

    for i in range(1, ITERATIONS):
        q = QUALITY[min(i, len(QUALITY) - 1)]
        u1 = jnp.where(reached1, u1, u1 - off_u * q)
        v1 = jnp.where(reached1, v1, v1 - off_v * q)
        u2 = jnp.where(reached2, u2, u2 + off_u * q)
        v2 = jnp.where(reached2, v2, v2 + off_v * q)
        l_end1 = jnp.where(
            reached1, l_end1, _sample_bilinear(luma_img, u1, v1)[..., 0] - l_local_avg
        )
        l_end2 = jnp.where(
            reached2, l_end2, _sample_bilinear(luma_img, u2, v2)[..., 0] - l_local_avg
        )
        reached1 = reached1 | (jnp.abs(l_end1) >= grad_scaled)
        reached2 = reached2 | (jnp.abs(l_end2) >= grad_scaled)

    dist1 = jnp.where(is_horizontal, xs - u1, ys - v1)
    dist2 = jnp.where(is_horizontal, u2 - xs, v2 - ys)
    is_dir1 = dist1 < dist2
    dist_final = jnp.minimum(dist1, dist2)
    edge_len = dist1 + dist2

    pixel_offset = -dist_final / jnp.maximum(edge_len, 1e-9) + 0.5

    is_l_center_smaller = l_c < l_local_avg
    correct_variation = (
        jnp.where(is_dir1, l_end1, l_end2) < 0.0
    ) != is_l_center_smaller
    final_offset = jnp.where(correct_variation, pixel_offset, 0.0)

    # Subpixel antialiasing.
    l_avg = (1.0 / 12.0) * (
        2.0 * (l_down_up + l_left_right) + l_left_corners + l_right_corners
    )
    sub_off1 = jnp.clip(jnp.abs(l_avg - l_c) / jnp.maximum(l_range, 1e-9), 0.0, 1.0)
    sub_off2 = (-2.0 * sub_off1 + 3.0) * sub_off1 * sub_off1
    sub_off_final = sub_off2 * sub_off2 * SUBPIXEL_QUALITY
    final_offset = jnp.maximum(final_offset, sub_off_final)

    fu = jnp.where(is_horizontal, xs, xs + final_offset * step_len)
    fv = jnp.where(is_horizontal, ys + final_offset * step_len, ys)
    aa = _sample_bilinear(color, fu, fv)

    use_aa = jnp.logical_and(jnp.logical_not(no_edge), jnp.asarray(enabled) == 1)
    edge_dir_color = jnp.where(
        is_horizontal[..., None],
        jnp.asarray([1.0, 0.0, 0.0], color.dtype),
        jnp.asarray([0.0, 1.0, 0.0], color.dtype),
    )
    aa = jnp.where(jnp.asarray(debug) == 1, edge_dir_color, aa)
    return jnp.where(use_aa[..., None], aa, color)
