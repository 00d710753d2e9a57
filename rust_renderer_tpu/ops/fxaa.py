"""FXAA 3.11-style antialiasing (rebuild of utopian/shaders/include/fxaa.glsl,
itself following Simon Rodriguez's "implementing FXAA" write-up).

Stages: luma edge detection against relative/absolute thresholds, horizontal/
vertical edge classification, edge endpoint search (iterative walk with the
quality step table), edge-center offset, and subpixel blending.

TPU formulation: the edge walk's sample offsets are STATIC magnitudes (the
QUALITY table) along a per-pixel axis, and every bilinear tap sits at a
half-texel offset perpendicular to the edge — so every probe is expressible
as shifted-image reads (pad + slice at static offsets) combined by per-pixel
selects, and the whole filter is gather-free (per-pixel dynamic-coordinate
bilinear taps lower to table scans on TPU; measured 162 ms/frame at 512² —
see PERFORMANCE.md). The walk becomes a first-hit scan over precomputed
probe values; results are exact vs the dynamic-gather formulation.

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

# Cumulative walk distances: probe k sits DISTS[k] pixels along the edge
# (initial step 1.0, then QUALITY[1..ITERATIONS-1]).
_DISTS = [1.0]
for _i in range(1, ITERATIONS):
    _DISTS.append(_DISTS[-1] + QUALITY[min(_i, len(QUALITY) - 1)])
_MAX_OFF = int(_DISTS[-1]) + 1


def _shift(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Clamped-edge neighbor fetch (textureOffset clamp semantics: border
    pixels must see their own edge, not the opposite border)."""
    h, w = img.shape[:2]
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


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
    s_pos = jnp.logical_not(is_1_steepest)  # step_len > 0

    # Probe luma at static offsets: every walk sample sits `d` pixels along
    # the edge axis and half a texel toward the steeper side — i.e.
    # 0.5 * (L(axis+d) + L(axis+d, perp+step)). Pad once, slice statically.
    mo = _MAX_OFF
    pl_ = jnp.pad(luma, ((mo, mo), (mo, mo)), mode="edge")

    def sh(dy: int, dx: int) -> jax.Array:
        return pl_[mo + dy : mo + dy + h, mo + dx : mo + dx + w]

    _probe_cache: dict[int, jax.Array] = {}

    def probe_int(d: int) -> jax.Array:
        if d not in _probe_cache:
            ph = 0.5 * (sh(0, d) + jnp.where(s_pos, sh(1, d), sh(-1, d)))
            pv = 0.5 * (sh(d, 0) + jnp.where(s_pos, sh(d, 1), sh(d, -1)))
            _probe_cache[d] = jnp.where(is_horizontal, ph, pv)
        return _probe_cache[d]

    def probe(dist: float, sign: int) -> jax.Array:
        if dist == int(dist):
            return probe_int(sign * int(dist))
        lo = int(dist - 0.5)
        return 0.5 * (probe_int(sign * lo) + probe_int(sign * (lo + 1)))

    # First-hit scan replaces the frozen-position walk: the final distance /
    # end-luma are those of the first probe exceeding grad_scaled (or the
    # last probe if none does) — exactly the masked-walk semantics.
    reached1 = jnp.zeros((h, w), bool)
    reached2 = jnp.zeros((h, w), bool)
    dist1 = jnp.zeros((h, w), jnp.float32)
    dist2 = jnp.zeros((h, w), jnp.float32)
    l_end1 = jnp.zeros((h, w), jnp.float32)
    l_end2 = jnp.zeros((h, w), jnp.float32)
    for k, dk in enumerate(_DISTS):
        e1 = probe(dk, -1) - l_local_avg
        e2 = probe(dk, +1) - l_local_avg
        upd1 = jnp.logical_not(reached1)
        upd2 = jnp.logical_not(reached2)
        dist1 = jnp.where(upd1, dk, dist1)
        dist2 = jnp.where(upd2, dk, dist2)
        l_end1 = jnp.where(upd1, e1, l_end1)
        l_end2 = jnp.where(upd2, e2, l_end2)
        reached1 = reached1 | (jnp.abs(e1) >= grad_scaled)
        reached2 = reached2 | (jnp.abs(e2) >= grad_scaled)
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

    # Final resample sits final_offset texels perpendicular to the edge:
    # (1-f)*C + f*C(perp+step) — two-texel lerp via static shifts.
    def shc(dy: int, dx: int) -> jax.Array:
        p = jnp.pad(color, ((1, 1), (1, 1), (0, 0)), mode="edge")
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    s3 = s_pos[..., None]
    neighbor = jnp.where(
        is_horizontal[..., None],
        jnp.where(s3, shc(1, 0), shc(-1, 0)),
        jnp.where(s3, shc(0, 1), shc(0, -1)),
    )
    f3 = final_offset[..., None]
    aa = (1.0 - f3) * color + f3 * neighbor

    use_aa = jnp.logical_and(jnp.logical_not(no_edge), jnp.asarray(enabled) == 1)
    edge_dir_color = jnp.where(
        is_horizontal[..., None],
        jnp.asarray([1.0, 0.0, 0.0], color.dtype),
        jnp.asarray([0.0, 1.0, 0.0], color.dtype),
    )
    aa = jnp.where(jnp.asarray(debug) == 1, edge_dir_color, aa)
    return jnp.where(use_aa[..., None], aa, color)
