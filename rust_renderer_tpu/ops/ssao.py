"""Screen-space ambient occlusion.

Rebuild of utopian/shaders/ssao/ssao.frag: 32-sample hemisphere kernel
oriented by a TBN about the view-space normal, view-space depth comparison
with smoothstep range check, strength 1.6, sky early-out where the position
buffer holds the clear value (1,1,1). The reference hardcodes a generated
kernel (ssao.frag:31-64 notes it "will be replaced by a random kernel");
we generate an equivalent cosine-ish hemisphere kernel deterministically.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

KERNEL_SIZE = 32
STRENGTH = 1.6


def _make_kernel(n: int = KERNEL_SIZE, seed: int = 17) -> np.ndarray:
    """Hemisphere (z >= 0) samples, biased toward the center like the
    classic LearnOpenGL kernel the reference generated its constants from."""
    rng = np.random.default_rng(seed)
    v = rng.uniform([-1, -1, 0], [1, 1, 1], (n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= rng.uniform(0, 1, (n, 1))
    scale = 0.1 + 0.9 * (np.arange(n) / n) ** 2  # lerp(0.1, 1.0, (i/n)^2)
    return (v * scale[:, None]).astype(np.float32)


_KERNEL = jnp.asarray(_make_kernel())


def ssao(
    gbuffer_position: jax.Array,  # (H, W, 4) world pos (w unused)
    gbuffer_normal: jax.Array,  # (H, W, 4)
    view_matrix: jax.Array,  # (4, 4)
    projection: jax.Array,  # (4, 4)
    radius: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """Returns (H, W) occlusion in [0, 1] (1 = unoccluded)."""
    h, w = gbuffer_position.shape[:2]
    pos_world = gbuffer_position[..., :3]

    # Sky early-out: position cleared to 1 (ssao.frag:77-81).
    is_sky = jnp.all(pos_world == 1.0, axis=-1)

    pos_view = (
        jnp.einsum("ij,hwj->hwi", view_matrix[:3, :3], pos_world) + view_matrix[:3, 3]
    )
    normal_world = gbuffer_normal[..., :3]
    # normalMatrix = transpose(inverse(view)) (ssao.frag:84-86).
    normal_matrix = jnp.linalg.inv(view_matrix).T
    normal_view = jnp.einsum("ij,hwj->hwi", normal_matrix[:3, :3], normal_world)
    normal_view = normal_view / jnp.maximum(
        jnp.linalg.norm(normal_view, axis=-1, keepdims=True), 1e-9
    )

    # TBN from the fixed random vector (1,1,0) (ssao.frag:88-96).
    random_vec = jnp.asarray([1.0, 1.0, 0.0])
    t = random_vec - normal_view * jnp.sum(random_vec * normal_view, -1, keepdims=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(t, normal_view)

    # Screen-space view-depth image, computed ONCE: gathering this equals
    # view-projecting the gathered world position (same dot product), so the
    # per-sample fetch is one packed-row gather of a single float instead of
    # a 3-channel per-lane 2D gather (which lowers to table scans on TPU —
    # measured 104 ms/frame at 512²). All 32 samples batch into ONE gather.
    from rust_renderer_tpu.ops.gather import row_gather

    vz = (
        jnp.einsum("j,hwj->hw", view_matrix[2, :3], pos_world)
        + view_matrix[2, 3]
    )

    sample_idx = []
    sample_z = []
    for i in range(KERNEL_SIZE):
        k = _KERNEL[i]
        sample_view = (
            t * k[0] + b * k[1] + normal_view * k[2]
        ) * radius + pos_view

        # Project to screen (ssao.frag:104-110).
        clip = (
            jnp.einsum("ij,hwj->hwi", projection[:3, :3], sample_view)
            + projection[:3, 3]
        )
        cw = (
            jnp.einsum("j,hwj->hw", projection[3, :3], sample_view) + projection[3, 3]
        )
        ndc = clip / jnp.maximum(jnp.abs(cw), 1e-9)[..., None] * jnp.sign(cw)[..., None]
        suv = ndc[..., :2] * 0.5 + 0.5
        suv = jnp.stack([suv[..., 0], 1.0 - suv[..., 1]], axis=-1)  # FLIP_UV_Y
        sx = jnp.clip((suv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        sy = jnp.clip((suv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        sample_idx.append(sy * w + sx)
        sample_z.append(sample_view[..., 2])

    idx = jnp.stack(sample_idx).reshape(-1)
    fetched = row_gather(vz.reshape(-1, 1), idx).reshape(KERNEL_SIZE, h, w)

    occlusion = jnp.zeros((h, w), jnp.float32)
    for i in range(KERNEL_SIZE):
        sample_depth = fetched[i]
        denom = jnp.maximum(jnp.abs(pos_view[..., 2] - sample_depth), 1e-9)
        range_check = jnp.clip(radius / denom, 0.0, 1.0)
        range_check = range_check * range_check * (3.0 - 2.0 * range_check)  # smoothstep
        occluded = (sample_depth >= sample_z[i] + bias).astype(jnp.float32)
        occlusion = occlusion + occluded * range_check

    result = 1.0 - (occlusion / KERNEL_SIZE) * STRENGTH
    return jnp.where(is_sky, 1.0, result)


# -- static shift-stencil formulation (TPU hot path) --------------------------
#
# The exact formulation above fetches one view-depth per (pixel, sample) at a
# DYNAMIC screen coordinate: 32·W·H gather indices. TPU gather cost is
# ~9 ns/index regardless of table size or coherence (PERFORMANCE.md r3 gather
# cost law), so 1080p pays ~600 ms — a hard floor for any gather form. The
# stencil form below removes every dynamic index, the same re-design that
# made FXAA gather-free (ops/fxaa.py): precompute the view-depth image
# shifted by K STATIC pixel offsets (8 directions x RINGS log-spaced radii),
# then quantize each sample's projected tap to the nearest static offset and
# combine the planes with per-pixel selects. Selects are dense VPU work that
# XLA fuses; there are no per-pixel dynamic addresses anywhere.
#
# This is an approximation of ssao.frag's tap positions (radial snap <= half
# an octave, angular snap <= 22.5 deg) — the hemisphere kernel itself is
# already random and the reference never blurs (ssao.rs:34-36), so the snap
# reads as a slightly different noise pattern, not banding; raster goldens
# are blessed against this form.

_DIRS = 8
_RINGS = (1, 2, 4, 8, 16, 32)


def _shift2(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """Edge-clamped static shift (textureOffset clamp semantics)."""
    h, w = img.shape[:2]
    ay, ax = abs(int(dy)), abs(int(dx))
    p = jnp.pad(img, ((ay, ay), (ax, ax)), mode="edge")
    return p[ay + dy: ay + dy + h, ax + dx: ax + dx + w]


def ssao_stencil(
    gbuffer_position: jax.Array,
    gbuffer_normal: jax.Array,
    view_matrix: jax.Array,
    projection: jax.Array,
    radius: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """Gather-free SSAO: same kernel/TBN/range-check math as `ssao`, taps
    snapped to a static shift stencil. Returns (H, W) in [0, 1]."""
    h, w = gbuffer_position.shape[:2]
    pos_world = gbuffer_position[..., :3]
    is_sky = jnp.all(pos_world == 1.0, axis=-1)

    pos_view = (
        jnp.einsum("ij,hwj->hwi", view_matrix[:3, :3], pos_world)
        + view_matrix[:3, 3]
    )
    normal_world = gbuffer_normal[..., :3]
    normal_matrix = jnp.linalg.inv(view_matrix).T
    normal_view = jnp.einsum("ij,hwj->hwi", normal_matrix[:3, :3], normal_world)
    normal_view = normal_view / jnp.maximum(
        jnp.linalg.norm(normal_view, axis=-1, keepdims=True), 1e-9
    )
    random_vec = jnp.asarray([1.0, 1.0, 0.0])
    t = random_vec - normal_view * jnp.sum(random_vec * normal_view, -1, keepdims=True)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(t, normal_view)

    vz = (
        jnp.einsum("j,hwj->hw", view_matrix[2, :3], pos_world)
        + view_matrix[2, 3]
    )

    # K static shifted view-depth planes: ring r along direction d.
    # Directions follow screen axes (x right, y down to match the sy/sx
    # convention of the exact path).
    planes = []
    for d in range(_DIRS):
        ang = 2.0 * np.pi * d / _DIRS
        ux, uy = np.cos(ang), np.sin(ang)
        row = []
        for r in _RINGS:
            dx, dy = int(round(ux * r)), int(round(uy * r))
            row.append(_shift2(vz, dy, dx))
        planes.append(row)

    # The pixel's own projected position (the quantization origin).
    clip_c = (
        jnp.einsum("ij,hwj->hwi", projection[:3, :3], pos_view)
        + projection[:3, 3]
    )
    cw_c = jnp.einsum("j,hwj->hw", projection[3, :3], pos_view) + projection[3, 3]
    ndc_c = clip_c[..., :2] / jnp.maximum(jnp.abs(cw_c), 1e-9)[..., None] \
        * jnp.sign(cw_c)[..., None]

    n_rings = len(_RINGS)
    log_r0 = float(np.log2(_RINGS[0]))
    occlusion = jnp.zeros((h, w), jnp.float32)
    for i in range(KERNEL_SIZE):
        k = _KERNEL[i]
        sample_view = (
            t * k[0] + b * k[1] + normal_view * k[2]
        ) * radius + pos_view
        clip = (
            jnp.einsum("ij,hwj->hwi", projection[:3, :3], sample_view)
            + projection[:3, 3]
        )
        cw = (
            jnp.einsum("j,hwj->hw", projection[3, :3], sample_view)
            + projection[3, 3]
        )
        ndc = clip[..., :2] / jnp.maximum(jnp.abs(cw), 1e-9)[..., None] \
            * jnp.sign(cw)[..., None]
        # Pixel-space offset from the pixel's own tap (FLIP_UV_Y: screen y
        # runs opposite to ndc y, matching the exact path's 1-uv.y).
        fx = (ndc[..., 0] - ndc_c[..., 0]) * (0.5 * w)
        fy = (ndc_c[..., 1] - ndc[..., 1]) * (0.5 * h)

        # Quantize: nearest direction sector and nearest log2 ring.
        ang = jnp.arctan2(fy, fx)  # [-pi, pi], 0 = +x
        sector = jnp.mod(
            jnp.round(ang * (_DIRS / (2.0 * np.pi))).astype(jnp.int32), _DIRS
        )
        rad = jnp.sqrt(fx * fx + fy * fy)
        ring = jnp.clip(
            jnp.round(jnp.log2(jnp.maximum(rad, 1e-6)) - log_r0)
            .astype(jnp.int32),
            0, n_rings - 1,
        )
        # Sub-pixel taps (projected offset < half the innermost ring) snap
        # to the pixel itself: always "occluded at own depth" would
        # self-shadow, so mark them unoccluded via an out-of-range sector.
        tiny = rad < 0.5 * _RINGS[0]

        fetched = jnp.zeros((h, w), jnp.float32)
        for d in range(_DIRS):
            in_d = sector == d
            for ri in range(n_rings):
                m = in_d & (ring == ri)
                fetched = jnp.where(m, planes[d][ri], fetched)

        sample_depth = fetched
        denom = jnp.maximum(jnp.abs(pos_view[..., 2] - sample_depth), 1e-9)
        range_check = jnp.clip(radius / denom, 0.0, 1.0)
        range_check = range_check * range_check * (3.0 - 2.0 * range_check)
        occluded = (sample_depth >= sample_view[..., 2] + bias) & ~tiny
        occlusion = occlusion + occluded.astype(jnp.float32) * range_check

    result = 1.0 - (occlusion / KERNEL_SIZE) * STRENGTH
    return jnp.where(is_sky, 1.0, result)


def ssao_blur(occlusion: jax.Array, radius: int = 2) -> jax.Array:
    """Box blur of the SSAO term. The reference ships ssao/blur.frag but never
    wires it into the graph (renderers/ssao.rs:34-36); kept here unwired for
    the same parity — setup_ssao_pass does not call it."""
    h, w = occlusion.shape
    acc = jnp.zeros_like(occlusion)
    count = (2 * radius + 1) ** 2
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            acc = acc + jnp.roll(jnp.roll(occlusion, dy, 0), dx, 1)
    return acc / count
