"""Microfacet BRDF pieces (rebuild of utopian/shaders/include/brdf.glsl).

GGX normal distribution, Schlick-GGX/Smith geometry, Fresnel-Schlick,
Hammersley sequence and GGX importance sampling — vectorized over pixel or
sample batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = 3.14159265359


def _dot_clamped(a, b):
    return jnp.maximum(jnp.sum(a * b, axis=-1), 0.0)


def distribution_ggx(n, h, roughness):
    """GGX NDF (brdf.glsl:3-16)."""
    a = roughness * roughness
    a2 = a * a
    ndoth = _dot_clamped(n, h)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(ndotv, roughness):
    """Direct-lighting k remapping (brdf.glsl:18-28)."""
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(n, v, l, roughness):
    """(brdf.glsl:30-37)."""
    ndotv = _dot_clamped(n, v)
    ndotl = _dot_clamped(n, l)
    return geometry_schlick_ggx(ndotv, roughness) * geometry_schlick_ggx(ndotl, roughness)


def fresnel_schlick(cos_theta, f0):
    """(brdf.glsl:82-85). f0: (...,3); cos_theta: (...,)."""
    return f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0
    )[..., None]


def fresnel_schlick_roughness(cos_theta, f0, roughness):
    """(brdf.glsl:87-91)."""
    max_refl = jnp.maximum(1.0 - roughness[..., None], f0)
    return f0 + (max_refl - f0) * jnp.power(jnp.clip(1.0 - cos_theta, 0.0, 1.0), 5.0)[..., None]


def _glsl_random(co):
    """byteblacksmith one-liner rand (brdf.glsl:40-48); co: (...,2)."""
    dt = co[..., 0] * 12.9898 + co[..., 1] * 78.233
    sn = jnp.mod(dt, 3.14)
    return jnp.mod(jnp.sin(sn) * 43758.5453, 1.0)


def hammersley2d(i, n):
    """Radical-inverse pair (brdf.glsl:51-60). i: int array, n: int."""
    bits = i.astype(jnp.uint32)
    bits = (bits << jnp.uint32(16)) | (bits >> jnp.uint32(16))
    bits = ((bits & jnp.uint32(0x55555555)) << jnp.uint32(1)) | (
        (bits & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)
    )
    bits = ((bits & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
        (bits & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)
    )
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
        (bits & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)
    )
    bits = ((bits & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
        (bits & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)
    )
    rdi = bits.astype(jnp.float32) * 2.3283064365386963e-10
    return jnp.stack([i.astype(jnp.float32) / n, rdi], axis=-1)


def importance_sample_ggx(xi, roughness, normal):
    """Map a 2D point to a GGX-distributed half vector about `normal`
    (brdf.glsl:63-80), including the reference's small random phi jitter.

    xi: (...,2); roughness: (...,); normal: (...,3). Returns (...,3)."""
    alpha = roughness * roughness
    phi = 2.0 * PI * xi[..., 0] + _glsl_random(
        jnp.stack([normal[..., 0], normal[..., 2]], -1)
    ) * 0.1
    cos_theta = jnp.sqrt((1.0 - xi[..., 1]) / (1.0 + (alpha * alpha - 1.0) * xi[..., 1]))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    h = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )

    up = jnp.where(
        (jnp.abs(normal[..., 2]) < 0.999)[..., None],
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), normal.shape),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), normal.shape),
    )
    tx = jnp.cross(up, normal)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = jnp.cross(normal, tx)
    ty = ty / jnp.maximum(jnp.linalg.norm(ty, axis=-1, keepdims=True), 1e-12)
    out = tx * h[..., 0:1] + ty * h[..., 1:2] + normal * h[..., 2:3]
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
