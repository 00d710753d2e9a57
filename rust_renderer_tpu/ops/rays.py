"""Ray generation and primitive intersection.

Rebuilds, vectorized over whole pixel/ray arrays:
- pinhole camera ray generation from inverse view/projection
  (pathtrace_reference/reference.rgen:31-38, jittered in the caller),
- self-intersection-safe origin offsetting, the Ray Tracing Gems ch.6 method
  (include/view.glsl:90-109),
- ray/sphere intersection (include/atmosphere.glsl:55-71 shape, plus the
  implicit sphere tracing the RTIOW path needs),
- watertight-enough Möller–Trumbore ray/triangle intersection (the analog of
  the hardware triangle intersector behind traceRayEXT).

Shapes: rays are (..., 3) float32 arrays; all ops broadcast over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)


def generate_camera_rays(
    inverse_view: jax.Array,
    inverse_projection: jax.Array,
    pixel_centers_x: jax.Array,
    pixel_centers_y: jax.Array,
    width: int,
    height: int,
) -> tuple[jax.Array, jax.Array]:
    """Pinhole rays through jittered pixel centers (reference.rgen:30-38).

    pixel_centers_*: (...,) float pixel coordinates (already jittered).
    Returns (origin (...,3), direction (...,3)); direction normalized.
    """
    u = pixel_centers_x / jnp.float32(width)
    v = pixel_centers_y / jnp.float32(height)
    v = 1.0 - v  # inUV.y flip (reference.rgen:33)
    d = jnp.stack([u, v], axis=-1) * 2.0 - 1.0

    origin = inverse_view[:3, 3]  # inverse_view * (0,0,0,1)
    target = (
        inverse_projection[:3, 0] * d[..., 0:1]
        + inverse_projection[:3, 1] * d[..., 1:2]
        + inverse_projection[:3, 2]
        + inverse_projection[:3, 3]
    )
    tw = (
        inverse_projection[3, 0] * d[..., 0]
        + inverse_projection[3, 1] * d[..., 1]
        + inverse_projection[3, 2]
        + inverse_projection[3, 3]
    )
    target = target / tw[..., None]
    tn = target / jnp.linalg.norm(target, axis=-1, keepdims=True)
    direction = tn @ inverse_view[:3, :3].T
    origin = jnp.broadcast_to(origin, direction.shape)
    return origin, direction


def offset_ray(p: jax.Array, n: jax.Array) -> jax.Array:
    """Self-intersection-safe origin offset (view.glsl:90-109), exact port of
    the Ray Tracing Gems ch.6 integer-ulp trick via float32 bitcasts."""
    origin = jnp.float32(1.0 / 32.0)
    float_scale = jnp.float32(1.0 / 65536.0)
    int_scale = jnp.float32(256.0)

    of_i = (int_scale * n).astype(jnp.int32)
    p_bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    p_i = jax.lax.bitcast_convert_type(
        p_bits + jnp.where(p < 0, -of_i, of_i), jnp.float32
    )
    return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_i)


def intersect_sphere(
    ray_origin: jax.Array,
    ray_dir: jax.Array,
    center: jax.Array,
    radius: jax.Array,
    t_min: float | jax.Array = 1e-3,
    t_max: float | jax.Array = 1e4,
) -> tuple[jax.Array, jax.Array]:
    """Nearest positive hit t in (t_min, t_max), else INF.

    ray_*: (..., 3); center: (..., 3) or (3,); radius scalar or (...,).
    Returns (t, hit_mask).
    """
    oc = ray_origin - center
    a = jnp.sum(ray_dir * ray_dir, axis=-1)
    half_b = jnp.sum(oc * ray_dir, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * c
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-half_b - sqrt_d) / a
    t1 = (-half_b + sqrt_d) / a
    t = jnp.where((t0 > t_min) & (t0 < t_max), t0, t1)
    hit = (disc > 0.0) & (t > t_min) & (t < t_max)
    return jnp.where(hit, t, INF), hit


def intersect_triangle(
    ray_origin: jax.Array,
    ray_dir: jax.Array,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    t_min: float | jax.Array = 1e-3,
    t_max: float | jax.Array = 1e4,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Möller–Trumbore. Returns (t, u, v, hit); t=INF on miss.

    Barycentrics: P = (1-u-v)·v0 + u·v1 + v·v2. Backfaces are hit (the
    reference traces with gl_RayFlagsOpaqueEXT and culling disabled,
    raytracing.rs:266-269).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(ray_dir, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ray_origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_dir * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(hit, t, INF), u, v, hit


def reflect(d: jax.Array, n: jax.Array) -> jax.Array:
    """GLSL reflect()."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(d: jax.Array, n: jax.Array, eta: jax.Array) -> jax.Array:
    """GLSL refract(); d, n normalized; eta = n1/n2 (broadcast over last dim).
    Returns zero vector on total internal reflection (like GLSL)."""
    cos_i = -jnp.sum(d * n, axis=-1, keepdims=True)
    eta = jnp.asarray(eta)
    if eta.ndim < d.ndim:
        eta = eta[..., None]
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    refr = eta * d + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return jnp.where(k < 0.0, 0.0, refr)


def normalize(v: jax.Array, eps: float = 1e-20) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
