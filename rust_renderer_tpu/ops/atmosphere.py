"""Raymarched atmospheric scattering.

Behavioral rebuild of utopian/shaders/include/atmosphere.glsl (Felix Westin's
MIT-licensed model as used by the reference): Rayleigh/Mie/ozone densities,
8-sample optical-depth integration toward the light, 16-sample exponentially
distributed view-ray scattering integration, exposure 20. Vectorized over ray
batches; loops unrolled statically (sample counts are compile-time, matching
the shader's constants, atmosphere.glsl:132/176-179).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PLANET_RADIUS = 6371000.0
ATMOSPHERE_HEIGHT = 100000.0
RAYLEIGH_HEIGHT = ATMOSPHERE_HEIGHT * 0.08
MIE_HEIGHT = ATMOSPHERE_HEIGHT * 0.012
C_RAYLEIGH = jnp.array([5.802e-6, 13.558e-6, 33.100e-6], jnp.float32)
C_MIE = jnp.array([3.996e-6, 3.996e-6, 3.996e-6], jnp.float32)
C_OZONE = jnp.array([0.650e-6, 1.881e-6, 0.085e-6], jnp.float32)
ATMOSPHERE_DENSITY = 1.0
EXPOSURE = 20.0

_PLANET_CENTER = jnp.array([0.0, -PLANET_RADIUS, 0.0], jnp.float32)

_OPTICAL_DEPTH_SAMPLES = 8
_SCATTERING_SAMPLES = 16


def _sphere_intersection(ray_start, ray_dir, center, radius):
    """(atmosphere.glsl:55-71): returns (t0, t1); both -1 on miss."""
    rs = ray_start - center
    a = jnp.sum(ray_dir * ray_dir, axis=-1)
    b = 2.0 * jnp.sum(rs * ray_dir, axis=-1)
    c = jnp.sum(rs * rs, axis=-1) - radius * radius
    d = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(d, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    miss = d < 0
    return jnp.where(miss, -1.0, t0), jnp.where(miss, -1.0, t1)


def planet_intersection(ray_start, ray_dir):
    return _sphere_intersection(ray_start, ray_dir, _PLANET_CENTER, PLANET_RADIUS)


def atmosphere_intersection(ray_start, ray_dir):
    return _sphere_intersection(
        ray_start, ray_dir, _PLANET_CENTER, PLANET_RADIUS + ATMOSPHERE_HEIGHT
    )


def _phase_rayleigh(costh):
    return 3.0 * (1.0 + costh * costh) / (16.0 * jnp.pi)


def _phase_mie(costh, g=0.85):
    g = min(g, 0.9381)
    k = 1.55 * g - 0.55 * g * g * g
    kcosth = k * costh
    return (1.0 - k * k) / ((4.0 * jnp.pi) * (1.0 - kcosth) * (1.0 - kcosth))


def _atmosphere_height(position):
    return jnp.linalg.norm(position - _PLANET_CENTER, axis=-1) - PLANET_RADIUS


def _atmosphere_density(h):
    """(rayleigh, mie, ozone) densities at height h; (...,3)."""
    rayleigh = jnp.exp(-jnp.maximum(h, 0.0) / RAYLEIGH_HEIGHT)
    mie = jnp.exp(-jnp.maximum(h, 0.0) / MIE_HEIGHT)
    ozone = jnp.maximum(0.0, 1.0 - jnp.abs(h - 25000.0) / 15000.0)
    return jnp.stack([rayleigh, mie, ozone], axis=-1)


def _integrate_optical_depth(ray_start, ray_dir):
    """8-sample optical depth to the atmosphere boundary (glsl:123-144)."""
    _, t1 = atmosphere_intersection(ray_start, ray_dir)
    step_size = t1 / _OPTICAL_DEPTH_SAMPLES
    optical_depth = jnp.zeros(ray_start.shape[:-1] + (3,), jnp.float32)
    for i in range(_OPTICAL_DEPTH_SAMPLES):
        local_pos = ray_start + ray_dir * ((i + 0.5) * step_size)[..., None]
        optical_depth = optical_depth + _atmosphere_density(
            _atmosphere_height(local_pos)
        ) * step_size[..., None]
    return optical_depth


def _absorb(optical_depth):
    """(glsl:147-151); Mie absorbs ~10% more than it scatters."""
    return jnp.exp(
        -(
            optical_depth[..., 0:1] * C_RAYLEIGH
            + optical_depth[..., 1:2] * C_MIE * 1.1
            + optical_depth[..., 2:3] * C_OZONE
        )
        * ATMOSPHERE_DENSITY
    )


def integrate_scattering(ray_start, ray_dir, ray_length, light_dir, light_color):
    """Single-light scattering integral (glsl:154-215).

    ray_start/ray_dir: (...,3); ray_length scalar or (...,); light_dir (3,).
    Returns (color (...,3), transmittance (...,3)).
    """
    ray_height = _atmosphere_height(ray_start)
    exponent = 1.0 + jnp.clip(1.0 - ray_height / ATMOSPHERE_HEIGHT, 0.0, 1.0) * 8.0

    t0, t1 = atmosphere_intersection(ray_start, ray_dir)
    ray_length = jnp.minimum(ray_length, t1)
    advance = jnp.maximum(t0, 0.0)
    entered = t0 > 0
    ray_start = jnp.where(
        entered[..., None], ray_start + ray_dir * advance[..., None], ray_start
    )
    ray_length = jnp.where(entered, ray_length - advance, ray_length)

    costh = jnp.sum(ray_dir * light_dir, axis=-1)
    phase_r = _phase_rayleigh(costh)
    phase_m = _phase_mie(costh)

    optical_depth = jnp.zeros(ray_dir.shape[:-1] + (3,), jnp.float32)
    rayleigh = jnp.zeros_like(optical_depth)
    mie = jnp.zeros_like(optical_depth)
    prev_ray_time = jnp.zeros_like(ray_length)

    for i in range(_SCATTERING_SAMPLES):
        ray_time = jnp.power(i / _SCATTERING_SAMPLES, exponent) * ray_length
        step_size = ray_time - prev_ray_time
        local_pos = ray_start + ray_dir * ray_time[..., None]
        local_density = _atmosphere_density(_atmosphere_height(local_pos))
        optical_depth = optical_depth + local_density * step_size[..., None]
        view_transmittance = _absorb(optical_depth)
        light_od = _integrate_optical_depth(local_pos, jnp.broadcast_to(light_dir, local_pos.shape))
        light_transmittance = _absorb(light_od)
        common = view_transmittance * light_transmittance * step_size[..., None]
        rayleigh = rayleigh + common * (phase_r * local_density[..., 0])[..., None]
        mie = mie + common * (phase_m * local_density[..., 1])[..., None]
        prev_ray_time = ray_time

    transmittance = _absorb(optical_depth)
    color = (rayleigh * C_RAYLEIGH + mie * C_MIE) * light_color * EXPOSURE
    return color, transmittance


def sky_radiance(ray_origin, ray_dir, sun_dir, sky_enabled):
    """Miss-shader sky (pathtrace_reference/reference.rmiss): scattering
    clamped to <=1, black when the sky toggle is off."""
    color, _ = integrate_scattering(
        ray_origin, ray_dir, jnp.float32(999999999.0), sun_dir, jnp.float32(1.0)
    )
    color = jnp.minimum(color, 1.0)
    enabled = (sky_enabled == 1)
    return jnp.where(enabled, color, jnp.zeros_like(color))
