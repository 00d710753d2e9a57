"""Hash-based value noise + fbm (rebuild of
utopian/shaders/marching_cubes/noise.glsl — the iq-style hash gradient noise
the reference's optional density fields use)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash1(n: jax.Array) -> jax.Array:
    """fract(sin(n) * 43758.5453) value hash."""
    return jnp.mod(jnp.sin(n) * 43758.5453, 1.0)


def noised(x: jax.Array) -> jax.Array:
    """Value noise with analytic derivative feel: returns (..., ) noise in
    [-1, 1] from (..., 3) positions (noise.glsl `noised().x` usage)."""
    p = jnp.floor(x)
    w = x - p
    # Quintic smoothstep.
    u = w * w * w * (w * (w * 6.0 - 15.0) + 10.0)

    n = p[..., 0] + p[..., 1] * 317.0 + p[..., 2] * 157.0
    a = _hash1(n + 0.0)
    b = _hash1(n + 1.0)
    c = _hash1(n + 317.0)
    d = _hash1(n + 318.0)
    e = _hash1(n + 157.0)
    f = _hash1(n + 158.0)
    g = _hash1(n + 474.0)
    h = _hash1(n + 475.0)

    k0 = a
    k1 = b - a
    k2 = c - a
    k3 = e - a
    k4 = a - b - c + d
    k5 = a - c - e + g
    k6 = a - b - e + f
    k7 = -a + b + c - d + e - f - g + h

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    val = (
        k0 + k1 * ux + k2 * uy + k3 * uz
        + k4 * ux * uy + k5 * uy * uz + k6 * uz * ux + k7 * ux * uy * uz
    )
    return -1.0 + 2.0 * val


def fbm(x: jax.Array, octaves: int = 5, lacunarity: float = 2.0,
        gain: float = 0.5) -> jax.Array:
    """Fractal Brownian motion over `noised` (noise.glsl fbm)."""
    total = jnp.zeros(x.shape[:-1], x.dtype)
    amp = 0.5
    freq = 1.0
    for _ in range(octaves):
        total = total + amp * noised(x * freq)
        freq *= lacunarity
        amp *= gain
    return total
