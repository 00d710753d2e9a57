"""Counter-free PCG random number generation, vectorized over pixel arrays.

Behavioral rebuild of utopian/shaders/include/random.glsl: Jenkins-hash
seeding by (pixel, resolution, frame) [random.glsl:5-18], the pcg32i step with
inc=1 [random.glsl:21-24], the rxs-m-xs output function [random.glsl:27-34],
and rejection-sampled points in the unit sphere/disk [random.glsl:36-58].

All functions take and return uint32 state arrays of arbitrary shape; every
lane is an independent stream, exactly like one GPU thread's `rngState`.
State advancement is masked so a lane that has already accepted a rejection
sample stops consuming randomness, matching the scalar semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def jenkins_hash(x: jax.Array) -> jax.Array:
    x = x.astype(_U32)
    x = x + (x << _U32(10))
    x = x ^ (x >> _U32(6))
    x = x + (x << _U32(3))
    x = x ^ (x >> _U32(11))
    x = x + (x << _U32(15))
    return x


def init_rng(px: jax.Array, py: jax.Array, width: int, frame: jax.Array) -> jax.Array:
    """Per-pixel seed: jenkins(dot(pixel, (1, res.x)) ^ jenkins(frame))."""
    seed = (px.astype(_U32) + py.astype(_U32) * _U32(width)) ^ jenkins_hash(
        jnp.asarray(frame).astype(_U32)
    )
    return jenkins_hash(seed)


def step_rng(state: jax.Array) -> jax.Array:
    return state * _U32(747796405) + _U32(1)


def random_float(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Advance state, return (new_state, uniform float32 in [0,1])."""
    state = step_rng(state)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    word = (word >> _U32(22)) ^ word
    return state, word.astype(jnp.float32) / jnp.float32(4294967295.0)


def random_vec2(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    state, a = random_float(state)
    state, b = random_float(state)
    return state, jnp.stack([a, b], axis=-1)


def random_vec3(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    state, a = random_float(state)
    state, b = random_float(state)
    state, c = random_float(state)
    return state, jnp.stack([a, b, c], axis=-1)


def random_in_unit_sphere(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rejection sampling, per-lane masked (random.glsl:36-47).

    Lanes that accepted stop advancing their RNG state. Runs a bounded
    `while_loop`; the fallback (never triggered in practice within 32 rounds,
    p_fail < 1e-10) is the last candidate scaled into the sphere.
    """

    def cond(carry):
        i, searching, _, _ = carry
        return jnp.logical_and(jnp.any(searching), i < 32)

    def body(carry):
        i, searching, state, point = carry
        new_state, cand = random_vec3(state)
        cand = cand * 2.0 - 1.0
        inside = jnp.sum(cand * cand, axis=-1) < 1.0
        take = jnp.logical_and(searching, inside)
        point = jnp.where(take[..., None], cand, point)
        state = jnp.where(searching, new_state, state)
        searching = jnp.logical_and(searching, jnp.logical_not(inside))
        return i + 1, searching, state, point

    searching = jnp.ones(state.shape, bool)
    point0 = jnp.zeros(state.shape + (3,), jnp.float32)
    _, searching, state, point = jax.lax.while_loop(
        cond, body, (jnp.int32(0), searching, state, point0)
    )
    # Fallback for pathological lanes: a point strictly inside the sphere.
    point = jnp.where(searching[..., None], jnp.float32(0.0), point)
    return state, point


def random_in_unit_sphere_fast(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Loop-free uniform point in the unit ball (same distribution as the
    rejection sampler): isotropic Gaussian direction (Box-Muller) scaled by
    cbrt(u). Device while-loops carry real per-iteration kernel-launch cost
    on TPU, so the hot path avoids the rejection loop; the draw sequence
    differs from random.glsl, which only matters for bit-parity (we compare
    by RMSE, SURVEY.md §7.3 item 6)."""
    state, u1 = random_float(state)
    state, u2 = random_float(state)
    state, u3 = random_float(state)
    state, u4 = random_float(state)
    state, u5 = random_float(state)
    r1 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-10)))
    g0 = r1 * jnp.cos(2.0 * jnp.pi * u2)
    g1 = r1 * jnp.sin(2.0 * jnp.pi * u2)
    r2 = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u3, 1e-10)))
    g2 = r2 * jnp.cos(2.0 * jnp.pi * u4)
    norm = jnp.sqrt(jnp.maximum(g0 * g0 + g1 * g1 + g2 * g2, 1e-20))
    radius = jnp.power(jnp.maximum(u5, 1e-12), 1.0 / 3.0)
    scale = (radius / norm)[..., None]
    return state, jnp.stack([g0, g1, g2], axis=-1) * scale


def random_in_unit_disk(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rejection sampling in the unit disk (random.glsl:49-58)."""

    def cond(carry):
        i, searching, _, _ = carry
        return jnp.logical_and(jnp.any(searching), i < 32)

    def body(carry):
        i, searching, state, point = carry
        new_state, cand = random_vec2(state)
        cand = cand * 2.0 - 1.0
        inside = jnp.sum(cand * cand, axis=-1) < 1.0
        take = jnp.logical_and(searching, inside)
        point = jnp.where(take[..., None], cand, point)
        state = jnp.where(searching, new_state, state)
        searching = jnp.logical_and(searching, jnp.logical_not(inside))
        return i + 1, searching, state, point

    searching = jnp.ones(state.shape, bool)
    point0 = jnp.zeros(state.shape + (2,), jnp.float32)
    _, searching, state, point = jax.lax.while_loop(
        cond, body, (jnp.int32(0), searching, state, point0)
    )
    point = jnp.where(searching[..., None], jnp.float32(0.0), point)
    return state, point
