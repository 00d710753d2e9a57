"""RTIOW-style material scattering (rebuild of reference.rchit:12-91).

Vectorized over whole hit batches: every lane evaluates all four material
branches and selects with `jnp.where` — the TPU replacement for GPU thread
divergence. RNG advancement is uniform across lanes (every lane consumes one
unit-sphere sample and one float per scatter), which preserves per-lane stream
independence without per-branch divergence.

Material types (renderer.rs:31-34): 0 lambertian, 1 metal (prop = fuzz),
2 dielectric (prop = index of refraction), 3 diffuse light.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import rng as rngmod
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.texture import sample_texture_nearest_mip0, sample_texture_bilinear


def schlick_reflectance(cosine: jax.Array, ref_idx: jax.Array) -> jax.Array:
    """Schlick's approximation (reference.rchit:12-18)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * jnp.power(jnp.maximum(1.0 - cosine, 0.0), 5.0)


class Scatter(NamedTuple):
    color: jax.Array  # (..., 3) attenuation
    direction: jax.Array  # (..., 3) scattered ray dir (unnormalized, RTIOW-style)
    is_scattered: jax.Array  # (...,) bool


def scatter(
    scene,
    material: jax.Array,
    ray_dir: jax.Array,
    world_normal: jax.Array,
    uv: jax.Array,
    state: jax.Array,
) -> tuple[jax.Array, Scatter]:
    """Evaluate the hit 'shader' for a batch of hits (reference.rchit:20-91).

    material: (...,) i32 ids into the material table; world_normal already
    flipped toward the incident ray. Returns (new_rng_state, Scatter).
    """
    mat_type = scene.mat_rt_type[material]  # (...,)
    mat_prop = scene.mat_rt_prop[material]
    base_color = scene.mat_base_color[material][..., :3]
    diffuse_map = scene.mat_diffuse_map[material]

    # Albedo fetch: texture * base_color_factor (reference.rchit:42-43).
    tex_rgb = sample_texture_bilinear(scene.textures, diffuse_map, uv)[..., :3]
    albedo = tex_rgb * base_color

    state, unit_sphere = rngmod.random_in_unit_sphere_fast(state)
    state, rand_refl = rngmod.random_float(state)

    dirn = rayops.normalize(ray_dir)

    # -- Lambertian (reference.rchit:47-50)
    lam_dir = world_normal + unit_sphere
    lam_scattered = jnp.sum(ray_dir * world_normal, axis=-1) < 0.0

    # -- Metal (reference.rchit:52-59): fuzzed mirror, hardcoded white.
    metal_dir = rayops.reflect(dirn, world_normal) + mat_prop[..., None] * unit_sphere

    # -- Dielectric (reference.rchit:61-81)
    dir_normal_dot = jnp.sum(dirn * world_normal, axis=-1)
    # NOTE: world_normal was already flipped toward the incident ray, so the
    # reference's outward_normal selection reduces to world_normal itself; the
    # refraction ratio flip keys off the *geometric* facing which the caller
    # encodes by passing geo-facing via dir_normal_dot of the unflipped normal.
    # We reproduce the exact reference arithmetic on the flipped normal.
    outward_normal = jnp.where(dir_normal_dot[..., None] > 0, -world_normal, world_normal)
    refraction_ratio = jnp.where(dir_normal_dot > 0, mat_prop, 1.0 / jnp.maximum(mat_prop, 1e-6))
    cos_theta = jnp.minimum(jnp.sum(-dirn * outward_normal, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot_refract = refraction_ratio * sin_theta > 1.0
    reflectance = schlick_reflectance(cos_theta, refraction_ratio)
    must_reflect = jnp.logical_or(cannot_refract, reflectance > rand_refl)
    diel_dir = jnp.where(
        must_reflect[..., None],
        rayops.reflect(dirn, outward_normal),
        rayops.refract(dirn, outward_normal, refraction_ratio),
    )

    # -- Select by material type
    white = jnp.ones_like(albedo)
    is_lam = (mat_type == 0)[..., None]
    is_metal = (mat_type == 1)[..., None]
    is_diel = (mat_type == 2)[..., None]

    color = jnp.where(is_lam, albedo, white)  # metal/dielectric/light = white
    direction = jnp.where(
        is_lam, lam_dir, jnp.where(is_metal, metal_dir, jnp.where(is_diel, diel_dir, 0.0))
    )
    is_scattered = jnp.where(
        mat_type == 0,
        lam_scattered,
        jnp.where(mat_type == 3, False, True),  # diffuse light: absorbed
    )
    return state, Scatter(color=color, direction=direction, is_scattered=is_scattered)
