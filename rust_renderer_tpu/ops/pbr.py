"""Cook-Torrance surface shading + split-sum IBL.

Rebuild of utopian/shaders/include/pbr_lighting.glsl: `surfaceShading`
(directional/point/spot attenuation, Cook-Torrance with LearnOpenGL's
formulation, :20-79) and `imageBasedLighting` (irradiance x albedo diffuse +
prefiltered specular x BRDF LUT, MAX_REFLECTION_LOD=7, :81-108).

Light struct fields follow GpuLight (renderer.rs:46-59); all functions are
vectorized over (H, W) pixel arrays with per-pixel PixelParams planes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import brdf
from rust_renderer_tpu.ops.cubemap import sample_cubemap, sample_cubemap_lod


class PixelParams(NamedTuple):
    """pbr_lighting.glsl:9-18; planes shaped (..., K)."""

    position: jax.Array  # (..., 3)
    base_color: jax.Array  # (..., 3)
    normal: jax.Array  # (..., 3)
    metallic: jax.Array  # (...,)
    roughness: jax.Array  # (...,)
    occlusion: jax.Array  # (...,)


def surface_shading(
    pixel: PixelParams,
    light_color: jax.Array,  # (..., 3) or (3,)
    light_pos: jax.Array,
    light_dir: jax.Array,
    light_type: jax.Array,  # 0 directional, 1 point, 2 spot
    light_att: jax.Array,  # (..., 3) constant/linear/quadratic
    light_spot: jax.Array,
    eye_pos: jax.Array,  # (3,)
    light_color_factor: float | jax.Array = 1.0,
) -> jax.Array:
    """One light's Cook-Torrance contribution (pbr_lighting.glsl:20-79)."""
    n = pixel.normal
    v = eye_pos - pixel.position
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)

    f0 = 0.04 + (pixel.base_color - 0.04) * pixel.metallic[..., None]

    pos_to_light = light_pos - pixel.position
    d = jnp.linalg.norm(pos_to_light, axis=-1)
    l_point = pos_to_light / jnp.maximum(d, 1e-9)[..., None]

    flip = jnp.asarray([-1.0, 1.0, -1.0])
    l_directional = light_dir * flip
    l_directional = l_directional / jnp.maximum(
        jnp.linalg.norm(l_directional, axis=-1, keepdims=True), 1e-9
    )

    att_poly = (
        light_att[..., 0] + light_att[..., 1] * d + light_att[..., 2] * d * d
    )
    att_point = 1.0 / jnp.maximum(att_poly, 1e-9)
    spot_dirn = light_dir / jnp.maximum(
        jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-9
    )
    spot_factor = jnp.power(
        jnp.maximum(jnp.sum(l_point * spot_dirn, axis=-1), 0.0), light_spot
    )

    is_dir = light_type == 0.0
    is_spot = light_type == 2.0
    l = jnp.where(is_dir[..., None], l_directional, l_point)
    attenuation = jnp.where(
        is_dir, 1.0, jnp.where(is_spot, spot_factor * att_point, att_point)
    )

    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    radiance = light_color[..., :3] * attenuation[..., None] * light_color_factor

    ndf = brdf.distribution_ggx(n, h, pixel.roughness)
    g = brdf.geometry_smith(n, v, l, pixel.roughness)
    f = brdf.fresnel_schlick(jnp.maximum(jnp.sum(h * v, axis=-1), 0.0), f0)

    kd = (1.0 - f) * (1.0 - pixel.metallic[..., None])

    ndotv = jnp.maximum(jnp.sum(n * v, axis=-1), 0.0)
    ndotl = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    specular = (ndf * g)[..., None] * f / (4.0 * ndotv * ndotl + 0.0001)[..., None]

    return (kd * pixel.base_color / brdf.PI + specular) * radiance * ndotl[..., None]


def shade_all_lights(pixel: PixelParams, scene, view, max_lights: int | None = None) -> jax.Array:
    """Sun (directional, white) + every scene light (deferred.frag:73-80)."""
    sun = surface_shading(
        pixel,
        light_color=jnp.ones(3),
        light_pos=jnp.zeros(3),
        light_dir=view.sun_dir,
        light_type=jnp.float32(0.0),
        light_att=jnp.ones(3),
        light_spot=jnp.float32(0.0),
        eye_pos=view.eye_pos,
    )

    n_lights = scene.light_pos.shape[0]
    if max_lights is not None:
        n_lights = min(n_lights, max_lights)

    def body(i, acc):
        contrib = surface_shading(
            pixel,
            light_color=scene.light_color[i],
            light_pos=scene.light_pos[i],
            light_dir=scene.light_dir[i],
            light_type=scene.light_type[i],
            light_att=scene.light_att[i],
            light_spot=scene.light_spot[i],
            eye_pos=view.eye_pos,
        )
        # Only the first view.num_lights entries are live (deferred.frag:76).
        return acc + jnp.where(i < view.num_lights, contrib, 0.0)

    return jax.lax.fori_loop(0, n_lights, body, sun)


def image_based_lighting(
    pixel: PixelParams,
    eye_pos: jax.Array,
    irradiance_map: jax.Array,  # (6, S, S, 3) cubemap
    specular_map: list[jax.Array],  # mip chain of (6, S, S, 3)
    brdf_lut: jax.Array,  # (L, L, 2)
    max_reflection_lod: float = 7.0,
) -> jax.Array:
    """Split-sum ambient (pbr_lighting.glsl:81-108)."""
    v = eye_pos - pixel.position
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    n = pixel.normal
    # R = -reflect(V, N) (note in pbr_lighting.glsl:86-87).
    r = -(v - 2.0 * jnp.sum(v * n, axis=-1, keepdims=True) * n)

    f0 = 0.04 + (pixel.base_color - 0.04) * pixel.metallic[..., None]
    ndotv = jnp.maximum(jnp.sum(n * v, axis=-1), 0.0)
    f = brdf.fresnel_schlick_roughness(ndotv, f0, pixel.roughness)
    kd = (1.0 - f) * (1.0 - pixel.metallic[..., None])

    irradiance = sample_cubemap(irradiance_map, n)
    diffuse = irradiance * pixel.base_color

    prefiltered = sample_cubemap_lod(
        specular_map, r, pixel.roughness * max_reflection_lod
    )
    # LUT indexed by (NdotV, 1 - roughness) (pbr_lighting.glsl:103).
    lut_size = brdf_lut.shape[0]
    lx = jnp.clip((ndotv * (lut_size - 1)), 0, lut_size - 1).astype(jnp.int32)
    ly = jnp.clip(((1.0 - pixel.roughness) * (lut_size - 1)), 0, lut_size - 1).astype(jnp.int32)
    ab = brdf_lut[ly, lx]
    specular = prefiltered * (f * ab[..., 0:1] + ab[..., 1:2])

    return (kd * diffuse + specular) * pixel.occlusion[..., None]
