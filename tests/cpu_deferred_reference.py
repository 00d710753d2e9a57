"""Independent CPU reference for the deferred PBR composite.

Closes VERDICT r3 #2 / r4 #4: the RASTERIZED goldens were self-blessed
regressions — a correlated bug in cascade selection, PCF, or the IBL
split-sum would be re-blessed into the golden. This module re-derives the
deferred composite in plain numpy STRAIGHT FROM THE REFERENCE SHADERS,
sharing no code with the framework (no jax, no packed-row gathers, no
quad tables — direct per-texel indexing):

- Cook-Torrance direct lighting: /root/reference/utopian/shaders/include/
  pbr_lighting.glsl:20-79 (sun + point/spot lights, LearnOpenGL GGX form)
- split-sum IBL ambient: pbr_lighting.glsl:81-108 (irradiance x albedo
  diffuse + prefiltered specular x BRDF LUT, MAX_REFLECTION_LOD = 7)
- cascaded shadow maps: include/shadow_mapping.glsl:8-54 (cascade select
  by view-space z, 3x3 PCF, bias 0.0005, shadow factor 0.3)
- composite order: deferred/deferred.frag:73-119 (direct + ambient, RT
  reflection override for metal, CSM or RT shadow, SSAO multiply)

It consumes the framework's OWN gbuffer planes / shadow atlas / IBL maps
as inputs and independently evaluates the SHADING — so any disagreement
isolates a shading bug, not an upstream raster difference.
"""

from __future__ import annotations

import numpy as np

PI = np.pi
SHADOW_BIAS = 0.0005
SHADOW_FACTOR = 0.3
MAX_REFLECTION_LOD = 7.0


def _norm(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-9)


# -- GGX / Cook-Torrance (pbr_lighting.glsl:20-79, brdf.glsl) -----------------


def _ggx_distribution(n, h, roughness):
    a2 = (roughness**2) ** 2
    ndoth = np.maximum(np.sum(n * h, -1), 0.0)
    denom = ndoth**2 * (a2 - 1.0) + 1.0
    return a2 / np.maximum(PI * denom**2, 1e-12)


def _geometry_schlick(ndotx, roughness):
    k = (roughness + 1.0) ** 2 / 8.0
    return ndotx / np.maximum(ndotx * (1.0 - k) + k, 1e-12)


def _fresnel(cos_t, f0):
    return f0 + (1.0 - f0) * np.clip(1.0 - cos_t, 0.0, 1.0)[..., None] ** 5


def _surface_shading(pos, n, base_color, metallic, roughness, eye,
                     light_color, light_pos, light_dir, light_type,
                     light_att, light_spot):
    v = _norm(eye - pos)
    f0 = 0.04 + (base_color - 0.04) * metallic[..., None]

    to_light = light_pos - pos
    d = np.linalg.norm(to_light, axis=-1)
    l_point = to_light / np.maximum(d, 1e-9)[..., None]
    l_dir = _norm(np.asarray(light_dir) * np.array([-1.0, 1.0, -1.0]))

    att_point = 1.0 / np.maximum(
        light_att[0] + light_att[1] * d + light_att[2] * d * d, 1e-9)
    spot = np.maximum(np.sum(l_point * _norm(np.asarray(light_dir)), -1),
                      0.0) ** light_spot

    if light_type == 0:
        l = np.broadcast_to(l_dir, pos.shape)
        attenuation = np.ones(pos.shape[:-1])
    elif light_type == 2:
        l, attenuation = l_point, spot * att_point
    else:
        l, attenuation = l_point, att_point

    h = _norm(l + v)
    radiance = np.asarray(light_color)[:3] * attenuation[..., None]

    ndf = _ggx_distribution(n, h, roughness)
    g = (_geometry_schlick(np.maximum(np.sum(n * v, -1), 0.0), roughness)
         * _geometry_schlick(np.maximum(np.sum(n * l, -1), 0.0), roughness))
    f = _fresnel(np.maximum(np.sum(h * v, -1), 0.0), f0)
    kd = (1.0 - f) * (1.0 - metallic[..., None])

    ndotv = np.maximum(np.sum(n * v, -1), 0.0)
    ndotl = np.maximum(np.sum(n * l, -1), 0.0)
    spec = (ndf * g)[..., None] * f / (4.0 * ndotv * ndotl + 1e-4)[..., None]
    return (kd * base_color / PI + spec) * radiance * ndotl[..., None]


# -- cubemap sampling (direct per-texel indexing — independent of the
#    framework's packed-quad-row formulation) ---------------------------------


def _dir_to_face_uv(d):
    ax, ay, az = np.abs(d[..., 0]), np.abs(d[..., 1]), np.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = np.where(is_x, np.where(x > 0, 0, 1),
                    np.where(is_y, np.where(y > 0, 2, 3),
                             np.where(z > 0, 4, 5))).astype(np.int32)
    major = np.maximum(np.where(is_x, ax, np.where(is_y, ay, az)), 1e-12)
    u = np.where(is_x, np.where(x > 0, -z, z),
                 np.where(is_y, x, np.where(z > 0, x, -x))) / major
    v = np.where(is_x, -y,
                 np.where(is_y, np.where(y > 0, z, -z), -y)) / major
    return face, u * 0.5 + 0.5, v * 0.5 + 0.5


def _sample_cube(cube, d):
    """Clamp-to-edge bilinear on the selected face of a (6,S,S,C) cubemap."""
    face, u, v = _dir_to_face_uv(d)
    size = cube.shape[1]
    fx = np.clip(u * size - 0.5, 0.0, size - 1.0)
    fy = np.clip(v * size - 0.5, 0.0, size - 1.0)
    x0 = np.floor(fx).astype(np.int32)
    y0 = np.floor(fy).astype(np.int32)
    x1 = np.minimum(x0 + 1, size - 1)
    y1 = np.minimum(y0 + 1, size - 1)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    c00 = cube[face, y0, x0]
    c10 = cube[face, y0, x1]
    c01 = cube[face, y1, x0]
    c11 = cube[face, y1, x1]
    return (c00 * (1 - wx) + c10 * wx) * (1 - wy) + (
        c01 * (1 - wx) + c11 * wx) * wy


def _sample_cube_lod(chain, d, lod):
    lod = np.clip(lod, 0.0, len(chain) - 1)
    lo = np.floor(lod).astype(np.int32)
    hi = np.minimum(lo + 1, len(chain) - 1)
    frac = (lod - lo)[..., None]
    out_lo = np.zeros(d.shape[:-1] + (chain[0].shape[-1],), np.float64)
    out_hi = np.zeros_like(out_lo)
    for lvl, cm in enumerate(chain):
        s = _sample_cube(cm, d)
        out_lo = np.where((lo == lvl)[..., None], s, out_lo)
        out_hi = np.where((hi == lvl)[..., None], s, out_hi)
    return out_lo * (1 - frac) + out_hi * frac


def _ibl_ambient(pos, n, base_color, metallic, roughness, occlusion, eye,
                 irradiance_map, specular_chain, brdf_lut):
    """pbr_lighting.glsl:81-108."""
    v = _norm(eye - pos)
    r = -(v - 2.0 * np.sum(v * n, -1, keepdims=True) * n)
    f0 = 0.04 + (base_color - 0.04) * metallic[..., None]
    ndotv = np.maximum(np.sum(n * v, -1), 0.0)
    f = f0 + (np.maximum(1.0 - roughness[..., None], f0) - f0) * np.clip(
        1.0 - ndotv, 0.0, 1.0)[..., None] ** 5
    kd = (1.0 - f) * (1.0 - metallic[..., None])

    diffuse = _sample_cube(irradiance_map, n) * base_color
    prefiltered = _sample_cube_lod(specular_chain, r,
                                   roughness * MAX_REFLECTION_LOD)
    lut_size = brdf_lut.shape[0]
    lx = np.clip(ndotv * (lut_size - 1), 0, lut_size - 1).astype(np.int32)
    ly = np.clip((1.0 - roughness) * (lut_size - 1), 0,
                 lut_size - 1).astype(np.int32)
    ab = brdf_lut[ly, lx]
    specular = prefiltered * (f * ab[..., 0:1] + ab[..., 1:2])
    return (kd * diffuse + specular) * occlusion[..., None]


# -- cascaded shadow maps (shadow_mapping.glsl:8-54) --------------------------


def calculate_shadow(position, view_matrix, shadow_map, cascade_vp,
                     cascade_splits, cascade_offset: int = 0):
    """Direct 3D-indexed CSM evaluation. cascade_offset != 0 deliberately
    mis-selects cascades — the gate-sensitivity probe."""
    n_cascades, size = shadow_map.shape[0], shadow_map.shape[1]
    view_z = position @ view_matrix[2, :3] + view_matrix[2, 3]
    cascade = np.zeros(position.shape[:-1], np.int32)
    for i in range(n_cascades - 1):
        cascade = np.where(view_z < -cascade_splits[i], i + 1, cascade)
    cascade = np.clip(cascade + cascade_offset, 0, n_cascades - 1)

    m = cascade_vp[cascade]  # (..., 4, 4) — plain numpy advanced indexing
    ph = np.concatenate([position, np.ones_like(position[..., :1])], -1)
    clip = np.einsum("...ij,...j->...i", m, ph)
    w = clip[..., 3]
    proj = clip[..., :3] / np.maximum(np.abs(w), 1e-9)[..., None] * np.sign(
        w)[..., None]
    uv = proj[..., :2] * 0.5 + 0.5
    depth_ref = proj[..., 2]
    in_range = (depth_ref <= 1.0) & (depth_ref > -1.0)

    fx = uv[..., 0] * size
    fy = (1.0 - uv[..., 1]) * size
    x0 = np.floor(fx).astype(np.int32)
    y0 = np.floor(fy).astype(np.int32)

    shadow = np.zeros(position.shape[:-1], np.float64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cx = np.clip(x0 + dx, 0, size - 1)
            cy = np.clip(y0 + dy, 0, size - 1)
            closest = shadow_map[cascade, cy, cx]
            lit = np.where(depth_ref - SHADOW_BIAS > closest,
                           SHADOW_FACTOR, 1.0)
            shadow += np.where(in_range, lit, 1.0)
    return shadow / 9.0, cascade


# -- the composite (deferred.frag:73-119) -------------------------------------


def render_deferred(gb_position, gb_normal, gb_albedo, gb_pbr,
                    shadow_map, cascade_vp, cascade_splits,
                    irradiance_map, specular_chain, brdf_lut,
                    ssao, rt_shadows, rt_reflections,
                    mat_base_color, mat_roughness, mat_metallic, mat_rt_type,
                    lights, view_matrix, eye_pos, sun_dir,
                    shadows_enabled=True, ssao_enabled=True, ibl_enabled=True,
                    raytracing_supported=True, cascade_offset: int = 0):
    """Full independent composite over the framework's gbuffer planes.

    lights: list of dicts {color, pos, dir, type, att, spot} — the live
    (i < num_lights) GpuLight rows.
    Returns the (H, W, 3) color BEFORE the atmosphere/present passes.
    """
    pos = np.asarray(gb_position, np.float64)[..., :3]
    n = np.asarray(gb_normal, np.float64)[..., :3]
    mid = np.clip(np.asarray(gb_pbr)[..., 3].astype(np.int32), 0,
                  len(mat_roughness) - 1)
    roughness = np.asarray(gb_pbr, np.float64)[..., 1] * mat_roughness[mid]
    metallic = np.asarray(gb_pbr, np.float64)[..., 0] * mat_metallic[mid]
    occlusion = np.asarray(gb_pbr, np.float64)[..., 2]
    base_color = (np.maximum(np.asarray(gb_albedo, np.float64)[..., :3], 0.0)
                  ** 2.2) * mat_base_color[mid][..., :3]

    lo = _surface_shading(pos, n, base_color, metallic, roughness, eye_pos,
                          [1.0, 1.0, 1.0], np.zeros(3), sun_dir, 0,
                          np.ones(3), 0.0)
    for lt in lights:
        lo = lo + _surface_shading(pos, n, base_color, metallic, roughness,
                                   eye_pos, lt["color"], lt["pos"], lt["dir"],
                                   lt["type"], lt["att"], lt["spot"])

    if ibl_enabled:
        ambient = _ibl_ambient(pos, n, base_color, metallic, roughness,
                               occlusion, eye_pos, irradiance_map,
                               specular_chain, brdf_lut)
    else:
        ambient = 0.03 * base_color * occlusion[..., None]
    color = ambient + lo

    if raytracing_supported:
        is_metal = mat_rt_type[mid] == 1
        color = np.where(is_metal[..., None],
                         np.asarray(rt_reflections, np.float64)[..., :3],
                         color)

    if shadows_enabled:
        shadow, _ = calculate_shadow(pos, view_matrix, shadow_map,
                                     cascade_vp, cascade_splits,
                                     cascade_offset)
    elif raytracing_supported:
        shadow = np.maximum(np.asarray(rt_shadows, np.float64), 0.3)
    else:
        shadow = np.ones(pos.shape[:-1])
    color = color * shadow[..., None]

    if ssao_enabled:
        color = color * np.asarray(ssao, np.float64)[..., None]
    return color
