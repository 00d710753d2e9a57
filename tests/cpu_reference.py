"""Independent CPU (numpy) reference path tracer for golden-image tests.

Deliberately written as a separate implementation from rust_renderer_tpu
(different RNG, different code structure) so agreement between the two is
evidence of correctness, mirroring SURVEY.md §4's golden-image strategy:
render the RTIOW sphere scene, compare converged images by RMSE.

Physics matches the reference shaders' semantics (reference.rchit:46-87):
- lambertian: scatter = normal + point-in-unit-sphere, albedo attenuation
- metal: reflect + fuzz * point-in-unit-sphere, white attenuation
- dielectric: Schlick + refract/reflect with eta = 1/ior (the reference always
  flips the normal toward the ray first), white attenuation
- sky: clamped atmosphere scattering (reference.rmiss) — here approximated by
  evaluating the same Westin model in numpy
- sun NEE: binary visibility adds throughput (reference.rgen:63-79)
"""

from __future__ import annotations

import numpy as np


# -- minimal Westin atmosphere in numpy (atmosphere.glsl port, vectorized) ---

_PLANET_R = 6371000.0
_ATMO_H = 100000.0
_C_RAY = np.array([5.802e-6, 13.558e-6, 33.100e-6])
_C_MIE = np.array([3.996e-6] * 3)
_C_OZO = np.array([0.650e-6, 1.881e-6, 0.085e-6])
_CENTER = np.array([0.0, -_PLANET_R, 0.0])


def _sphere_isect(o, d, center, radius):
    rs = o - center
    a = np.sum(d * d, -1)
    b = 2 * np.sum(rs * d, -1)
    c = np.sum(rs * rs, -1) - radius**2
    disc = b * b - 4 * a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    t0 = (-b - sq) / (2 * a)
    t1 = (-b + sq) / (2 * a)
    miss = disc < 0
    return np.where(miss, -1.0, t0), np.where(miss, -1.0, t1)


def _height(p):
    return np.linalg.norm(p - _CENTER, axis=-1) - _PLANET_R


def _density(h):
    return np.stack(
        [
            np.exp(-np.maximum(h, 0) / (_ATMO_H * 0.08)),
            np.exp(-np.maximum(h, 0) / (_ATMO_H * 0.012)),
            np.maximum(0.0, 1 - np.abs(h - 25000.0) / 15000.0),
        ],
        -1,
    )


def _absorb(od):
    return np.exp(
        -(od[..., :1] * _C_RAY + od[..., 1:2] * _C_MIE * 1.1 + od[..., 2:3] * _C_OZO)
    )


def _optical_depth(o, d):
    _, t1 = _sphere_isect(o, d, _CENTER, _PLANET_R + _ATMO_H)
    step = t1 / 8
    od = np.zeros(o.shape[:-1] + (3,))
    for i in range(8):
        od += _density(_height(o + d * ((i + 0.5) * step)[..., None])) * step[..., None]
    return od


def sky_color(o, d, sun_dir):
    h = _height(o)
    expo = 1 + np.clip(1 - h / _ATMO_H, 0, 1) * 8
    t0, t1 = _sphere_isect(o, d, _CENTER, _PLANET_R + _ATMO_H)
    length = np.minimum(999999999.0, t1)
    adv = np.maximum(t0, 0.0)
    o = np.where((t0 > 0)[..., None], o + d * adv[..., None], o)
    length = np.where(t0 > 0, length - adv, length)

    costh = np.sum(d * sun_dir, -1)
    phase_r = 3 * (1 + costh**2) / (16 * np.pi)
    g = 0.85
    k = 1.55 * g - 0.55 * g**3
    phase_m = (1 - k * k) / (4 * np.pi * (1 - k * costh) ** 2)

    od = np.zeros(o.shape[:-1] + (3,))
    ray = np.zeros_like(od)
    mie = np.zeros_like(od)
    prev_t = np.zeros_like(length)
    for i in range(16):
        t = (i / 16) ** expo * length
        step = t - prev_t
        p = o + d * t[..., None]
        dens = _density(_height(p))
        od += dens * step[..., None]
        vt = _absorb(od)
        lt = _absorb(_optical_depth(p, np.broadcast_to(sun_dir, p.shape)))
        common = vt * lt * step[..., None]
        ray += common * (phase_r * dens[..., 0])[..., None]
        mie += common * (phase_m * dens[..., 1])[..., None]
        prev_t = t
    color = (ray * _C_RAY + mie * _C_MIE) * 20.0
    return np.minimum(color, 1.0)


# -- scene ------------------------------------------------------------------


class Sphere:
    def __init__(self, center, radius, kind, albedo=(1, 1, 1), prop=0.0):
        self.center = np.asarray(center, np.float64)
        self.radius = float(radius)
        self.kind = kind  # 'lambertian' | 'metal' | 'dielectric'
        self.albedo = np.asarray(albedo, np.float64)
        self.prop = float(prop)


def rtiow_spheres():
    """Must match models/scenes.py create_rtiow_scene."""
    return [
        Sphere([0.0, -100.5, -1.0], 100.0, "lambertian", (0.5, 0.5, 0.5)),
        Sphere([0.0, 0.5, -1.0], 0.5, "lambertian", (0.1, 0.2, 0.5)),
        Sphere([-1.1, 0.5, -1.0], 0.5, "dielectric", (1, 1, 1), 1.5),
        Sphere([1.1, 0.5, -1.0], 0.5, "metal", (1, 1, 1), 0.0),
    ]


def _hit_scene(spheres, o, d, t_min=1e-3, t_max=1e4):
    best_t = np.full(o.shape[:-1], np.inf)
    best_i = np.full(o.shape[:-1], -1, np.int64)
    for i, s in enumerate(spheres):
        oc = o - s.center
        a = np.sum(d * d, -1)
        hb = np.sum(oc * d, -1)
        c = np.sum(oc * oc, -1) - s.radius**2
        disc = hb * hb - a * c
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = (-hb - sq) / a
        t1 = (-hb + sq) / a
        t = np.where((t0 > t_min) & (t0 < t_max), t0, t1)
        ok = (disc > 0) & (t > t_min) & (t < t_max) & (t < best_t)
        best_t = np.where(ok, t, best_t)
        best_i = np.where(ok, i, best_i)
    return best_t, best_i


def _unit_sphere(rng, n):
    out = np.zeros((n, 3))
    need = np.ones(n, bool)
    while need.any():
        cand = rng.uniform(-1, 1, (n, 3))
        ok = np.sum(cand * cand, -1) < 1
        take = need & ok
        out[take] = cand[take]
        need &= ~ok
    return out


def _reflect(d, n):
    return d - 2 * np.sum(d * n, -1, keepdims=True) * n


def _refract(d, n, eta):
    cos_i = -np.sum(d * n, -1, keepdims=True)
    k = 1 - eta**2 * (1 - cos_i**2)
    return np.where(k < 0, 0.0, eta * d + (eta * cos_i - np.sqrt(np.maximum(k, 0))) * n)


def render(
    width=64,
    height=64,
    spp=64,
    bounces=3,
    eye=(0.0, 1.0, 4.0),
    target=(0.0, 0.5, -1.0),
    fov_degrees=60.0,
    sun_dir=(0.0, 0.90631, 0.42262),
    sun_nee=True,
    seed=7,
):
    """Render the RTIOW scene; returns linear (H, W, 3) float64."""
    spheres = rtiow_spheres()
    rng = np.random.default_rng(seed)
    sun = np.asarray(sun_dir) / np.linalg.norm(sun_dir)

    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    tan_half = np.tan(np.radians(fov_degrees) / 2)
    aspect = width / height

    img = np.zeros((height, width, 3))
    n = width * height
    py, px = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    px = px.reshape(-1).astype(np.float64)
    py = py.reshape(-1).astype(np.float64)

    for _ in range(spp):
        jx = rng.uniform(size=n)
        jy = rng.uniform(size=n)
        u = (px + jx) / width * 2 - 1
        v = (1 - (py + jy) / height) * 2 - 1
        d = (
            fwd[None, :]
            + right[None, :] * (u * tan_half * aspect)[:, None]
            + up[None, :] * (v * tan_half)[:, None]
        )
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(eye, (n, 1))

        radiance = np.zeros((n, 3))
        throughput = np.ones((n, 3))
        active = np.ones(n, bool)

        for _b in range(bounces):
            t, idx = _hit_scene(spheres, o, d)
            missed = idx < 0

            # Sky for missed active rays.
            sky = sky_color(o, d / np.linalg.norm(d, axis=-1, keepdims=True), sun)
            term = active & missed
            radiance[term] += throughput[term] * sky[term]
            active &= ~missed
            if not active.any():
                break

            p = o + t[..., None] * d
            normal = np.zeros((n, 3))
            color = np.ones((n, 3))
            newd = np.zeros((n, 3))
            us = _unit_sphere(rng, n)
            refl_rand = rng.uniform(size=n)
            for i, s in enumerate(spheres):
                m = active & (idx == i)
                if not m.any():
                    continue
                nrm = (p[m] - s.center) / s.radius
                flip = np.sum(nrm * d[m], -1) > 0
                nrm[flip] = -nrm[flip]
                normal[m] = nrm
                if s.kind == "lambertian":
                    newd[m] = nrm + us[m]
                    color[m] = s.albedo
                elif s.kind == "metal":
                    dn = d[m] / np.linalg.norm(d[m], axis=-1, keepdims=True)
                    newd[m] = _reflect(dn, nrm) + s.prop * us[m]
                else:  # dielectric — reference always uses eta = 1/ior after flip
                    dn = d[m] / np.linalg.norm(d[m], axis=-1, keepdims=True)
                    eta = 1.0 / s.prop
                    cos_t = np.minimum(np.sum(-dn * nrm, -1), 1.0)
                    sin_t = np.sqrt(np.maximum(1 - cos_t**2, 0))
                    r0 = ((1 - eta) / (1 + eta)) ** 2
                    schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
                    must_reflect = (eta * sin_t > 1.0) | (schlick > refl_rand[m])
                    rd = _reflect(dn, nrm)
                    fd = _refract(dn, nrm, eta)
                    newd[m] = np.where(must_reflect[:, None], rd, fd)

            throughput[active] *= color[active]
            # Offset along normal (simple epsilon; the tracer under test uses
            # the RTG ulp method — differences are < 1e-4 scene units).
            o = np.where(active[:, None], p + normal * 1e-4, o)
            d = np.where(active[:, None], newd, d)

            if sun_nee:
                st, sidx = _hit_scene(spheres, o, np.broadcast_to(sun, o.shape))
                vis = active & (sidx < 0)
                radiance[vis] += throughput[vis]

        img += radiance.reshape(height, width, 3)

    return img / spp


def _hit_tris(v0, e1, e2, o, d, t_min=1e-3, t_max=1e4):
    """Brute-force Moller-Trumbore over every triangle. o, d: (N, 3);
    v0/e1/e2: (T, 3). Returns (t, idx) with idx == -1 on miss."""
    pv = np.cross(d[:, None, :], e2[None, :, :])
    det = np.sum(e1[None] * pv, -1)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tv = o[:, None, :] - v0[None]
    u = np.sum(tv * pv, -1) * inv
    qv = np.cross(tv, e1[None])
    v = np.sum(d[:, None, :] * qv, -1) * inv
    t = np.sum(e2[None] * qv, -1) * inv
    ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t > t_min) & (t < t_max))
    t = np.where(ok, t, np.inf)
    idx = np.argmin(t, -1)
    best = t[np.arange(o.shape[0]), idx]
    miss = np.isinf(best)
    return np.where(miss, -1.0, best), np.where(miss, -1, idx)


def render_tris(
    tris,
    width=128,
    height=128,
    spp=256,
    bounces=3,
    eye=(0.0, 0.9, 2.0),
    target=(0.0, 0.5, 0.0),
    fov_degrees=60.0,
    sun_dir=(0.0, 0.90631, 0.42262),
    sun_nee=True,
    seed=7,
):
    """Independent triangle-scene path trace (Cornell-style diffuse-light
    gate). `tris` is a dict of numpy arrays: v0/e1/e2 (T, 3) world-space
    triangles plus per-triangle mat_type (T,) (0 lambertian, 1 metal,
    2 dielectric, 3 diffuse light), albedo (T, 3), prop (T,).

    Same semantics as the framework tracer (reference.rchit:20-91 /
    reference.rgen:42-126): geometric normal flipped toward the incident
    ray (equal to the interpolated cube vertex normals after the same
    flip), diffuse light terminates the path adding throughput, sun NEE
    from each post-scatter origin. Deliberately separate implementation —
    brute-force all-triangle intersection, different RNG."""
    v0 = np.asarray(tris["v0"], np.float64)
    e1 = np.asarray(tris["e1"], np.float64)
    e2 = np.asarray(tris["e2"], np.float64)
    mat_type = np.asarray(tris["mat_type"], np.int64)
    albedo_t = np.asarray(tris["albedo"], np.float64)
    prop_t = np.asarray(tris["prop"], np.float64)
    geo_n = np.cross(e1, e2)
    geo_n /= np.maximum(np.linalg.norm(geo_n, axis=-1, keepdims=True), 1e-20)

    rng = np.random.default_rng(seed)
    sun = np.asarray(sun_dir) / np.linalg.norm(sun_dir)
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    tan_half = np.tan(np.radians(fov_degrees) / 2)
    aspect = width / height

    img = np.zeros((height, width, 3))
    n = width * height
    py, px = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    px = px.reshape(-1).astype(np.float64)
    py = py.reshape(-1).astype(np.float64)

    for _ in range(spp):
        jx = rng.uniform(size=n)
        jy = rng.uniform(size=n)
        u = (px + jx) / width * 2 - 1
        v = (1 - (py + jy) / height) * 2 - 1
        d = (
            fwd[None, :]
            + right[None, :] * (u * tan_half * aspect)[:, None]
            + up[None, :] * (v * tan_half)[:, None]
        )
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.tile(eye, (n, 1))

        radiance = np.zeros((n, 3))
        throughput = np.ones((n, 3))
        active = np.ones(n, bool)

        for _b in range(bounces):
            t, idx = _hit_tris(v0, e1, e2, o, d)
            missed = idx < 0

            sky = sky_color(o, d / np.linalg.norm(d, axis=-1, keepdims=True), sun)
            term = active & missed
            radiance[term] += throughput[term] * sky[term]
            active &= ~missed
            if not active.any():
                break

            p = o + t[..., None] * d
            safe = np.maximum(idx, 0)
            nrm = geo_n[safe].copy()
            flip = np.sum(nrm * d, -1) > 0
            nrm[flip] = -nrm[flip]
            mt = mat_type[safe]
            us = _unit_sphere(rng, n)
            refl_rand = rng.uniform(size=n)

            color = np.where((mt == 0)[:, None], albedo_t[safe], 1.0)
            dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
            # Degenerate-direction guard (advisor r4): when the unit-sphere
            # sample nearly cancels the normal, fall back to the normal so the
            # next bounce's normalization can't inject NaN into the golden.
            lam_raw = nrm + us
            lam_deg = np.linalg.norm(lam_raw, axis=-1, keepdims=True) < 1e-8
            lam_dir = np.where(lam_deg, nrm, lam_raw)
            metal_dir = _reflect(dn, nrm) + prop_t[safe][:, None] * us
            eta = 1.0 / np.maximum(prop_t[safe], 1e-6)
            cos_t = np.minimum(np.sum(-dn * nrm, -1), 1.0)
            sin_t = np.sqrt(np.maximum(1 - cos_t**2, 0))
            r0 = ((1 - eta) / (1 + eta)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            must_reflect = (eta * sin_t > 1.0) | (schlick > refl_rand)
            diel_dir = np.where(
                must_reflect[:, None], _reflect(dn, nrm), _refract(dn, nrm, eta[:, None])
            )
            newd = np.where(
                (mt == 0)[:, None], lam_dir,
                np.where((mt == 1)[:, None], metal_dir,
                         np.where((mt == 2)[:, None], diel_dir, 0.0)),
            )
            throughput[active] *= color[active]
            absorbed = active & (mt == 3)
            radiance[absorbed] += throughput[absorbed]
            active &= mt != 3

            o = np.where(active[:, None], p + nrm * 1e-4, o)
            d = np.where(active[:, None], newd, d)

            if sun_nee and active.any():
                _, sidx = _hit_tris(v0, e1, e2, o, np.broadcast_to(sun, o.shape))
                vis = active & (sidx < 0)
                radiance[vis] += throughput[vis]

        img += radiance.reshape(height, width, 3)

    return img / spp


def srgb(linear):
    return np.where(
        linear < 0.0031308, linear * 12.92, 1.055 * np.maximum(linear, 1e-12) ** (1 / 2.4) - 0.055
    )
