"""Image-based-lighting pipeline: environment capture, irradiance
convolution, GGX specular prefilter, BRDF LUT.

Rebuild of utopian/src/renderers/ibl.rs + utopian/shaders/ibl/*:
- environment cubemap captured from the atmosphere per (face, mip)
  (ibl.rs:68-96, cubemap.frag),
- cosine-convolved irradiance map, sample spacing 0.025 rad
  (irradiance_filter.frag:~25-50),
- GGX importance-sampled specular prefilter, 32 samples, roughness driven by
  mip level (specular_filter.frag), mip-biased solid-angle weighting omitted
  in favor of direct filtering of the captured level,
- 1024-sample split-sum BRDF LUT (brdf_lut.frag, Karis).

All are jittable; the whole pipeline runs only when
`need_environment_map_update` is set, mirroring ibl.rs:63-66.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import atmosphere, brdf
from rust_renderer_tpu.ops.cubemap import face_directions, sample_cubemap

PI = brdf.PI


def capture_environment_cubemap(sun_dir: jax.Array, size: int = 512,
                                mips: int = 8, eye_height: float = 1.0) -> list[jax.Array]:
    """Render the atmosphere into a cubemap mip chain (ibl.rs:68-96).

    The reference renders the scattering into mip 0 of each face and copies /
    re-captures per mip; filtering down is equivalent for a smooth sky."""
    origin = jnp.asarray([0.0, eye_height, 0.0])
    # One batched (6, S, S) integration — per-face Python loops would inline
    # six copies of the scattering code and blow up XLA compile time.
    dirs = jnp.stack([face_directions(f, size) for f in range(6)])
    color, _ = atmosphere.integrate_scattering(
        jnp.broadcast_to(origin, dirs.shape), dirs,
        jnp.float32(999999999.0), sun_dir, jnp.float32(1.0),
    )
    level0 = jnp.minimum(color, 1.0)
    chain = [level0]
    for _ in range(1, mips):
        prev = chain[-1]
        s = prev.shape[1] // 2
        if s < 1:
            break
        down = prev.reshape(6, s, 2, s, 2, 3).mean(axis=(2, 4))
        chain.append(down)
    return chain


def irradiance_convolution(env: jax.Array, size: int = 64,
                           delta: float = 0.025) -> jax.Array:
    """Cosine-weighted hemisphere convolution (irradiance_filter.frag).

    env: (6, S, S, 3) cubemap. Returns (6, size, size, 3)."""
    n_phi = int(2.0 * PI / delta)
    n_theta = int(0.5 * PI / delta)

    # All 6 faces batched: (6, size, size, 3) per-texel basis.
    normal = jnp.stack([face_directions(f, size) for f in range(6)])
    up0 = jnp.asarray([0.0, 1.0, 0.0])
    right = jnp.cross(jnp.broadcast_to(up0, normal.shape), normal)
    rn = jnp.linalg.norm(right, axis=-1, keepdims=True)
    right = jnp.where(rn > 1e-4, right / jnp.maximum(rn, 1e-9),
                      jnp.asarray([1.0, 0.0, 0.0]))
    up = jnp.cross(normal, right)

    def body(i, acc):
        phi_i = i // n_theta
        theta_i = i % n_theta
        phi = phi_i.astype(jnp.float32) * delta
        theta = theta_i.astype(jnp.float32) * delta
        # Tangent-space direction -> world about the per-texel basis.
        tx = jnp.sin(theta) * jnp.cos(phi)
        ty = jnp.sin(theta) * jnp.sin(phi)
        tz = jnp.cos(theta)
        d = right * tx + up * ty + normal * tz
        s = sample_cubemap(env, d)
        w = jnp.cos(theta) * jnp.sin(theta)
        total, wsum = acc
        return total + s * w, wsum + w

    total, wsum = jax.lax.fori_loop(
        0, n_phi * n_theta, body,
        (jnp.zeros((6, size, size, 3)), jnp.float32(0.0)),
    )
    # The reference outputs PI * sum(L cosθ sinθ) / N; with the w-weighted
    # normalization this is sum/wsum (the PI factors cancel).
    return total / jnp.maximum(wsum, 1e-9)


def specular_prefilter(env_chain: list[jax.Array], mips: int = 8,
                       num_samples: int = 32) -> list[jax.Array]:
    """GGX-importance prefiltered specular chain (specular_filter.frag):
    mip m filtered with roughness = m / (mips - 1)."""
    out = []
    for m in range(min(mips, len(env_chain))):
        size = env_chain[m].shape[1]
        roughness = m / max(mips - 1, 1)
        if roughness == 0.0:
            out.append(env_chain[0])
            continue
        n = jnp.stack([face_directions(f, size) for f in range(6)])  # N = V = R
        env = env_chain[min(m, len(env_chain) - 1)]
        rough = jnp.full(n.shape[:-1], roughness)

        def body(i, acc, n=n, env=env, rough=rough):
            total, wsum = acc
            xi = brdf.hammersley2d(jnp.full(n.shape[:-1], i, jnp.int32), num_samples)
            h = brdf.importance_sample_ggx(xi, rough, n)
            l = 2.0 * jnp.sum(n * h, -1, keepdims=True) * h - n
            ndotl = jnp.maximum(jnp.sum(n * l, -1, keepdims=True), 0.0)
            s = sample_cubemap(env, l)
            return total + s * ndotl, wsum + ndotl

        total, wsum = jax.lax.fori_loop(
            0, num_samples, body,
            (jnp.zeros((6, size, size, 3)), jnp.zeros((6, size, size, 1))),
        )
        out.append(total / jnp.maximum(wsum, 1e-6))
    return out


def compute_environment(cfg, sun_dir, lut_samples: int = 256) -> dict:
    """Run the whole environment pipeline as SEPARATE jitted steps, returning
    the persistent-resource dict used by the render graphs. Splitting keeps
    each compile small (the one-frame-one-program graph would otherwise fuse
    the 15k-sample irradiance loop into every first frame's executable)."""
    import functools

    sun = jnp.asarray(sun_dir, jnp.float32)
    capture = jax.jit(
        functools.partial(
            capture_environment_cubemap, size=cfg.cubemap_size, mips=cfg.cubemap_mips
        )
    )
    chain = capture(sun)
    irr = jax.jit(
        functools.partial(irradiance_convolution, size=cfg.irradiance_size)
    )(chain[min(2, len(chain) - 1)])
    spec = jax.jit(
        lambda *c: specular_prefilter(list(c), cfg.cubemap_mips)
    )(*chain)
    lut = jax.jit(lambda: brdf_lut(cfg.brdf_lut_size, lut_samples))()

    out = {"irradiance_map": irr, "brdf_lut": lut}
    for m in range(cfg.cubemap_mips):
        out[f"env_cubemap_mip{m}"] = chain[m] if m < len(chain) else chain[-1]
        out[f"specular_map_mip{m}"] = spec[m] if m < len(spec) else chain[-1]
    return out


def brdf_lut(size: int = 512, num_samples: int = 1024) -> jax.Array:
    """Split-sum BRDF integration LUT (brdf_lut.frag): (size, size, 2) of
    (scale, bias) indexed by (NdotV, roughness-from-top)."""
    ndotv = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    # Row 0 = roughness 1 at the bottom per the LUT lookup convention
    # (pbr_lighting.glsl:103 samples at 1 - roughness).
    r, nv = jnp.meshgrid(rough, ndotv, indexing="ij")

    v = jnp.stack([jnp.sqrt(1.0 - nv * nv), jnp.zeros_like(nv), nv], axis=-1)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), v.shape)

    def body(i, acc):
        a, b = acc
        xi = brdf.hammersley2d(jnp.full(r.shape, i, jnp.int32), num_samples)
        h = brdf.importance_sample_ggx(xi, r, n)
        l = 2.0 * jnp.sum(v * h, -1, keepdims=True) * h - v
        ndotl = jnp.clip(l[..., 2], 0.0, 1.0)
        ndoth = jnp.clip(h[..., 2], 0.0, 1.0)
        vdoth = jnp.clip(jnp.sum(v * h, -1), 0.0, 1.0)
        valid = ndotl > 0.0
        # Karis: G_Vis = G * VdotH / (NdotH * NdotV), k = roughness^2 / 2 (IBL).
        k = r * r / 2.0
        g1v = nv / (nv * (1 - k) + k)
        g1l = ndotl / (ndotl * (1 - k) + k)
        g = g1v * g1l
        g_vis = g * vdoth / jnp.maximum(ndoth * nv, 1e-6)
        fc = jnp.power(1.0 - vdoth, 5.0)
        a = a + jnp.where(valid, (1.0 - fc) * g_vis, 0.0)
        b = b + jnp.where(valid, fc * g_vis, 0.0)
        return a, b

    a, b = jax.lax.fori_loop(
        0, num_samples, body, (jnp.zeros(r.shape), jnp.zeros(r.shape))
    )
    return jnp.stack([a, b], axis=-1) / num_samples
