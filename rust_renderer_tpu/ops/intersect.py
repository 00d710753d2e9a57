"""Scene intersection: closest-hit and any-hit queries over the packed scene.

The TPU analog of `traceRayEXT` against the reference's BLAS/TLAS
(utopian/src/raytracing.rs). Two backends share one signature:

- `closest_hit_bruteforce`: chunked exhaustive ray x triangle / sphere tests —
  correct for any scene, fast enough for small ones (the RTIOW config). Chunked
  `fori_loop` keeps the (rays x tris) product off HBM.
- `ops.bvh.closest_hit`: BVH-accelerated wavefront traversal for big scenes.

Hit encoding mirrors what the reference's hit shaders receive:
`gl_InstanceCustomIndexEXT` = gpu mesh id (raytracing.rs:265),
`gl_PrimitiveID` = triangle index, barycentrics (reference.rchit:22-30).

`HIT_KIND_*`: 0 = miss, 1 = triangle, 2 = analytic sphere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import rays as rayops

HIT_NONE = 0
HIT_TRIANGLE = 1
HIT_SPHERE = 2
HIT_DYNAMIC = 3  # per-frame geometry (marching-cubes isosurface, ops/mc_bvh.py)

_TRI_CHUNK = 128


class Hit(NamedTuple):
    t: jax.Array  # (...,) f32, INF on miss
    kind: jax.Array  # (...,) i32
    prim: jax.Array  # (...,) i32: triangle id or sphere id
    u: jax.Array  # (...,) f32 barycentric
    v: jax.Array  # (...,) f32 barycentric

    @property
    def is_hit(self) -> jax.Array:
        return self.kind != HIT_NONE


def _intersect_spheres(scene, origin, direction, t_min, t_max, best: Hit) -> Hit:
    n_spheres = scene.sphere_center.shape[0]
    if n_spheres == 0:
        return best

    def body(i, best: Hit) -> Hit:
        t, hit = rayops.intersect_sphere(
            origin, direction, scene.sphere_center[i], scene.sphere_radius[i], t_min, t_max
        )
        closer = jnp.logical_and(hit, t < best.t)
        return Hit(
            t=jnp.where(closer, t, best.t),
            kind=jnp.where(closer, HIT_SPHERE, best.kind),
            prim=jnp.where(closer, i, best.prim),
            u=best.u,
            v=best.v,
        )

    return jax.lax.fori_loop(0, n_spheres, body, best)


def _intersect_triangles_chunked(scene, origin, direction, t_min, t_max, best: Hit) -> Hit:
    n_tris = scene.indices.shape[0]
    if n_tris == 0:
        return best
    chunk = min(_TRI_CHUNK, n_tris)
    n_chunks = (n_tris + chunk - 1) // chunk
    # Pad triangle table to a chunk multiple with degenerate triangles.
    pad = n_chunks * chunk - n_tris
    tri_idx = jnp.pad(scene.indices, ((0, pad), (0, 0)))
    flat_dims = origin.shape[:-1]

    def body(c, best: Hit) -> Hit:
        ids = jax.lax.dynamic_slice_in_dim(tri_idx, c * chunk, chunk, axis=0)  # (C,3)
        tv = scene.positions[ids]  # (C,3,3)
        # Broadcast rays (...,1,3) against chunk (C,3).
        o = origin[..., None, :]
        d = direction[..., None, :]
        tmin_b = jnp.asarray(t_min)[..., None] if jnp.ndim(t_min) > 0 else t_min
        tmax_b = jnp.asarray(t_max)[..., None] if jnp.ndim(t_max) > 0 else t_max
        t, u, v, hit = rayops.intersect_triangle(
            o, d, tv[:, 0], tv[:, 1], tv[:, 2], tmin_b, tmax_b
        )  # (..., C)
        # Padded (degenerate) triangles produce det==0 -> miss.
        arg = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, arg[..., None], axis=-1)[..., 0]
        ubest = jnp.take_along_axis(u, arg[..., None], axis=-1)[..., 0]
        vbest = jnp.take_along_axis(v, arg[..., None], axis=-1)[..., 0]
        closer = tbest < best.t
        prim = c * chunk + arg.astype(jnp.int32)
        return Hit(
            t=jnp.where(closer, tbest, best.t),
            kind=jnp.where(closer, HIT_TRIANGLE, best.kind),
            prim=jnp.where(closer, prim, best.prim),
            u=jnp.where(closer, ubest, best.u),
            v=jnp.where(closer, vbest, best.v),
        )

    _ = flat_dims
    return jax.lax.fori_loop(0, n_chunks, body, best)


def closest_hit_bruteforce(scene, origin, direction, t_min=1e-3, t_max=1e4) -> Hit:
    """Exhaustive closest hit. origin/direction: (..., 3)."""
    shape = origin.shape[:-1]
    best = Hit(
        t=jnp.full(shape, rayops.INF),
        kind=jnp.zeros(shape, jnp.int32),
        prim=jnp.zeros(shape, jnp.int32),
        u=jnp.zeros(shape, jnp.float32),
        v=jnp.zeros(shape, jnp.float32),
    )
    best = _intersect_triangles_chunked(scene, origin, direction, t_min, t_max, best)
    best = _intersect_spheres(scene, origin, direction, t_min, t_max, best)
    return best


def any_hit_bruteforce(scene, origin, direction, t_min=1e-3, t_max=1e4) -> jax.Array:
    """Occlusion query (shadow rays). Returns bool (...,). Uses the same
    closest-hit machinery; a dedicated early-out version comes with the BVH."""
    return closest_hit_bruteforce(scene, origin, direction, t_min, t_max).is_hit


class Surface(NamedTuple):
    """Interpolated shading inputs at a hit point — what reference.rchit
    computes from bindless fetches (reference.rchit:22-43)."""

    position: jax.Array  # (..., 3)
    normal: jax.Array  # (..., 3), flipped toward the incident ray
    geo_normal: jax.Array  # (..., 3), not flipped
    uv: jax.Array  # (..., 2)
    material: jax.Array  # (...,) i32
    mesh: jax.Array  # (...,) i32 (gpu mesh id; -1 for spheres)


def _shade_table(scene) -> jax.Array:
    """(T, 17) per-TRIANGLE shading rows: [n0 n1 n2 | uv0 uv1 uv2 |
    material mesh] (ints bitcast to f32).

    surface_at_hit previously fetched these through EIGHT dependent
    per-attribute gathers per sample site (indices, 3x normals, 3x uvs,
    tri_mesh, mesh_material) — 48 ms/bounce at 1080p, with the 1-wide
    tri_mesh gather alone a 14.8 ms table scan (round-3 frame trace). One
    packed row per hit triangle is the proven fast shape (ops/gather.py).
    Scene-dependent only, so XLA hoists the build out of the bounce scan."""
    from rust_renderer_tpu.ops.gather import bitcast_f32

    idx = scene.indices
    i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
    material = scene.mesh_material[scene.tri_mesh]
    return jnp.concatenate(
        [
            scene.normals[i0], scene.normals[i1], scene.normals[i2],
            scene.uvs[i0], scene.uvs[i1], scene.uvs[i2],
            bitcast_f32(material)[:, None],
            bitcast_f32(scene.tri_mesh)[:, None],
        ],
        axis=1,
    )


def surface_at_hit(scene, hit: Hit, origin, direction) -> Surface:
    """Gather + interpolate vertex attributes at hits (reference.rchit:25-41).
    Safe to call on miss lanes (returns garbage there; mask downstream)."""
    prim = jnp.clip(hit.prim, 0, max(scene.indices.shape[0] - 1, 0))
    has_tris = scene.indices.shape[0] > 0

    if has_tris:
        from rust_renderer_tpu.ops.gather import bitcast_i32, row_gather

        shape = hit.t.shape
        rows = row_gather(_shade_table(scene), prim.reshape(-1)).reshape(
            shape + (17,))
        n0, n1, n2 = rows[..., 0:3], rows[..., 3:6], rows[..., 6:9]
        w0 = (1.0 - hit.u - hit.v)[..., None]
        w1 = hit.u[..., None]
        w2 = hit.v[..., None]
        tri_normal = rayops.normalize(n0 * w0 + n1 * w1 + n2 * w2)
        uv0, uv1, uv2 = rows[..., 9:11], rows[..., 11:13], rows[..., 13:15]
        tri_uv = uv0 * w0[..., :1] + uv1 * w1[..., :1] + uv2 * w2[..., :1]
        tri_material = bitcast_i32(rows[..., 15])
        tri_mesh = bitcast_i32(rows[..., 16])
    else:
        tri_normal = jnp.zeros(hit.t.shape + (3,), jnp.float32)
        tri_uv = jnp.zeros(hit.t.shape + (2,), jnp.float32)
        tri_mesh = jnp.zeros(hit.t.shape, jnp.int32)
        tri_material = jnp.zeros(hit.t.shape, jnp.int32)

    position = origin + hit.t[..., None] * direction

    if scene.sphere_center.shape[0] > 0:
        sprim = jnp.clip(hit.prim, 0, scene.sphere_center.shape[0] - 1)
        sc = scene.sphere_center[sprim]
        sr = scene.sphere_radius[sprim][..., None]
        sphere_normal = (position - sc) / jnp.maximum(sr, 1e-20)
        sphere_material = scene.sphere_material[sprim]
        is_sphere = hit.kind == HIT_SPHERE
        normal = jnp.where(is_sphere[..., None], sphere_normal, tri_normal)
        material = jnp.where(is_sphere, sphere_material, tri_material)
        mesh = jnp.where(is_sphere, -1, tri_mesh)
    else:
        normal, material, mesh = tri_normal, tri_material, tri_mesh

    geo_normal = normal
    # Flip toward incident ray (reference.rchit:34-37).
    facing = jnp.sum(normal * direction, axis=-1, keepdims=True) > 0.0
    normal = jnp.where(facing, -normal, normal)
    return Surface(
        position=position,
        normal=normal,
        geo_normal=geo_normal,
        uv=tri_uv,
        material=material,
        mesh=mesh,
    )
