"""G-buffer generation: MRT planes from raster visibility or primary rays.

Rebuild of utopian/shaders/gbuffer/gbuffer.{vert,frag}: bindless vertex fetch,
TBN construction, normal mapping, MRT write of
(world position, shading normal, albedo, (metallic, roughness, occlusion,
material id)). Two visibility front-ends produce identical planes:

- `from_visibility`: the software rasterizer's VisibilityBuffer (exact
  reference pipeline shape: vertex transform + raster),
- `from_rays`: BVH primary-ray casting — same image, O(rays log T), the
  scalable path for heavy scenes.

Clear value is (1,1,1,0) like the reference's color attachments
(pass.rs:210-215) — downstream passes detect sky via position == 1
(ssao.frag:77-81).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops.raster import VisibilityBuffer, interpolate
from rust_renderer_tpu.ops.texture import sample_texture_bilinear


class GBuffer(NamedTuple):
    position: jax.Array  # (H, W, 4) world position
    normal: jax.Array  # (H, W, 4)
    albedo: jax.Array  # (H, W, 4)
    pbr: jax.Array  # (H, W, 4): metallic, roughness, occlusion, material id
    depth: jax.Array  # (H, W) ndc z (1 = far)


def _gbuffer_table(scene) -> jax.Array:
    """(T, 40) per-TRIANGLE shading rows: [p0 p1 p2 | n0 n1 n2 | uv0 uv1
    uv2 | t0 t1 t2 (xyzw) | material mesh] (ints bitcast to f32).

    _shade previously fetched these through FOURTEEN per-attribute gathers
    per pixel (indices, 3x positions/normals/uvs/tangents, tri_mesh,
    mesh_material) — ~33 ms for the indices gather alone at 1080p plus a
    15 ms 1-wide tri_mesh table scan (round-3 raster trace). One packed row
    per covered triangle is the proven fast shape (ops/gather.py). Scene-
    dependent only, so it is shared/hoisted by XLA across call sites."""
    from rust_renderer_tpu.ops.gather import bitcast_f32

    idx = scene.indices
    i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
    material = scene.mesh_material[scene.tri_mesh]
    return jnp.concatenate(
        [
            scene.positions[i0], scene.positions[i1], scene.positions[i2],
            scene.normals[i0], scene.normals[i1], scene.normals[i2],
            scene.uvs[i0], scene.uvs[i1], scene.uvs[i2],
            scene.tangents[i0], scene.tangents[i1], scene.tangents[i2],
            bitcast_f32(material)[:, None],
            bitcast_f32(scene.tri_mesh)[:, None],
        ],
        axis=1,
    )


def _shade(scene, tri, u, v, covered):
    """Shared attribute fetch + normal mapping (gbuffer.frag:26-51).

    tri: (H,W) triangle ids (clipped valid); u,v barycentric for v1/v2.
    Returns the four gbuffer planes."""
    if scene.indices.shape[0] == 0:
        clear = jnp.broadcast_to(
            jnp.asarray([1.0, 1.0, 1.0, 0.0]), tri.shape + (4,)
        )
        return clear, clear, clear, clear
    from rust_renderer_tpu.ops.gather import bitcast_i32, row_gather

    shape = tri.shape
    rows = row_gather(
        _gbuffer_table(scene), jnp.maximum(tri, 0).reshape(-1)
    ).reshape(shape + (38,))
    w0 = (1.0 - u - v)[..., None]
    w1 = u[..., None]
    w2 = v[..., None]

    def interp3(base, width=3):
        return (rows[..., base:base + width] * w0
                + rows[..., base + width:base + 2 * width] * w1
                + rows[..., base + 2 * width:base + 3 * width] * w2)

    position = interp3(0)
    normal_geo = interp3(9)
    normal_geo = normal_geo / jnp.maximum(
        jnp.linalg.norm(normal_geo, axis=-1, keepdims=True), 1e-9
    )
    uv = interp3(18, width=2)
    tangent4 = interp3(24, width=4)

    material = bitcast_i32(rows[..., 36])

    # All four texture-map ids in one (M, 4) row gather instead of four
    # 1-wide table scans.
    maps = jnp.stack(
        [scene.mat_diffuse_map, scene.mat_normal_map, scene.mat_mr_map,
         scene.mat_occlusion_map], axis=1,
    )
    from rust_renderer_tpu.ops.gather import bitcast_f32

    map_rows = bitcast_i32(row_gather(
        bitcast_f32(maps), material.reshape(-1)).reshape(shape + (4,)))

    diffuse = sample_texture_bilinear(scene.textures, map_rows[..., 0], uv)
    normal_map = sample_texture_bilinear(scene.textures, map_rows[..., 1], uv)
    mr = sample_texture_bilinear(scene.textures, map_rows[..., 2], uv)
    occ = sample_texture_bilinear(scene.textures, map_rows[..., 3], uv)
    metallic = mr[..., 2]
    roughness = mr[..., 1]
    occlusion = occ[..., 0]

    # TBN normal mapping when a tangent exists (gbuffer.frag:40-45; TBN built
    # as in gbuffer.vert:34-38 with world transforms already baked in).
    tangent = tangent4[..., :3]
    has_tangent = jnp.any(tangent != 0.0, axis=-1)
    t = tangent / jnp.maximum(jnp.linalg.norm(tangent, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(normal_geo, t)
    nm = normal_map[..., :3] * 2.0 - 1.0
    nm = nm / jnp.maximum(jnp.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)
    mapped = t * nm[..., 0:1] + b * nm[..., 1:2] + normal_geo * nm[..., 2:3]
    mapped = mapped / jnp.maximum(jnp.linalg.norm(mapped, axis=-1, keepdims=True), 1e-9)
    normal = jnp.where(has_tangent[..., None], mapped, normal_geo)

    clear = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    mask = covered[..., None]

    def out4(rgb, a):
        return jnp.where(
            mask, jnp.concatenate([rgb, a[..., None]], axis=-1), clear
        )

    ones = jnp.ones_like(u)
    g_position = out4(position, ones)
    g_normal = out4(normal, ones)
    g_albedo = out4(diffuse[..., :3], ones)
    g_pbr = jnp.where(
        mask,
        jnp.stack([metallic, roughness, occlusion, material.astype(jnp.float32)], -1),
        clear,
    )
    return g_position, g_normal, g_albedo, g_pbr


def from_visibility(scene, vis: VisibilityBuffer) -> GBuffer:
    covered = vis.tri >= 0
    p, n, a, pbr = _shade(scene, vis.tri, vis.bary_u, vis.bary_v, covered)
    return GBuffer(position=p, normal=n, albedo=a, pbr=pbr, depth=vis.depth)


def from_rays(scene, hit, origin, direction, projection_view=None) -> GBuffer:
    """Primary-ray gbuffer; `hit` from any closest-hit backend. Depth is
    reconstructed as NDC z when projection_view is given (else linear t).
    Analytic-sphere hits (the TPU-native extra primitive) fill the planes
    from the sphere's material; no tangent basis, so no normal mapping."""
    covered = hit.is_hit
    tri_covered = jnp.logical_and(covered, hit.kind == 1)
    p, n, a, pbr = _shade(scene, hit.prim, hit.u, hit.v, tri_covered)
    # Ray path gives exact hit position; prefer it over interpolation.
    position = origin + hit.t[..., None] * direction
    p = jnp.where(covered[..., None], jnp.concatenate(
        [position, jnp.ones_like(hit.t)[..., None]], -1), p)

    if scene.sphere_center.shape[0] > 0:
        is_sphere = hit.kind == 2
        sprim = jnp.clip(hit.prim, 0, scene.sphere_center.shape[0] - 1)
        sc = scene.sphere_center[sprim]
        sr = jnp.maximum(scene.sphere_radius[sprim], 1e-9)[..., None]
        snormal = (position - sc) / sr
        smat = scene.sphere_material[sprim]
        uv0 = jnp.zeros(hit.t.shape + (2,))
        sdiff = sample_texture_bilinear(
            scene.textures, scene.mat_diffuse_map[smat], uv0
        )
        smr = sample_texture_bilinear(scene.textures, scene.mat_mr_map[smat], uv0)
        one = jnp.ones_like(hit.t)
        m = is_sphere[..., None]
        n = jnp.where(m, jnp.concatenate([snormal, one[..., None]], -1), n)
        a = jnp.where(m, jnp.concatenate([sdiff[..., :3], one[..., None]], -1), a)
        pbr = jnp.where(
            m,
            jnp.stack([smr[..., 2], smr[..., 1], jnp.ones_like(hit.t),
                       smat.astype(jnp.float32)], -1),
            pbr,
        )
    if projection_view is not None:
        clip_z = (
            position @ projection_view[2, :3] + projection_view[2, 3]
        )
        clip_w = position @ projection_view[3, :3] + projection_view[3, 3]
        depth = jnp.where(covered, clip_z / jnp.maximum(clip_w, 1e-9), 1.0)
    else:
        depth = jnp.where(covered, hit.t, 1.0)
    return GBuffer(position=p, normal=n, albedo=a, pbr=pbr, depth=depth)
