"""Software rasterization: vertex transform + edge-function visibility.

The TPU rebuild of the reference's raster pipelines (gbuffer/forward/shadow
graphics passes, utopian/src/pipeline.rs:246-350). There is no fixed-function
rasterizer on a TPU, so:

- Vertex transform is a (V,4) x (4,4) matmul — MXU work.
- Visibility is computed per pixel with vectorized edge functions over
  triangle chunks (`lax.fori_loop` carrying the z-buffer), the
  capacity+mask pattern from SURVEY.md §7.3. Output is a compact visibility
  buffer (tri id, depth, barycentrics) — attributes are resolved in a
  separate deferred step (one gather per pixel instead of per tri test).
- Depth test LESS_OR_EQUAL, no blending, no backface culling — matching the
  reference's pipeline state (pipeline.rs:286-310).
- Near-plane clipping is geometric (Sutherland–Hodgman against clip z >= 0,
  each triangle yielding up to 2 sub-triangles in a fixed 2T buffer). Clipped
  vertices carry barycentric coordinates of their ORIGINAL triangle as
  attributes, so the visibility buffer always reports original triangle ids +
  original-triangle barycentrics and the deferred attribute resolve never
  sees clipping.

For large scenes the BVH primary-ray caster (`gbuffer_raycast` in
renderers/gbuffer.py) produces the identical visibility result in
O(rays log T); this module is the O(pixels x tris) exact pipeline used for
moderate triangle counts and for depth-only shadow cascades.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_CHUNK = 64


class VisibilityBuffer(NamedTuple):
    depth: jax.Array  # (H, W) f32, NDC z in [0,1]; 1.0 = far/clear
    tri: jax.Array  # (H, W) i32 triangle id, -1 = none
    bary_u: jax.Array  # (H, W) f32 perspective-correct barycentric for v1
    bary_v: jax.Array  # (H, W) f32 for v2


def transform_vertices(positions: jax.Array, mvp: jax.Array) -> jax.Array:
    """(V,3) world -> (V,4) clip. One MXU matmul."""
    homo = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    return homo @ mvp.T


def clip_to_screen(clip: jax.Array, width: int, height: int) -> tuple[jax.Array, jax.Array]:
    """Viewport transform with the reference's negative-viewport Y flip
    (render_utils.rs:4-13): NDC y=+1 maps to the TOP of the image.

    Returns (screen_xyz (V,3) with xy in pixels / z in [0,1], w (V,))."""
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[:, :3] / safe_w[:, None]
    sx = (ndc[:, 0] * 0.5 + 0.5) * width
    sy = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * height
    return jnp.stack([sx, sy, ndc[:, 2]], axis=-1), w


def clip_triangles_near(clip: jax.Array, indices: jax.Array):
    """Sutherland–Hodgman clip of every triangle against the near plane
    (clip-space z >= 0; glam's RH [0,1]-depth convention).

    clip: (V,4); indices: (T,3). Returns
      tri_pos:  (2T, 3, 4) clip-space vertices per output triangle,
      tri_bary: (2T, 3, 2) (u, v) barycentrics w.r.t. the original triangle
                (weight of v1 and v2; w0 = 1-u-v),
      tri_orig: (2T,) original triangle id.
    Fully-outside or unused slots are degenerate (all-equal vertices).
    """
    p = clip[indices]  # (T, 3, 4)
    z = p[..., 2]
    inside = z >= 0.0  # (T, 3)

    bary0 = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # v0, v1, v2
    t_count = indices.shape[0]
    bary = jnp.broadcast_to(bary0, (t_count, 3, 2))

    def isect(a_pos, a_bar, b_pos, b_bar):
        za = a_pos[..., 2]
        zb = b_pos[..., 2]
        t = za / jnp.where(jnp.abs(za - zb) < 1e-12, 1e-12, za - zb)
        t = t[..., None]
        return a_pos + (b_pos - a_pos) * t, a_bar + (b_bar - a_bar) * t

    # Rotate each triangle so the pattern of inside flags is canonical:
    # pick rotation r such that vertex r is the "distinguished" one.
    # Cases by count of inside vertices:
    #   3: keep as-is (+ degenerate second slot)
    #   0: degenerate
    #   1: distinguished = the inside vertex -> tri (A, iAB, iAC)
    #   2: distinguished = the OUTSIDE vertex C' -> quad (A, B, iBC, iAC)
    n_inside = inside.sum(-1)  # (T,)

    def rotated(r):
        i0 = r % 3
        i1 = (r + 1) % 3
        i2 = (r + 2) % 3
        return (p[:, i0], p[:, i1], p[:, i2],
                bary[:, i0], bary[:, i1], bary[:, i2],
                inside[:, i0], inside[:, i1], inside[:, i2])

    # Select rotation: for 1-inside, vertex that is inside; for 2-inside,
    # vertex that is OUTSIDE, rotated to position 2 (so A,B inside).
    rot_sel = jnp.zeros(t_count, jnp.int32)
    for r in range(3):
        is_in = inside[:, r]
        rot_sel = jnp.where((n_inside == 1) & is_in, r, rot_sel)
        rot_sel = jnp.where((n_inside == 2) & ~is_in, (r + 1) % 3, rot_sel)

    stacked = [rotated(r) for r in range(3)]
    sel = lambda k: jnp.stack([s[k] for s in stacked])[rot_sel, jnp.arange(t_count)]
    pa, pb, pc = sel(0), sel(1), sel(2)
    ba, bb, bc = sel(3), sel(4), sel(5)

    # Intersections on edges touching the clipped region.
    pab, bab = isect(pa, ba, pb, bb)
    pac, bac = isect(pa, ba, pc, bc)
    pbc, bbc = isect(pb, bb, pc, bc)

    one = n_inside == 1
    two = n_inside == 2
    three = n_inside == 3

    def pick(m, x, y):
        return jnp.where(m[:, None], x, y)

    # First output triangle.
    t1_p0 = pa
    t1_p1 = pick(one, pab, pb)
    t1_p2 = pick(one, pac, pick(two, pbc, pc))
    t1_b0 = ba
    t1_b1 = pick(one, bab, bb)
    t1_b2 = pick(one, bac, pick(two, bbc, bc))
    valid1 = one | two | three
    # Second output triangle (only the 2-inside case).
    t2_p0 = pa
    t2_p1 = pbc
    t2_p2 = pac
    t2_b0 = ba
    t2_b1 = bbc
    t2_b2 = bac
    valid2 = two

    def degen(pz, m):
        # Collapse invalid triangles to a point (zero area -> no coverage).
        return jnp.where(m[:, None], pz, jnp.zeros_like(pz))

    tri_pos = jnp.concatenate(
        [
            jnp.stack([degen(t1_p0, valid1), degen(t1_p1, valid1), degen(t1_p2, valid1)], 1),
            jnp.stack([degen(t2_p0, valid2), degen(t2_p1, valid2), degen(t2_p2, valid2)], 1),
        ],
        axis=0,
    )
    tri_bary = jnp.concatenate(
        [jnp.stack([t1_b0, t1_b1, t1_b2], 1), jnp.stack([t2_b0, t2_b1, t2_b2], 1)],
        axis=0,
    )
    orig = jnp.arange(t_count, dtype=jnp.int32)
    tri_orig = jnp.concatenate([orig, orig], axis=0)
    return tri_pos, tri_bary, tri_orig


def rasterize(
    clip: jax.Array,
    indices: jax.Array,
    width: int,
    height: int,
    chunk: int = _CHUNK,
    init: "VisibilityBuffer | None" = None,
    method: str = "auto",
) -> VisibilityBuffer:
    """Rasterize triangles into a visibility buffer.

    clip: (V,4) clip-space vertices; indices: (T,3) int32. `init` carries a
    pre-existing visibility buffer to depth-test against (the LOAD-op path
    the reference's forward/MC draws use, graph.rs:189-196).

    method: "brute" = the exact O(px·tris) chunked loop; "binned" = the
    tile-binned Pallas kernel (ops/raster_binned.py); "auto" picks binned
    on TPU for large pixel·triangle workloads.
    """
    if method == "auto":
        big = indices.shape[0] >= 2048 and width * height >= 256 * 256
        method = (
            "binned"
            if big and jax.devices()[0].platform != "cpu"
            else "brute"
        )
    if method == "binned":
        from rust_renderer_tpu.ops.raster_binned import rasterize_binned

        return rasterize_binned(clip, indices, width, height, init=init)
    if init is None:
        init = VisibilityBuffer(
            depth=jnp.ones((height, width), jnp.float32),
            tri=jnp.full((height, width), -1, jnp.int32),
            bary_u=jnp.zeros((height, width), jnp.float32),
            bary_v=jnp.zeros((height, width), jnp.float32),
        )
    if indices.shape[0] == 0:
        return init
    tri_pos, tri_bary, tri_orig = clip_triangles_near(clip, indices)
    t = tri_pos.shape[0]
    n_chunks = max((t + chunk - 1) // chunk, 1)
    pad = n_chunks * chunk - t
    tri_pos = jnp.pad(tri_pos, ((0, pad), (0, 0), (0, 0)))
    tri_bary = jnp.pad(tri_bary, ((0, pad), (0, 0), (0, 0)))
    tri_orig = jnp.pad(tri_orig, ((0, pad),))

    # Screen transform per triangle-vertex.
    v_flat = tri_pos.reshape(-1, 4)
    screen_flat, w_flat = clip_to_screen(v_flat, width, height)
    screen_all = screen_flat.reshape(-1, 3, 3)
    w_all = w_flat.reshape(-1, 3)

    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5

    def body(c, vis: VisibilityBuffer) -> VisibilityBuffer:
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, axis=0)
        s = sl(screen_all)  # (C, 3, 3)
        wv = sl(w_all)  # (C, 3)
        bry = sl(tri_bary)  # (C, 3, 2)
        orig = sl(tri_orig)  # (C,)
        p0, p1, p2 = s[:, 0], s[:, 1], s[:, 2]
        w0, w1, w2 = wv[:, 0], wv[:, 1], wv[:, 2]
        valid = (w0 > 1e-6) & (w1 > 1e-6) & (w2 > 1e-6)

        # Edge setup (2D signed areas). area = 2*signed area of triangle.
        x0, y0 = p0[:, 0], p0[:, 1]
        x1, y1 = p1[:, 0], p1[:, 1]
        x2, y2 = p2[:, 0], p2[:, 1]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        valid &= jnp.abs(area) > 1e-12
        inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)

        # Per-pixel barycentrics, both windings accepted (cull mode NONE).
        # l1 = weight of v1, l2 = weight of v2 (l0 = 1 - l1 - l2).
        px = xs[..., None]  # (H,W,1)
        py = ys[..., None]
        l1 = ((px - x0) * (y2 - y0) - (x2 - x0) * (py - y0)) * inv_area
        l2 = ((x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)) * inv_area
        l0 = 1.0 - l1 - l2
        inside = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & valid

        # Perspective-correct z via NDC-z linear in screen space.
        z = l0 * p0[:, 2] + l1 * p1[:, 2] + l2 * p2[:, 2]
        z = jnp.where(inside, z, jnp.inf)
        # Depth LESS_OR_EQUAL within the chunk: pick min-z triangle.
        arg = jnp.argmin(z, axis=-1)
        take = lambda a: jnp.take_along_axis(a, arg[..., None], axis=-1)[..., 0]
        zbest = take(z)
        closer = zbest <= vis.depth  # LESS_OR_EQUAL (pipeline.rs:286-310)
        covered = jnp.isfinite(zbest) & closer

        # Perspective-correct barycentrics for attribute interp:
        # lp_i = (l_i / w_i) / sum(l_j / w_j), then composed through the
        # per-vertex ORIGINAL-triangle barycentric attributes so clipped
        # sub-triangles report exact original-triangle coordinates.
        l0b, l1b, l2b = take(l0), take(l1), take(l2)
        iw0 = take(jnp.broadcast_to(1.0 / jnp.maximum(w0, 1e-9), l1.shape))
        iw1 = take(jnp.broadcast_to(1.0 / jnp.maximum(w1, 1e-9), l1.shape))
        iw2 = take(jnp.broadcast_to(1.0 / jnp.maximum(w2, 1e-9), l1.shape))
        denom = l0b * iw0 + l1b * iw1 + l2b * iw2
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        lp0 = l0b * iw0 / denom
        lp1 = l1b * iw1 / denom
        lp2 = l2b * iw2 / denom

        takeb = lambda a: jnp.take_along_axis(
            jnp.broadcast_to(a, arg.shape + a.shape[:1]), arg[..., None], axis=-1
        )[..., 0]
        b0u, b0v = takeb(bry[:, 0, 0]), takeb(bry[:, 0, 1])
        b1u, b1v = takeb(bry[:, 1, 0]), takeb(bry[:, 1, 1])
        b2u, b2v = takeb(bry[:, 2, 0]), takeb(bry[:, 2, 1])
        pu = lp0 * b0u + lp1 * b1u + lp2 * b2u
        pv = lp0 * b0v + lp1 * b1v + lp2 * b2v

        tri_id = takeb(orig.astype(jnp.float32)).astype(jnp.int32)
        return VisibilityBuffer(
            depth=jnp.where(covered, zbest, vis.depth),
            tri=jnp.where(covered, tri_id, vis.tri),
            bary_u=jnp.where(covered, pu, vis.bary_u),
            bary_v=jnp.where(covered, pv, vis.bary_v),
        )

    return jax.lax.fori_loop(0, n_chunks, body, init)


def rasterize_depth(
    clip: jax.Array, indices: jax.Array, width: int, height: int,
    chunk: int = _CHUNK, method: str = "auto",
) -> jax.Array:
    """Depth-only rasterization (shadow cascades, shadow.rs:111-131).

    method: "brute" = the O(px·tris) chunked loop below; "binned" = the
    tile-binned Pallas kernel (ops/raster_binned.py, SURVEY §7.3 #2);
    "auto" picks binned on TPU for large pixel·triangle workloads.
    """
    if method == "auto":
        big = indices.shape[0] >= 2048 and width * height >= 512 * 512
        method = (
            "binned"
            if big and jax.devices()[0].platform != "cpu"
            else "brute"
        )
    if method == "binned":
        from rust_renderer_tpu.ops.raster_binned import rasterize_depth_binned

        return rasterize_depth_binned(clip, indices, width, height)
    return rasterize(clip, indices, width, height, chunk).depth


def interpolate(
    vis: VisibilityBuffer, indices: jax.Array, attr: jax.Array, fill: float = 0.0
) -> jax.Array:
    """Deferred attribute resolve: gather the visible triangle's vertices and
    blend with perspective-correct barycentrics. attr: (V, K) -> (H, W, K)."""
    if indices.shape[0] == 0:
        return jnp.full(vis.tri.shape + (attr.shape[-1],), fill, attr.dtype)
    tri = jnp.maximum(vis.tri, 0)
    ids = indices[tri]  # (H, W, 3)
    a0 = attr[ids[..., 0]]
    a1 = attr[ids[..., 1]]
    a2 = attr[ids[..., 2]]
    u = vis.bary_u[..., None]
    v = vis.bary_v[..., None]
    out = a0 * (1.0 - u - v) + a1 * u + a2 * v
    return jnp.where((vis.tri >= 0)[..., None], out, fill)
