"""BVH: acceleration structure build + vectorized stackless traversal.

The TPU rebuild of the reference's hardware ray tracing (utopian/src/
raytracing.rs: BLAS per mesh + TLAS over instances, built by the driver).
Since instances are baked to world space at pack time (renderer.py), one
world-space BVH over all triangles plays the role of BLAS+TLAS; a transform
edit re-packs and rebuilds (the analog of `rebuild_tlas`,
raytracing.rs:400-459).

Design — threaded ("skip pointer") BVH for a vector machine:
- Nodes laid out in DFS pre-order. An AABB hit on an internal node advances
  the cursor to `cur + 1` (its left child); a miss (or a finished leaf) jumps
  to `node_miss[cur]` (next sibling / ancestor sibling; -1 terminates).
- Traversal state per ray is ONE int32 cursor — no stacks, no scatters; every
  step is pure gathers + vectorized AABB/triangle tests across the whole ray
  front. This trades near-first ordering (shrinking t_max still culls) for a
  dataflow shape XLA vectorizes perfectly (SURVEY.md §7.3 item 1).
- Leaves hold exactly LEAF_SIZE triangle slots (padded with -1) so leaf tests
  are fixed-shape.

Build (host-side numpy): triangles sorted by Morton code of centroid, then
median-split over the sorted order — LBVH-style topology with good-enough
SAH quality, O(T log T), no Python per-triangle loops except the node queue.
An optimized C++ builder (native/) handles very large scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.intersect import HIT_NONE, HIT_SPHERE, HIT_TRIANGLE, Hit

LEAF_SIZE = 4


class BVH(NamedTuple):
    node_min: jax.Array  # (N, 3) f32
    node_max: jax.Array  # (N, 3) f32
    node_miss: jax.Array  # (N,) i32: skip pointer, -1 = traversal done
    node_leaf: jax.Array  # (N,) i32: -1 internal, else row into leaf_tris
    leaf_tris: jax.Array  # (L, LEAF_SIZE) i32 original triangle ids, -1 pad
    # Pre-gathered leaf triangle vertices for gather-light leaf tests:
    leaf_v0: jax.Array  # (L, LEAF_SIZE, 3) f32
    leaf_e1: jax.Array  # (L, LEAF_SIZE, 3) f32 (v1 - v0)
    leaf_e2: jax.Array  # (L, LEAF_SIZE, 3) f32 (v2 - v0)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized centroid coords into 30-bit Morton codes."""

    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    q = np.clip((x * 1024.0), 0, 1023).astype(np.uint64)
    return expand(q[:, 0]) | (expand(q[:, 1]) << 1) | (expand(q[:, 2]) << 2)


def build_bvh(positions: np.ndarray, indices: np.ndarray, leaf_size: int = LEAF_SIZE) -> BVH:
    """Build from (V,3) float32 world positions and (T,3) int32 indices."""
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int64).reshape(-1, 3)
    n_tris = len(indices)
    if n_tris == 0:
        # Degenerate empty BVH: one leaf with no triangles.
        return BVH(
            node_min=jnp.zeros((1, 3), jnp.float32),
            node_max=jnp.zeros((1, 3), jnp.float32),
            node_miss=jnp.full((1,), -1, jnp.int32),
            node_leaf=jnp.zeros((1,), jnp.int32),
            leaf_tris=jnp.full((1, leaf_size), -1, jnp.int32),
            leaf_v0=jnp.zeros((1, leaf_size, 3), jnp.float32),
            leaf_e1=jnp.zeros((1, leaf_size, 3), jnp.float32),
            leaf_e2=jnp.zeros((1, leaf_size, 3), jnp.float32),
        )

    v0 = positions[indices[:, 0]]
    v1 = positions[indices[:, 1]]
    v2 = positions[indices[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroid = (tri_min + tri_max) * 0.5

    lo = centroid.min(0)
    span = np.maximum(centroid.max(0) - lo, 1e-12)
    order = np.argsort(_morton3((centroid - lo) / span), kind="stable")

    s_min = tri_min[order]
    s_max = tri_max[order]

    # Iterative DFS build over sorted ranges, emitting nodes in pre-order so
    # hit-next == cur+1. Each frame: (start, end, miss_target_patch_list).
    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    node_leaf: list[int] = []
    node_miss: list[int] = []
    leaf_rows: list[np.ndarray] = []

    # Stack entries: (start, end). We record each node's subtree end so the
    # miss pointer is "index after my subtree" resolved in a second pass.
    subtree_end: list[int] = []
    stack = [(0, n_tris)]
    # To compute subtree extents in pre-order, do the DFS explicitly with
    # parent bookkeeping.
    frames = [(0, n_tris, -1)]  # (start, end, parent_node)
    parents: list[int] = []
    while frames:
        start, end, parent = frames.pop()
        idx = len(node_leaf)
        count = end - start
        node_min.append(s_min[start:end].min(0))
        node_max.append(s_max[start:end].max(0))
        parents.append(parent)
        if count <= leaf_size:
            row = np.full(leaf_size, -1, np.int64)
            row[:count] = order[start:end]
            node_leaf.append(len(leaf_rows))
            leaf_rows.append(row)
        else:
            node_leaf.append(-1)
            mid = start + count // 2
            # Push right then left so left is emitted next (pre-order).
            frames.append((mid, end, idx))
            frames.append((start, mid, idx))
        node_miss.append(-2)  # resolved below

    n_nodes = len(node_leaf)
    parents_arr = np.asarray(parents, np.int64)
    # Children of each internal node appear consecutively in pre-order:
    # left = parent+1 ... ; right child starts right after left's subtree.
    # Compute subtree extent via reverse sweep: a node's subtree ends where
    # the next node with a shallower-or-equal position in its ancestor chain
    # begins. Simpler: process nodes in reverse, tracking extents.
    extent = np.zeros(n_nodes, np.int64)
    children: list[list[int]] = [[] for _ in range(n_nodes)]
    for i in range(1, n_nodes):
        children[parents_arr[i]].append(i)
    for i in range(n_nodes - 1, -1, -1):
        if node_leaf[i] >= 0:
            extent[i] = i + 1
        else:
            extent[i] = extent[children[i][1]]
    # miss pointer: for each node, the node after its subtree; -1 if none.
    miss = np.where(extent >= n_nodes, -1, extent).astype(np.int64)
    # Root's miss must be -1.
    miss[0] = -1

    leaf_arr = np.stack(leaf_rows) if leaf_rows else np.full((1, leaf_size), -1, np.int64)
    safe = np.maximum(leaf_arr, 0)
    l_i = indices[safe]
    l_v0 = positions[l_i[..., 0]]
    l_v1 = positions[l_i[..., 1]]
    l_v2 = positions[l_i[..., 2]]
    pad = (leaf_arr < 0)[..., None]
    l_v0 = np.where(pad, 0.0, l_v0)
    l_e1 = np.where(pad, 0.0, l_v1 - l_v0)
    l_e2 = np.where(pad, 0.0, l_v2 - l_v0)

    return BVH(
        node_min=jnp.asarray(np.stack(node_min), jnp.float32),
        node_max=jnp.asarray(np.stack(node_max), jnp.float32),
        node_miss=jnp.asarray(miss, jnp.int32),
        node_leaf=jnp.asarray(np.asarray(node_leaf), jnp.int32),
        leaf_tris=jnp.asarray(leaf_arr, jnp.int32),
        leaf_v0=jnp.asarray(l_v0, jnp.float32),
        leaf_e1=jnp.asarray(l_e1, jnp.float32),
        leaf_e2=jnp.asarray(l_e2, jnp.float32),
    )


def build_scene_bvh(scene) -> BVH:
    """Build from a PackedScene's world-space pools."""
    return build_bvh(np.asarray(scene.positions), np.asarray(scene.indices))


# -- traversal ---------------------------------------------------------------


def _slab_test(o, inv_d, bmin, bmax, t_min, t_best):
    """Vectorized ray/AABB slab test. Returns bool (...)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.logical_and(tfar >= jnp.maximum(tnear, t_min), tnear <= t_best)


def _leaf_intersect(bvh: BVH, leaf_row, o, d, t_min, best_t, best_prim, best_u, best_v):
    """Test LEAF_SIZE triangles of each ray's current leaf. Möller–Trumbore
    against pre-gathered (v0, e1, e2)."""
    v0 = bvh.leaf_v0[leaf_row]  # (..., LEAF, 3)
    e1 = bvh.leaf_e1[leaf_row]
    e2 = bvh.leaf_e2[leaf_row]
    tris = bvh.leaf_tris[leaf_row]  # (..., LEAF)

    ox = o[..., None, :]
    dx = d[..., None, :]
    pvec = jnp.cross(dx, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ox - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dx * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (
        (tris >= 0)
        & (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min[..., None])
        & (t < best_t[..., None])
    )
    t = jnp.where(ok, t, rayops.INF)
    arg = jnp.argmin(t, axis=-1)
    tsel = jnp.take_along_axis(t, arg[..., None], axis=-1)[..., 0]
    closer = tsel < best_t
    take = lambda a: jnp.take_along_axis(a, arg[..., None], axis=-1)[..., 0]
    return (
        jnp.where(closer, tsel, best_t),
        jnp.where(closer, take(tris), best_prim),
        jnp.where(closer, take(u), best_u),
        jnp.where(closer, take(v), best_v),
        closer,
    )


def traverse(bvh: BVH, origin, direction, t_min=1e-3, t_max=1e4, any_hit: bool = False):
    """Closest-hit (or any-hit) traversal over a ray batch (..., 3).

    Returns (t, prim, u, v) with t=INF on miss; with any_hit=True terminates
    rays at the first confirmed triangle hit.
    """
    shape = origin.shape[:-1]
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                            jnp.where(direction < 0, -1e-12, 1e-12), direction)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)

    def cond(state):
        cur, *_ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_t, best_prim, best_u, best_v = state
        running = cur >= 0
        node = jnp.maximum(cur, 0)
        bmin = bvh.node_min[node]
        bmax = bvh.node_max[node]
        box_hit = jnp.logical_and(running, _slab_test(origin, inv_d, bmin, bmax, t_min, best_t))
        leaf_row = bvh.node_leaf[node]
        is_leaf = leaf_row >= 0
        do_leaf = jnp.logical_and(box_hit, is_leaf)

        lt, lp, lu, lv, improved = _leaf_intersect(
            bvh, jnp.maximum(leaf_row, 0), origin, direction, t_min,
            best_t, best_prim, best_u, best_v,
        )
        best_t = jnp.where(do_leaf, lt, best_t)
        best_prim = jnp.where(do_leaf, lp, best_prim)
        best_u = jnp.where(do_leaf, lu, best_u)
        best_v = jnp.where(do_leaf, lv, best_v)

        descend = jnp.logical_and(box_hit, jnp.logical_not(is_leaf))
        nxt = jnp.where(descend, cur + 1, bvh.node_miss[node])
        cur = jnp.where(running, nxt, cur)
        if any_hit:
            cur = jnp.where(jnp.logical_and(do_leaf, improved), -1, cur)
        return cur, best_t, best_prim, best_u, best_v

    init = (
        jnp.zeros(shape, jnp.int32),
        jnp.minimum(jnp.full(shape, rayops.INF), t_max),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    cur, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    t = jnp.where(prim >= 0, t, rayops.INF)
    return t, prim, u, v


def make_closest_hit(bvh: BVH):
    """closest_hit(scene, o, d, t_min, t_max) -> Hit, BVH for triangles plus
    the scene's analytic spheres (signature-compatible with
    intersect.closest_hit_bruteforce so ops/pathtrace.py can swap backends)."""

    def closest_hit(scene, origin, direction, t_min=1e-3, t_max=1e4) -> Hit:
        t, prim, u, v = traverse(bvh, origin, direction, t_min, t_max)
        best = Hit(
            t=t,
            kind=jnp.where(prim >= 0, HIT_TRIANGLE, HIT_NONE),
            prim=jnp.maximum(prim, 0),
            u=u,
            v=v,
        )
        from rust_renderer_tpu.ops.intersect import _intersect_spheres

        return _intersect_spheres(scene, origin, direction, t_min, t_max, best)

    return closest_hit


def make_any_hit(bvh: BVH):
    def any_hit(scene, origin, direction, t_min=1e-3, t_max=1e4):
        t, prim, _, _ = traverse(bvh, origin, direction, t_min, t_max, any_hit=True)
        hit = prim >= 0
        if scene.sphere_center.shape[0] > 0:
            from rust_renderer_tpu.ops.intersect import _intersect_spheres

            best = Hit(
                t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), t.shape),
                kind=jnp.zeros(t.shape, jnp.int32),
                prim=jnp.zeros(t.shape, jnp.int32),
                u=jnp.zeros(t.shape, jnp.float32),
                v=jnp.zeros(t.shape, jnp.float32),
            )
            sph = _intersect_spheres(scene, origin, direction, t_min, t_max, best)
            hit = jnp.logical_or(hit, sph.kind == HIT_SPHERE)
        return hit

    return any_hit
