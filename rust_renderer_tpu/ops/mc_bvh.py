"""Device-refit BVH over the marching-cubes voxel grid — animated geometry
in the path-traced scene (BASELINE config 5).

The reference rebuilds its TLAS in-frame so the pulsing marching-cubes
isosurface is traced by the same `traceRayEXT` calls as the static scene
(utopian/src/renderers/marching_cubes.rs:63-135, raytracing.rs:400-459).
A per-frame HOST rebuild is a non-starter on TPU (device round-trip +
python build); instead this module exploits an MC invariant the reference's
generic TLAS cannot: every triangle emitted by cell (x, y, z) lies inside
that cell. So the acceleration structure's TOPOLOGY is static — a
wide tree over the grid cells in Morton order, built once per grid size on
the host — and only the BOXES are refit per frame on device (tight min/max
over each cell's emitted vertices, pure elementwise math + log-depth
reductions). Cells with no triangles get inverted boxes and are never
entered. The resulting tables feed the SAME Pallas / XLA packet traversal
kernels as the static scene BVH; the dynamic hit merges with the static hit
by closest-t (the two-level-traversal design from VERDICT r2 #4).

Triangle ids in the dynamic tree index the MC result's slot-major triangle
array (slot s of cell v = s*V + v), so shading fetches the MC gradient
normals with one packed-row gather.

Round-5 layout (measured on TPU, PERFORMANCE.md r5): leaf rows hold TWO
morton-adjacent cells (10 tri slots, 100 cols) instead of one (50 cols) —
a VMEM row costs 512 B at ANY width <= 128, so single-cell rows wasted
half of every fetch and pushed the 32³ leaf table to 16.8 MB, forcing the
per-pop DMA path (the measured 85 ms/call dyn traversal at 1080p). Paired
rows halve the table into full-VMEM residence, and storing rows in MORTON
RANK order makes every wide node's children contiguous, which qualifies
the dynamic tree for the production ROW-CURSOR kernel (wnode_meta built
from the static topology).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.ops.bvh import BVH, WIDE_EMPTY, WIDE_WIDTH
from rust_renderer_tpu.ops.gather import row_gather
from rust_renderer_tpu.ops.intersect import HIT_DYNAMIC, Hit
from rust_renderer_tpu.ops.marching_cubes import MAX_TRIS_PER_VOXEL

_BIG = np.float32(3.0e37)


def _morton3(x: np.ndarray, y: np.ndarray, z: np.ndarray, bits: int) -> np.ndarray:
    def expand(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return expand(x) | (expand(y) << 1) | (expand(z) << 2)


CELLS_PER_ROW = 2  # morton-adjacent cells sharing one 512 B leaf row


@functools.lru_cache(maxsize=8)
def _static_topology(grid: int):
    """Host-side, once per grid size: Morton cell order + static wide-tree
    refs + row-cursor metadata + static binary skip-pointer columns (for
    the XLA fallback path). Leaf ROW j = morton ranks [2j, 2j+1]; rows are
    rank-ordered, so every wide node's children are contiguous."""
    assert grid & (grid - 1) == 0, "mc grid must be a power of two"
    assert grid >= 2
    v = grid ** 3
    rows = v // CELLS_PER_ROW
    ii = np.arange(grid)
    gx, gy, gz = np.meshgrid(ii, ii, ii, indexing="ij")
    linear = (gx * grid * grid + gy * grid + gz).reshape(-1)
    codes = _morton3(gx.reshape(-1), gy.reshape(-1), gz.reshape(-1), 5)
    morton_cells = linear[np.argsort(codes, kind="stable")]  # rank -> linear

    # -- wide tree: 16-ary over the rank-ordered leaf rows, levels
    # bottom-up; level_sizes = [R, R/16, ..., 1]; node order =
    # [root, ..., level1].
    level_sizes = [rows]
    while level_sizes[-1] > 1:
        level_sizes.append(-(-level_sizes[-1] // WIDE_WIDTH))
    n_internal_levels = len(level_sizes) - 1
    offsets = {}  # internal level index (1 = over leaf rows) -> node offset
    off = 0
    for li in range(n_internal_levels, 0, -1):
        offsets[li] = off
        off += level_sizes[li]
    n_wide = off
    wide_refs = np.full((n_wide, WIDE_WIDTH), WIDE_EMPTY, np.int32)
    # Row-cursor metadata, exactly the production encoding (ops/bvh.py
    # _collapse_wide): [int_last, leaf_last, int_rev | leaf_rev << 16] with
    # bit-reversed static masks and a synthetic root row appended last.
    meta = np.zeros((n_wide + 1, 3), np.int32)
    for li in range(n_internal_levels, 0, -1):
        n_nodes = level_sizes[li]
        n_children = level_sizes[li - 1]
        for i in range(n_nodes):
            node = offsets[li] + i
            nc = min(WIDE_WIDTH, n_children - i * WIDE_WIDTH)
            rev = 0
            for c in range(nc):
                child = i * WIDE_WIDTH + c
                rev |= 1 << (WIDE_WIDTH - 1 - c)
                if li == 1:  # children are leaf ROWS, contiguous by rank
                    wide_refs[node, c] = np.int32(-2 - child)
                else:
                    wide_refs[node, c] = np.int32(offsets[li - 1] + child)
            if li == 1:
                meta[node] = (0, i * WIDE_WIDTH + nc - 1,
                              np.int32(np.uint32(rev << WIDE_WIDTH)))
            else:
                meta[node] = (offsets[li - 1] + i * WIDE_WIDTH + nc - 1,
                              0, rev)
    meta[n_wide] = (0, 0, 1 << (WIDE_WIDTH - 1))  # synthetic root entry
    wide_depth = n_internal_levels

    # -- binary skip-pointer tree (XLA packet fallback): complete heap over
    # the rank-ordered leaf rows, preorder columns.
    depth = int(np.log2(rows))
    n_bin = 2 * rows - 1
    pre2heap = np.zeros(n_bin, np.int64)
    miss_pre = np.full(n_bin, -1, np.int32)
    leaf_pre = np.full(n_bin, -1, np.int32)
    p = 0
    stack = [1]
    while stack:
        h = stack.pop()
        pre2heap[p] = h
        d = h.bit_length() - 1
        leaves_below = rows >> d
        size = 2 * leaves_below - 1
        miss_pre[p] = p + size if p + size < n_bin else -1
        if h >= rows:  # leaf row (already rank-ordered)
            leaf_pre[p] = h - rows
        else:
            stack.append(2 * h + 1)
            stack.append(2 * h)
        p += 1
    bin_cols = np.stack(
        [
            np.ascontiguousarray(miss_pre).view(np.float32),
            np.ascontiguousarray(leaf_pre).view(np.float32),
        ],
        axis=1,
    )
    return dict(
        morton_cells=morton_cells.astype(np.int32),
        rows=rows,
        wide_refs=wide_refs,
        wide_meta=meta,
        wide_level_sizes=tuple(level_sizes),
        wide_offsets=offsets,
        wide_depth=wide_depth,
        pre2heap=pre2heap,
        bin_cols=bin_cols,
        miss_pre=miss_pre,
        leaf_pre=leaf_pre,
        bin_depth=depth + 1,
    )


class DynamicScene(NamedTuple):
    """Per-frame dynamic geometry: refit BVH tables + shading data."""

    bvh: BVH  # traced tables (node_packed / leaf_packed / wnode_packed)
    normals_rows: jax.Array  # (5V, 9): per-triangle vertex normals, packed
    material: jax.Array  # scalar i32 material id (lambertian, MC color)


def table_shapes(grid: int) -> dict[str, tuple[int, ...]]:
    """Shapes of the refit tables build_dynamic_tables emits — so a graph
    can declare them as resources (the refit runs as its OWN pass/program;
    fusing it into the frame program faults the TPU worker at scale,
    PERFORMANCE.md round 3)."""
    topo = _static_topology(grid)
    v = grid ** 3
    rows = topo["rows"]
    ls_row = CELLS_PER_ROW * MAX_TRIS_PER_VOXEL
    n_wide = topo["wide_refs"].shape[0]
    return {
        "mc_wnode": (n_wide, 7 * WIDE_WIDTH),
        "mc_node": (2 * rows - 1, 8),
        "mc_leaf": (rows, 10 * ls_row),
        "mc_tri_normals": (MAX_TRIS_PER_VOXEL * v, 9),
    }


def build_dynamic_tables(mc_result, grid: int) -> dict[str, jax.Array]:
    """Device refit: MC output -> traversal tables (see build_dynamic_scene
    docstring for the design). Returns the arrays named by table_shapes."""
    scene = build_dynamic_scene(mc_result, grid, 0)
    return {
        "mc_wnode": scene.bvh.wnode_packed,
        "mc_node": scene.bvh.node_packed,
        "mc_leaf": scene.bvh.leaf_packed,
        "mc_tri_normals": scene.normals_rows,
    }


def dynamic_scene_from_tables(tables, grid: int, material_id) -> DynamicScene:
    """Reassemble a DynamicScene from refit tables carried as graph
    resources. Only the fields the packet traversals read are real
    (wnode_packed / node_packed / leaf_packed + the static-topology columns
    and depths); box/leaf component arrays are placeholders."""
    topo = _static_topology(grid)
    ls_row = CELLS_PER_ROW * MAX_TRIS_PER_VOXEL
    zeros3 = jnp.zeros((1, 3), jnp.float32)
    dyn_bvh = BVH(
        node_min=zeros3,
        node_max=zeros3,
        node_miss=jnp.asarray(topo["miss_pre"]),
        node_leaf=jnp.asarray(topo["leaf_pre"]),
        leaf_tris=jnp.zeros((1, ls_row), jnp.int32),
        leaf_v0=jnp.zeros((1, ls_row, 3)),
        leaf_e1=jnp.zeros((1, ls_row, 3)),
        leaf_e2=jnp.zeros((1, ls_row, 3)),
        node_packed=tables["mc_node"],
        leaf_packed=tables["mc_leaf"],
        wnode_packed=tables["mc_wnode"],
        wnode_meta=jnp.asarray(topo["wide_meta"]),
        max_depth=int(topo["bin_depth"]),
        wide_depth=int(topo["wide_depth"]),
    )
    return DynamicScene(
        bvh=dyn_bvh,
        normals_rows=tables["mc_tri_normals"],
        material=jnp.asarray(material_id, jnp.int32),
    )


def build_dynamic_scene(mc_result, grid: int, material_id) -> DynamicScene:
    """Refit the static-topology tree to this frame's MC output (device).

    mc_result: ops.marching_cubes.MarchingCubesResult with slot-major
    (5V, 3, 3) positions/normals and (5V,) valid.
    """
    topo = _static_topology(grid)
    v = grid ** 3
    rows = topo["rows"]
    ls = MAX_TRIS_PER_VOXEL
    ls_row = CELLS_PER_ROW * ls

    # Slot-major (5V, ...) -> per-cell (V, 5, ...), linear cell order, then
    # MORTON RANK order paired two cells per leaf row (see module doc).
    pos = mc_result.positions.reshape(ls, v, 3, 3).transpose(1, 0, 2, 3)
    valid = mc_result.valid.reshape(ls, v).transpose(1, 0)  # (V, 5)
    morton = jnp.asarray(topo["morton_cells"])  # rank -> linear (static)
    pos_r = pos[morton].reshape(rows, CELLS_PER_ROW, ls, 3, 3)
    val_r = valid[morton].reshape(rows, CELLS_PER_ROW, ls)

    # -- leaf rows (rank order): slot s cols [9s, 9s+9) = v0, e1, e2 (cell
    # 0 fills slots 0..4, cell 1 slots 5..9); ids (slot-major triangle
    # index s*V + linear cell) bitcast into the trailing ls_row cols.
    v0 = pos_r[..., 0, :]
    e1 = pos_r[..., 1, :] - v0
    e2 = pos_r[..., 2, :] - v0
    vm = val_r[..., None]
    per_slot = jnp.where(
        vm, jnp.concatenate([v0, e1, e2], axis=-1), 0.0
    )  # (R, 2, 5, 9)
    cells_lin = morton.reshape(rows, CELLS_PER_ROW)
    slot_ids = (
        jnp.arange(ls, dtype=jnp.int32)[None, None, :] * v
        + cells_lin[:, :, None]
    )
    ids = jnp.where(val_r, slot_ids, -1).reshape(rows, ls_row)
    leaf_packed = jnp.concatenate(
        [
            per_slot.reshape(rows, ls_row * 9),
            jax.lax.bitcast_convert_type(ids, jnp.float32),
        ],
        axis=1,
    )

    # -- leaf boxes (tight over emitted vertices; empty cells inverted).
    # Inverted boxes are correct for the UNION reductions below (min/+BIG,
    # max/-BIG are identities) but must NEVER reach a packed table: the
    # slab test normalizes each axis interval with min/max, so an inverted
    # box tests as COVERING EVERYTHING — every packet walked the entire
    # 4.4k-node tree and the dyn kernels ran ~1.1 s/front at 512²
    # (round-3 profile). _depoison rewrites empty boxes as a POINT at
    # +_BIG at pack time: tnear lands at ~+3e25 > any best_t, so no ray
    # enters, and the point cannot stretch a parent union (parents are
    # reduced from the inverted form).
    flat = pos_r.reshape(rows, ls_row * 3, 3)
    vmask = jnp.repeat(val_r.reshape(rows, ls_row), 3, axis=1)[..., None]
    bmin = jnp.min(jnp.where(vmask, flat, _BIG), axis=1)  # (R, 3)
    bmax = jnp.max(jnp.where(vmask, flat, -_BIG), axis=1)

    def _depoison(bmin, bmax):
        empty = jnp.any(bmin > bmax, axis=-1, keepdims=True)
        return (
            jnp.where(empty, _BIG, bmin),
            jnp.where(empty, _BIG, bmax),
        )

    # -- level reductions + wide-node box rows (node order: root..level1).
    level_sizes = topo["wide_level_sizes"]
    mins = [bmin]
    maxs = [bmax]
    for li in range(1, len(level_sizes)):
        n = level_sizes[li]
        prev_min, prev_max = mins[-1], maxs[-1]
        pad = n * WIDE_WIDTH - prev_min.shape[0]
        if pad:
            prev_min = jnp.concatenate(
                [prev_min, jnp.full((pad, 3), _BIG)], axis=0
            )
            prev_max = jnp.concatenate(
                [prev_max, jnp.full((pad, 3), -_BIG)], axis=0
            )
        gmin = prev_min.reshape(n, WIDE_WIDTH, 3)
        gmax = prev_max.reshape(n, WIDE_WIDTH, 3)
        mins.append(gmin.min(axis=1))
        maxs.append(gmax.max(axis=1))
        # Box row of the level-li node = its children's boxes (empty
        # children depoisoned to unhittable point-boxes, see above).
        pmin, pmax = _depoison(gmin, gmax)
        row = jnp.concatenate([pmin, pmax], axis=-1)  # (n, 16, 6)
        if li == 1:
            level_rows = {1: row}
        else:
            level_rows[li] = row
    node_rows = jnp.concatenate(
        [level_rows[li] for li in range(len(level_sizes) - 1, 0, -1)], axis=0
    )  # (Wn, 16, 6) in node order
    wnode_packed = jnp.concatenate(
        [
            node_rows.transpose(0, 2, 1).reshape(node_rows.shape[0], 6 * WIDE_WIDTH),
            jax.lax.bitcast_convert_type(
                jnp.asarray(topo["wide_refs"]), jnp.float32
            ),
        ],
        axis=1,
    )

    # -- binary skip tree (XLA fallback): heap level arrays -> preorder.
    hmins = [bmin]
    hmaxs = [bmax]
    while hmins[-1].shape[0] > 1:
        n = hmins[-1].shape[0] // 2
        hmins.append(hmins[-1].reshape(n, 2, 3).min(axis=1))
        hmaxs.append(hmaxs[-1].reshape(n, 2, 3).max(axis=1))
    heap_min = jnp.concatenate(hmins[::-1], axis=0)  # heap index h -> row h-1
    heap_max = jnp.concatenate(hmaxs[::-1], axis=0)
    pre = jnp.asarray(topo["pre2heap"] - 1, jnp.int32)
    pre_min, pre_max = _depoison(heap_min[pre], heap_max[pre])
    node_packed = jnp.concatenate(
        [pre_min, pre_max, jnp.asarray(topo["bin_cols"])], axis=1
    )

    dyn_bvh = BVH(
        node_min=pre_min,
        node_max=pre_max,
        node_miss=jnp.asarray(topo["miss_pre"]),
        node_leaf=jnp.asarray(topo["leaf_pre"]),
        leaf_tris=ids,
        leaf_v0=jnp.zeros((1, ls_row, 3)),
        leaf_e1=jnp.zeros((1, ls_row, 3)),
        leaf_e2=jnp.zeros((1, ls_row, 3)),
        node_packed=node_packed,
        leaf_packed=leaf_packed,
        wnode_packed=wnode_packed,
        wnode_meta=jnp.asarray(topo["wide_meta"]),
        max_depth=int(topo["bin_depth"]),
        wide_depth=int(topo["wide_depth"]),
    )

    normals_rows = mc_result.normals.reshape(-1, 9)
    return DynamicScene(
        bvh=dyn_bvh,
        normals_rows=normals_rows,
        material=jnp.asarray(material_id, jnp.int32),
    )


def _dyn_traverse(dyn: DynamicScene, origin, direction, t_min, t_max,
                  any_hit: bool = False):
    mode = bvh_ops._pallas_mode(dyn.bvh, wide=True)
    if mode != "none":
        from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas

        # Production row-cursor settings (round 5): the paired-row dynamic
        # tree carries wnode_meta with contiguous children, so the same
        # kernel + skip branches as ops/bvh.py make_closest_hit /
        # make_any_hit apply; the launcher falls back to the dual-expand
        # steady drain (dual=True, steady_drain=3, drain_first on
        # occlusion) wherever the row path is unsupported.
        return traverse_packet_pallas(
            dyn.bvh, origin, direction, t_min, t_max, any_hit=any_hit,
            wide=True, dma_leaf=(mode == "dma"), dual=True, steady_drain=3,
            drain_first=any_hit, row_cursors=8, row_expand=2,
            skip_drain=True, skip_expand=any_hit,
        )
    return bvh_ops.traverse_packet(
        dyn.bvh, origin, direction, t_min, t_max, any_hit=any_hit
    )


def combine_closest_hit(base_closest, dyn: DynamicScene):
    """closest_hit that also traces the dynamic tree; nearer wins. Dynamic
    hits carry kind = HIT_DYNAMIC and prim = slot-major MC triangle index."""

    def closest_hit(scene, origin, direction, t_min=1e-3, t_max=1e4) -> Hit:
        base = base_closest(scene, origin, direction, t_min, t_max)
        t, prim, u, v = _dyn_traverse(dyn, origin, direction, t_min, t_max)
        closer = t < base.t
        return Hit(
            t=jnp.where(closer, t, base.t),
            kind=jnp.where(closer, HIT_DYNAMIC, base.kind),
            prim=jnp.where(closer, jnp.maximum(prim, 0), base.prim),
            u=jnp.where(closer, u, base.u),
            v=jnp.where(closer, v, base.v),
        )

    return closest_hit


def combine_any_hit(base_any, dyn: DynamicScene):
    def any_hit(scene, origin, direction, t_min=1e-3, t_max=1e4):
        occluded = base_any(scene, origin, direction, t_min, t_max)
        t, prim, _, _ = _dyn_traverse(
            dyn, origin, direction, t_min, t_max, any_hit=True
        )
        return jnp.logical_or(occluded, prim >= 0)

    return any_hit


def surface_patch(dyn: DynamicScene, hit: Hit, direction, surf):
    """Overwrite Surface fields on dynamic-hit lanes: MC gradient normals
    interpolated by barycentrics (one packed-row gather), the MC material,
    uv = 0 (the MC surface is untextured, marching_cubes.comp has no uvs)."""
    is_dyn = hit.kind == HIT_DYNAMIC
    shape = hit.t.shape
    rows = row_gather(
        dyn.normals_rows, jnp.clip(hit.prim, 0, dyn.normals_rows.shape[0] - 1).reshape(-1)
    ).reshape(shape + (9,))
    w0 = (1.0 - hit.u - hit.v)[..., None]
    w1 = hit.u[..., None]
    w2 = hit.v[..., None]
    n = rows[..., 0:3] * w0 + rows[..., 3:6] * w1 + rows[..., 6:9] * w2
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    geo = n
    facing = jnp.sum(n * direction, axis=-1, keepdims=True) > 0.0
    n = jnp.where(facing, -n, n)

    m = is_dyn[..., None]
    return surf._replace(
        normal=jnp.where(m, n, surf.normal),
        geo_normal=jnp.where(m, geo, surf.geo_normal),
        uv=jnp.where(m, 0.0, surf.uv),
        material=jnp.where(is_dyn, dyn.material, surf.material),
        mesh=jnp.where(is_dyn, -2, surf.mesh),
    )


def patch_gbuffer(dyn: DynamicScene, hit: Hit, direction, gb, mc_color):
    """Fill gbuffer planes on dynamic-hit lanes (normal from MC gradients,
    albedo = the MC pass color, pbr = rough dielectric + the MC material id)."""
    is_dyn = hit.kind == HIT_DYNAMIC
    shape = hit.t.shape
    rows = row_gather(
        dyn.normals_rows, jnp.clip(hit.prim, 0, dyn.normals_rows.shape[0] - 1).reshape(-1)
    ).reshape(shape + (9,))
    w0 = (1.0 - hit.u - hit.v)[..., None]
    w1 = hit.u[..., None]
    w2 = hit.v[..., None]
    n = rows[..., 0:3] * w0 + rows[..., 3:6] * w1 + rows[..., 6:9] * w2
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    one = jnp.ones(shape + (1,), jnp.float32)
    m = is_dyn[..., None]
    albedo = jnp.broadcast_to(jnp.asarray(mc_color, jnp.float32)[:3], shape + (3,))
    pbr = jnp.concatenate(
        [
            jnp.zeros(shape + (1,)), jnp.ones(shape + (1,)), one,
            jnp.broadcast_to(
                dyn.material.astype(jnp.float32), shape
            )[..., None],
        ],
        axis=-1,
    )
    return gb._replace(
        normal=jnp.where(m, jnp.concatenate([n, one], -1), gb.normal),
        albedo=jnp.where(m, jnp.concatenate([albedo, one], -1), gb.albedo),
        pbr=jnp.where(m, pbr, gb.pbr),
    )
