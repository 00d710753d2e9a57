"""Tile-binned software rasterization (Pallas): O(pixels·tris) -> O(binned).

The brute-force rasterizer (ops/raster.py) tests every triangle against every
pixel — intractable for the reference's 4x4096² shadow cascades
(renderers/shadow.rs:111-131) on Sponza-scale scenes. This module is the
triangle/tile binning design from SURVEY.md §7.3 hard part #2, built the
same way the BVH traversal kernel was (scalar row fetches + full-block
vector tests):

1. (XLA) Clip + screen-transform triangles, precompute per-triangle edge
   functions E_i(x,y) = A_i·x + B_i·y + C_i (sign-normalized so inside =
   all E >= 0 for BOTH windings — cull mode NONE, pipeline.rs:286-310) and
   vertex depths (interpolated barycentrically in the kernel; a depth
   PLANE was tried and is ill-conditioned for thin triangles).
2. (XLA) Bin triangles to (TILE_H, TILE_W)-pixel tiles by screen bbox with
   the capacity+mask pattern: each triangle emits up to SPAN_X*SPAN_Y
   (tile, tri) pairs; triangles spanning more tiles go to a GLOBAL list
   every tile processes (floors, walls), appended group-aligned to the same
   HBM table. Pairs are sorted by tile and per-tile segments located with
   searchsorted. No capacity cliffs: segments and the global list are both
   unbounded — the kernel streams them through VMEM in CAP-row chunks.
3. (Pallas) One grid step per tile: DMA the tile's segment of packed
   triangle rows from HBM into VMEM scratch (CAP rows per chunk, looping
   for longer segments), then a fori_loop of scalar row fetches — each
   iteration tests one triangle against the whole tile with ~15 vector
   ops. No gathers, no per-step dispatch, no cross-vector reductions in
   the loop (the walk is latency-free, unlike BVH traversal).

Two kernels: depth-only (shadow cascades) and the full visibility buffer
(gbuffer: depth + original-tri id + perspective-correct barycentrics).
`rasterize_depth` / `rasterize` in ops/raster.py auto-select them on TPU
for large workloads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_renderer_tpu.ops.raster import clip_to_screen, clip_triangles_near

TILE_H = 32
TILE_W = 256
SPAN_X = 2  # tiles a triangle may span horizontally before going global
SPAN_Y = 4
CAP = 1024  # triangle rows per VMEM chunk (NOT a capacity: longer per-tile
            # segments and global lists stream through in CAP-row chunks)


def _tri_rows(clip, indices, width, height, vis: bool = False):
    """Per-triangle packed rows + tile bboxes.

    Returns (rows, tx0, ty0, span_w, span_h, valid, is_global).
    vis=False: rows (2T, 16) f32 = [A0,B0,C0, A1,B1,C1, A2,B2,C2, a,b,c, pad4]
    (depth only). vis=True: rows (2T, 24) f32 adding the visibility-buffer
    payload: [.., inv_abs_area, iw0,iw1,iw2, b0u,b0v,b1u,b1v,b2u,b2v,
    orig_id_as_float] for perspective-correct ORIGINAL-triangle barycentrics
    (the clipped-vertex attribute trick of ops/raster.py).
    """
    tri_pos, tri_bary, tri_orig = clip_triangles_near(clip, indices)
    t2 = tri_pos.shape[0]
    screen, w = clip_to_screen(tri_pos.reshape(-1, 4), width, height)
    s = screen.reshape(t2, 3, 3)
    wv = w.reshape(t2, 3)

    x0, y0, z0 = s[:, 0, 0], s[:, 0, 1], s[:, 0, 2]
    x1, y1, z1 = s[:, 1, 0], s[:, 1, 1], s[:, 1, 2]
    x2, y2, z2 = s[:, 2, 0], s[:, 2, 1], s[:, 2, 2]

    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    valid = (
        (wv > 1e-6).all(axis=-1)
        & (jnp.abs(area) > 1e-12)
    )
    sgn = jnp.sign(area)
    inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)

    def edge(xa, ya, xb, yb):
        # E(x,y) = (xb-xa)(y-ya) - (yb-ya)(x-xa), sign-normalized.
        a_ = -(yb - ya) * sgn
        b_ = (xb - xa) * sgn
        c_ = ((yb - ya) * xa - (xb - xa) * ya) * sgn
        return a_, b_, c_

    a0, b0, c0 = edge(x0, y0, x1, y1)
    a1, b1, c1 = edge(x1, y1, x2, y2)
    a2, b2, c2 = edge(x2, y2, x0, y0)

    # Depth is interpolated barycentrically in the kernel
    # (z = (e1·z0 + e2·z1 + e0·z2) · inv_abs_area) — same form as
    # ops/raster.py's l0*z0 + l1*z1 + l2*z2. A screen-space depth PLANE
    # (z = a·x + b·y + c) was tried first and is catastrophically
    # ill-conditioned for thin triangles: plane gradients explode and the
    # constant term loses the bits that decide z-order.
    zeros = jnp.zeros_like(x0)
    inv_abs_area = jnp.abs(inv_area)
    if vis:
        iw = 1.0 / jnp.maximum(wv, 1e-9)  # (2T, 3)
        rows = jnp.stack(
            [a0, b0, c0, a1, b1, c1, a2, b2, c2, z0, z1, z2,
             inv_abs_area, iw[:, 0], iw[:, 1], iw[:, 2],
             tri_bary[:, 0, 0], tri_bary[:, 0, 1],
             tri_bary[:, 1, 0], tri_bary[:, 1, 1],
             tri_bary[:, 2, 0], tri_bary[:, 2, 1],
             tri_orig.astype(jnp.float32), zeros], axis=-1,
        )
        dead = jnp.asarray(
            [0.0, 0.0, -1.0] * 3 + [0.0] * 13 + [-1.0, 0.0], jnp.float32
        )
    else:
        rows = jnp.stack(
            [a0, b0, c0, a1, b1, c1, a2, b2, c2, z0, z1, z2,
             inv_abs_area, zeros, zeros, zeros], axis=-1,
        )
        # Invalid triangles: C0 = -1 with zero gradients -> never inside.
        dead = jnp.asarray([0.0, 0.0, -1.0] * 3 + [0.0] * 7, jnp.float32)
    rows = jnp.where(valid[:, None], rows, dead)

    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    valid = valid & on_screen

    nx = -(-width // TILE_W)
    ny = -(-height // TILE_H)
    tx0 = jnp.clip(jnp.floor(xmin / TILE_W).astype(jnp.int32), 0, nx - 1)
    tx1 = jnp.clip(jnp.floor(xmax / TILE_W).astype(jnp.int32), 0, nx - 1)
    ty0 = jnp.clip(jnp.floor(ymin / TILE_H).astype(jnp.int32), 0, ny - 1)
    ty1 = jnp.clip(jnp.floor(ymax / TILE_H).astype(jnp.int32), 0, ny - 1)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    is_global = valid & ((span_w > SPAN_X) | (span_h > SPAN_Y))
    return rows, tx0, ty0, span_w, span_h, valid, is_global


def _pack_rows(rows, stride):
    """Pack 128//stride triangle rows into each 128-wide row (Mosaic DMA
    slices need a 128-aligned minor dim) after padding the row width to
    `stride` and the row count to a multiple of the pack factor with DEAD
    rows (edge C = -1: never inside, so over-reading a packed group is
    harmless)."""
    pk = 128 // stride
    n, w = rows.shape
    dead = jnp.tile(
        jnp.asarray([0.0, 0.0, -1.0] * 3 + [0.0] * (w - 9), jnp.float32),
        ((-n) % pk, 1),
    )
    rows = jnp.concatenate([rows, dead], axis=0) if dead.shape[0] else rows
    rows = jnp.pad(rows, ((0, 0), (0, stride - w)))
    return rows.reshape(-1, 128)


def _bin_pairs(rows, tx0, ty0, span_w, span_h, valid, is_global, nx, ny,
               stride):
    """Emit (tile, tri) pairs, sort by tile, build segments + the global
    list. Returns (rows_packed, starts, counts, g_base, g_count): rows are
    packed 128//stride per row (see _pack_rows); starts/counts/g_count stay
    in TRIANGLE units; g_base is the GROUP index where the global section
    starts inside rows_packed. Nothing is dropped: the global section has
    static capacity for every triangle, and the kernel streams arbitrarily
    long segments in CAP-row chunks."""
    t2 = rows.shape[0]
    n_tiles = nx * ny
    pk = 128 // stride
    binned = valid & ~is_global

    tiles = []
    tris = []
    tri_ids = jnp.arange(t2, dtype=jnp.int32)
    for s in range(SPAN_X * SPAN_Y):
        dy, dx = divmod(s, SPAN_X)
        take = binned & (dy < span_h) & (dx < span_w)
        tile = (ty0 + dy) * nx + (tx0 + dx)
        tiles.append(jnp.where(take, tile, n_tiles))  # sentinel sorts last
        tris.append(tri_ids)
    tile_ids = jnp.concatenate(tiles)
    tri_ids_all = jnp.concatenate(tris)

    tile_sorted, tri_sorted = jax.lax.sort(
        (tile_ids, tri_ids_all), num_keys=1
    )
    grid_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, grid_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, grid_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    rows_sorted = rows[tri_sorted]  # one bulk row gather
    dead_row = jnp.asarray(
        [0.0, 0.0, -1.0] * 3 + [0.0] * (rows.shape[1] - 9), jnp.float32
    )

    # Global (large-span) triangles, compacted to the front — capacity is
    # ALL of them (rounded up to a group) so none are ever dropped.
    g_key = jnp.where(is_global, tri_ids, t2 + 1)
    g_order = jnp.argsort(g_key)
    g_count = jnp.sum(is_global.astype(jnp.int32))
    g_rows = rows[g_order]
    g_live = jnp.arange(t2) < g_count
    g_rows = jnp.where(g_live[:, None], g_rows, dead_row)

    # Layout: [segments | pad-to-group | globals | pad-to-group | CAP dead]
    # (the trailing dead chunk lets the last fixed-size chunk DMA over-read;
    # over-read rows are dead or real triangles — both harmless, edge
    # functions are global).
    n_seg = rows_sorted.shape[0]
    seg_pad = (-n_seg) % pk
    g_cap = g_rows.shape[0]
    g_pad = (-g_cap) % pk
    table = jnp.concatenate(
        [
            rows_sorted,
            jnp.tile(dead_row[None], (seg_pad, 1)),
            g_rows,
            jnp.tile(dead_row[None], (g_pad, 1)),
            jnp.tile(dead_row[None], (CAP, 1)),
        ],
        axis=0,
    )
    rows_packed = _pack_rows(table, stride)
    g_base = (n_seg + seg_pad) // pk
    return rows_packed, starts, counts, jnp.int32(g_base), g_count


DEPTH_STRIDE = 16  # f32 per triangle row; 8 rows packed per 128-wide row
VIS_STRIDE = 32    # 24 used + pad; 4 rows packed per 128-wide row


def _stream_groups(rows_hbm, scratch, sem, base_group, n_groups, pk,
                   group_body, state):
    """Stream `n_groups` packed row groups starting at `base_group` through
    the VMEM scratch in fixed CAP-row chunks, folding `group_body` over each
    group. The table carries a CAP-row dead pad so the fixed-size chunk DMA
    may over-read (over-read rows are dead or belong to a neighboring
    segment — harmless either way: dead rows are never inside and edge
    functions are global)."""
    chunk_groups = CAP // pk

    def chunk(c, state):
        dma = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(base_group + c * chunk_groups, chunk_groups)],
            scratch, sem,
        )
        dma.start()
        dma.wait()
        live = jnp.minimum(chunk_groups, n_groups - c * chunk_groups)
        return jax.lax.fori_loop(0, live, group_body, state)

    n_chunks = (n_groups + chunk_groups - 1) // chunk_groups
    return jax.lax.fori_loop(0, n_chunks, chunk, state)


def _depth_kernel(rows_hbm, starts_ref, counts_ref, gmeta_ref,
                  depth_out, scratch, sem):
    pk = 128 // DEPTH_STRIDE
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(1)
    tile = i * nx + j
    start = starts_ref[tile]
    count = counts_ref[tile]
    base = start // pk
    lead = start - base * pk
    groups = (lead + count + pk - 1) // pk

    ys = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + i.astype(jnp.float32) * TILE_H + 0.5)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + j.astype(jnp.float32) * TILE_W + 0.5)

    def test(row, base, depth):
        e0 = row[base + 0] * xs + row[base + 1] * ys + row[base + 2]
        e1 = row[base + 3] * xs + row[base + 4] * ys + row[base + 5]
        e2 = row[base + 6] * xs + row[base + 7] * ys + row[base + 8]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        ia = row[base + 12]
        z = (e1 * row[base + 9] + e2 * row[base + 10]
             + e0 * row[base + 11]) * ia
        return jnp.minimum(depth, jnp.where(inside, z, 3.0e38))

    def body(g, depth):
        row = scratch[g]
        for sl in range(pk):
            depth = test(row, sl * DEPTH_STRIDE, depth)
        return depth

    depth = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    # Global (large-span) triangles: every tile streams the global section.
    g_base = gmeta_ref[0]
    g_groups = (gmeta_ref[1] + pk - 1) // pk
    depth = _stream_groups(rows_hbm, scratch, sem, g_base, g_groups, pk,
                           body, depth)
    # This tile's own segment (unbounded length, chunked).
    depth = _stream_groups(rows_hbm, scratch, sem, base, groups, pk,
                           body, depth)
    depth_out[...] = jnp.minimum(depth, 1.0)


def _vis_kernel(rows_hbm, starts_ref, counts_ref, gmeta_ref,
                out_ref, scratch, sem):
    """Full visibility-buffer tile kernel: depth + orig tri id (as f32) +
    perspective-correct original-triangle barycentrics, fused into ONE
    (4, TILE_H, TILE_W) output block."""
    pk = 128 // VIS_STRIDE
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(1)
    tile = i * nx + j
    start = starts_ref[tile]
    count = counts_ref[tile]
    base = start // pk
    lead = start - base * pk
    groups = (lead + count + pk - 1) // pk

    ys = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + i.astype(jnp.float32) * TILE_H + 0.5)
    xs = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + j.astype(jnp.float32) * TILE_W + 0.5)

    def test(row, b, state):
        depth, tri, pu, pv = state
        e0 = row[b + 0] * xs + row[b + 1] * ys + row[b + 2]
        e1 = row[b + 3] * xs + row[b + 4] * ys + row[b + 5]
        e2 = row[b + 6] * xs + row[b + 7] * ys + row[b + 8]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        # Barycentrics from the edge functions (l0 = edge v1->v2, etc.).
        ia = row[b + 12]
        l0 = e1 * ia
        l1 = e2 * ia
        l2 = e0 * ia
        z = l0 * row[b + 9] + l1 * row[b + 10] + l2 * row[b + 11]
        take = inside & (z <= depth) & (z <= 1.0)
        # Perspective correction + ORIGINAL-triangle attribute compose
        # (ops/raster.py:246-267 semantics).
        lw0 = l0 * row[b + 13]
        lw1 = l1 * row[b + 14]
        lw2 = l2 * row[b + 15]
        denom = lw0 + lw1 + lw2
        rden = 1.0 / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        u = (lw0 * row[b + 16] + lw1 * row[b + 18] + lw2 * row[b + 20]) * rden
        v = (lw0 * row[b + 17] + lw1 * row[b + 19] + lw2 * row[b + 21]) * rden
        return (
            jnp.where(take, z, depth),
            jnp.where(take, row[b + 22], tri),
            jnp.where(take, u, pu),
            jnp.where(take, v, pv),
        )

    def body(g, state):
        row = scratch[g]
        for sl in range(pk):
            state = test(row, sl * VIS_STRIDE, state)
        return state

    init = (
        jnp.full((TILE_H, TILE_W), 1.0, jnp.float32),
        jnp.full((TILE_H, TILE_W), -1.0, jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
    )
    g_base = gmeta_ref[0]
    g_groups = (gmeta_ref[1] + pk - 1) // pk
    state = _stream_groups(rows_hbm, scratch, sem, g_base, g_groups, pk,
                           body, init)
    state = _stream_groups(rows_hbm, scratch, sem, base, groups, pk,
                           body, state)
    depth, tri, pu, pv = state
    out_ref[0, 0] = depth
    out_ref[0, 1] = tri
    out_ref[0, 2] = pu
    out_ref[0, 3] = pv


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "interpret")
)
def _run_vis(rows_sorted, starts, counts, g_base, g_count, nx, ny,
             interpret=False):
    grid_spec = pl.GridSpec(
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, TILE_H, TILE_W), lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CAP // (128 // VIS_STRIDE), 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    gmeta = jnp.stack(
        [g_base.astype(jnp.int32), g_count.astype(jnp.int32)]
    )
    return pl.pallas_call(
        _vis_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, 4, ny * TILE_H, nx * TILE_W), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows_sorted, starts, counts, gmeta)[0]


def rasterize_binned(
    clip: jax.Array, indices: jax.Array, width: int, height: int,
    interpret: bool | None = None,
    init=None,
):
    """Full visibility-buffer binned rasterization; drop-in for
    ops.raster.rasterize (same semantics: min-z LESS_OR_EQUAL, both
    windings, near-clipped, perspective-correct ORIGINAL-triangle
    barycentrics). Returns an ops.raster.VisibilityBuffer. `init` carries a
    previous buffer to depth-test against (the LOAD-op path)."""
    from rust_renderer_tpu.ops.raster import VisibilityBuffer

    if indices.shape[0] == 0 and init is None:
        return VisibilityBuffer(
            depth=jnp.ones((height, width), jnp.float32),
            tri=jnp.full((height, width), -1, jnp.int32),
            bary_u=jnp.zeros((height, width), jnp.float32),
            bary_v=jnp.zeros((height, width), jnp.float32),
        )
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    nx = -(-width // TILE_W)
    ny = -(-height // TILE_H)
    rows, tx0, ty0, sw, sh, valid, is_global = _tri_rows(
        clip, indices, width, height, vis=True
    )
    rows_sorted, starts, counts, g_base, g_count = _bin_pairs(
        rows, tx0, ty0, sw, sh, valid, is_global, nx, ny, VIS_STRIDE
    )
    out = _run_vis(
        rows_sorted, starts, counts, g_base, g_count, nx, ny,
        interpret=interpret,
    )
    depth = out[0, 0, :height, :width]
    tri = out[0, 1, :height, :width].astype(jnp.int32)
    bary_u = out[0, 2, :height, :width]
    bary_v = out[0, 3, :height, :width]
    none = tri < 0
    depth = jnp.where(none, 1.0, depth)
    vis = VisibilityBuffer(
        depth=depth, tri=jnp.where(none, -1, tri),
        bary_u=jnp.where(none, 0.0, bary_u), bary_v=jnp.where(none, 0.0, bary_v),
    )
    if init is not None:
        closer = vis.depth <= init.depth
        covered = (vis.tri >= 0) & closer
        vis = VisibilityBuffer(
            depth=jnp.where(covered, vis.depth, init.depth),
            tri=jnp.where(covered, vis.tri, init.tri),
            bary_u=jnp.where(covered, vis.bary_u, init.bary_u),
            bary_v=jnp.where(covered, vis.bary_v, init.bary_v),
        )
    return vis


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "interpret")
)
def _run(rows_sorted, starts, counts, g_base, g_count, nx, ny,
         interpret=False):
    grid_spec = pl.GridSpec(
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # sorted rows (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (g_base, g_count)
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CAP // (128 // DEPTH_STRIDE), 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    gmeta = jnp.stack(
        [g_base.astype(jnp.int32), g_count.astype(jnp.int32)]
    )
    return pl.pallas_call(
        _depth_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((ny * TILE_H, nx * TILE_W), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows_sorted, starts, counts, gmeta)[0]


def rasterize_depth_binned(
    clip: jax.Array, indices: jax.Array, width: int, height: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Depth-only binned rasterization; drop-in for
    ops.raster.rasterize_depth (same depth semantics: min-z, clear=1.0,
    both windings, near-clipped)."""
    if indices.shape[0] == 0:
        return jnp.ones((height, width), jnp.float32)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    nx = -(-width // TILE_W)
    ny = -(-height // TILE_H)
    rows, tx0, ty0, sw, sh, valid, is_global = _tri_rows(
        clip, indices, width, height
    )
    rows_sorted, starts, counts, g_base, g_count = _bin_pairs(
        rows, tx0, ty0, sw, sh, valid, is_global, nx, ny, DEPTH_STRIDE
    )
    depth = _run(
        rows_sorted, starts, counts, g_base, g_count, nx, ny,
        interpret=interpret,
    )
    return depth[:height, :width]
