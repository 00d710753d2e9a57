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
   the screen-space depth plane z(x,y) = a·x + b·y + c.
2. (XLA) Bin triangles to (TILE_H, TILE_W)-pixel tiles by screen bbox with
   the capacity+mask pattern: each triangle emits up to SPAN_X*SPAN_Y
   (tile, tri) pairs; triangles spanning more tiles go to a small GLOBAL
   list every tile processes (floors, walls). Pairs are sorted by tile and
   per-tile segments located with searchsorted. Caps are reported back as
   overflow counts, never silently dropped... overflowing tiles drop the
   tail and the caller can see it.
3. (Pallas) One grid step per tile: DMA the tile's segment of packed
   triangle rows (16 f32: 3 edges + depth plane) from HBM into VMEM
   scratch, then a fori_loop of scalar row fetches — each iteration tests
   one triangle against the whole tile with ~13 vector ops and min-folds
   the depth plane. No gathers, no per-step dispatch, no cross-vector
   reductions in the loop (the walk is latency-free, unlike BVH traversal).

Used for depth-only shadow cascades; `rasterize_depth` in ops/raster.py
auto-selects it on TPU for large workloads.
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
CAP = 1024  # per-tile triangle capacity (overflow reported)
GLOBAL_CAP = 64


def _tri_rows(clip, indices, width, height):
    """Per-triangle packed rows + tile bboxes.

    Returns (rows (2T, 16) f32, tx0, ty0, span_w, span_h, valid, is_global)
    with row = [A0,B0,C0, A1,B1,C1, A2,B2,C2, a,b,c, 0,0,0,0].
    """
    tri_pos, _bary, _orig = clip_triangles_near(clip, indices)
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

    # Screen-space depth plane (z is linear in x,y — NDC z, matching
    # ops/raster.py's l0*z0 + l1*z1 + l2*z2).
    dl1dx = (y2 - y0) * inv_area
    dl1dy = -(x2 - x0) * inv_area
    dl2dx = -(y1 - y0) * inv_area
    dl2dy = (x1 - x0) * inv_area
    za = (z1 - z0) * dl1dx + (z2 - z0) * dl2dx
    zb = (z1 - z0) * dl1dy + (z2 - z0) * dl2dy
    zc = z0 - za * x0 - zb * y0

    zeros = jnp.zeros_like(x0)
    rows = jnp.stack(
        [a0, b0, c0, a1, b1, c1, a2, b2, c2, za, zb, zc,
         zeros, zeros, zeros, zeros], axis=-1,
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


def _bin_pairs(rows, tx0, ty0, span_w, span_h, valid, is_global, nx, ny):
    """Emit capped (tile, tri) pairs, sort by tile, build segments + the
    global list. Returns (rows_sorted, starts, counts, g_rows, g_count,
    overflow_global)."""
    t2 = rows.shape[0]
    n_tiles = nx * ny
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
    # Pad so a fixed-size CAP DMA never reads past the end.
    rows_sorted = jnp.pad(rows_sorted, ((0, CAP), (0, 0)))

    # Global (large-span) triangles: compact the first GLOBAL_CAP.
    g_key = jnp.where(is_global, tri_ids, t2 + 1)
    g_order = jnp.argsort(g_key)[:GLOBAL_CAP]
    g_total = jnp.sum(is_global.astype(jnp.int32))
    g_count = jnp.minimum(g_total, GLOBAL_CAP)
    g_rows = rows[g_order]
    g_live = jnp.arange(GLOBAL_CAP) < g_count
    dead = jnp.asarray([0.0, 0.0, -1.0] * 3 + [0.0] * 7, jnp.float32)
    g_rows = jnp.where(g_live[:, None], g_rows, dead)
    return rows_sorted, starts, counts, g_rows, g_count, g_total - g_count


def _depth_kernel(rows_hbm, g_rows_ref, starts_ref, counts_ref, gcount_ref,
                  depth_out, overflow_out, scratch, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nx = pl.num_programs(1)
    tile = i * nx + j
    start = starts_ref[tile]
    count = counts_ref[tile]
    clamped = jnp.minimum(count, CAP)

    dma = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(start, CAP)], scratch, sem
    )
    dma.start()

    ys = (jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
          + i.astype(jnp.float32) * TILE_H + 0.5)
    xs = (jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)
          + j.astype(jnp.float32) * TILE_W + 0.5)

    def test(row, depth):
        e0 = row[0] * xs + row[1] * ys + row[2]
        e1 = row[3] * xs + row[4] * ys + row[5]
        e2 = row[6] * xs + row[7] * ys + row[8]
        inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        z = row[9] * xs + row[10] * ys + row[11]
        return jnp.minimum(depth, jnp.where(inside, z, 3.0e38))

    # Global triangles overlap while the segment DMA is in flight.
    def g_body(k, depth):
        return test(g_rows_ref[k], depth)

    depth = jax.lax.fori_loop(
        0, gcount_ref[0], g_body, jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
    )

    dma.wait()

    def body(k, depth):
        return test(scratch[k], depth)

    depth = jax.lax.fori_loop(0, clamped, body, depth)
    depth_out[...] = jnp.minimum(depth, 1.0)
    overflow_out[0, 0] = jnp.maximum(count - CAP, 0)


@functools.partial(
    jax.jit, static_argnames=("nx", "ny", "interpret")
)
def _run(rows_sorted, starts, counts, g_rows, g_count, nx, ny,
         interpret=False):
    grid_spec = pl.GridSpec(
        grid=(ny, nx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # sorted rows (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # global rows
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # g_count
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (i, j),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CAP, 16), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _depth_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((ny * TILE_H, nx * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((ny, nx), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows_sorted, g_rows, starts, counts,
      g_count.reshape(1).astype(jnp.int32))


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
    rows_sorted, starts, counts, g_rows, g_count, _g_over = _bin_pairs(
        rows, tx0, ty0, sw, sh, valid, is_global, nx, ny
    )
    depth, _overflow = _run(
        rows_sorted, starts, counts, g_rows, g_count, nx, ny,
        interpret=interpret,
    )
    return depth[:height, :width]
