"""CPU replay: wide-node WIDTH sweep for the row-cursor kernel.

A width-16 f32 wide node fills one 512 B VMEM row (6 planes x 16 children
x 4 B = 384 B + refs). Quantizing child boxes to 16 bits against a per-node
grid (CWBVH-style) packs THREE planes per int32 lane, so widths up to 32
children still fit ONE (1,128) int32 row: [3W box lanes | origin.xyz +
scale.xyz f32 header]. Wider nodes = shallower trees = fewer pops per
cursor; per-pop vector cost grows ~linearly with width but vector work is
the minor share of the measured iteration cost (PERFORMANCE.md r3).

This tool replays the wide walk per (1,128)-lane row group (the row-cursor
arrangement, G=8) on width-16/24/32 collapses of the same binary SAH tree
and reports the row-cursor iteration count model
    iters = max over cursors of max(ceil(int_pops/expand), ceil(leaf/drain))
plus leaf-row duplication (DMA-traffic proxy). Quantization itself is not
modeled: conservative 16-bit snapping inflates each box by <= 2^-16 of the
parent extent, far below the replay's noise.

Usage: python tools/eval_w32.py [--blocks 16] [--scene default|sponza]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import rust_renderer_tpu as rt  # noqa: E402
from rust_renderer_tpu.models import create_scene  # noqa: E402
from rust_renderer_tpu.ops import bvh as bvhmod  # noqa: E402
from rust_renderer_tpu.ops.bvh import WIDE_EMPTY  # noqa: E402
from eval_tree import walk_block  # noqa: E402
from eval_rowcursor import closest_t  # noqa: E402


def walk_counts_w(packed, width, leaf_perm, bvh, o, d, t_max=1e4, t_min=1e-3,
                  any_hit=False):
    """(internal_pops, leaf_pops) replay over an arbitrary-width collapse.
    leaf_perm maps the collapse's leaf ids to rows of bvh.leaf_* (which are
    in the production width-16 collapse order)."""
    if not np.any(np.abs(d).sum(1) > 0):
        return 0, 0
    wn = packed
    wn_i = packed.view(np.int32)
    leaf_v0 = np.asarray(bvh.leaf_v0)
    leaf_e1 = np.asarray(bvh.leaf_e1)
    leaf_e2 = np.asarray(bvh.leaf_e2)
    leaf_tris = np.asarray(bvh.leaf_tris)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def safe(a):
        return np.where(np.abs(a) < 1e-12, np.where(a < 0, -1e-12, 1e-12), a)

    ix, iy, iz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
    degenerate = (dx * dx + dy * dy + dz * dz) < 1e-12
    best_t = np.minimum(np.full(len(o), 3.0e38, np.float32), t_max)
    done = degenerate.copy()
    W = width
    stack = [0]
    pops = leaf_pops = 0
    while stack:
        ref = stack.pop()
        pops += 1
        if ref < 0:
            leaf_pops += 1
            li = int(leaf_perm[-2 - ref])
            alive = ~done
            for s in range(leaf_tris.shape[1]):
                tri = leaf_tris[li, s]
                if tri < 0:
                    continue
                v0, e1, e2 = leaf_v0[li, s], leaf_e1[li, s], leaf_e2[li, s]
                px = dy * e2[2] - dz * e2[1]
                py = dz * e2[0] - dx * e2[2]
                pz = dx * e2[1] - dy * e2[0]
                det = e1[0] * px + e1[1] * py + e1[2] * pz
                inv = np.where(np.abs(det) > 1e-12,
                               1.0 / np.where(det == 0, 1, det), 0.0)
                tvx, tvy, tvz = ox - v0[0], oy - v0[1], oz - v0[2]
                u = (tvx * px + tvy * py + tvz * pz) * inv
                qx = tvy * e1[2] - tvz * e1[1]
                qy = tvz * e1[0] - tvx * e1[2]
                qz = tvx * e1[1] - tvy * e1[0]
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
                ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                      & (u + v <= 1) & (t > t_min) & (t < best_t) & alive)
                best_t = np.where(ok, t, best_t)
                if any_hit:
                    done = done | ok
            if any_hit and done.all():
                break
            continue
        row = wn[ref]
        row_i = wn_i[ref]
        not_done = ~done
        for c in range(W):
            child = row_i[6 * W + c]
            if child == WIDE_EMPTY:
                continue
            tx0 = (row[c] - ox) * ix
            ty0 = (row[W + c] - oy) * iy
            tz0 = (row[2 * W + c] - oz) * iz
            tx1 = (row[3 * W + c] - ox) * ix
            ty1 = (row[4 * W + c] - oy) * iy
            tz1 = (row[5 * W + c] - oz) * iz
            tnear = np.maximum(np.maximum(np.minimum(tx0, tx1),
                                          np.minimum(ty0, ty1)),
                               np.minimum(tz0, tz1))
            tfar = np.minimum(np.minimum(np.maximum(tx0, tx1),
                                         np.maximum(ty0, ty1)),
                              np.maximum(tz0, tz1))
            hit = ((tfar >= np.maximum(tnear, t_min)) & (tnear <= best_t)
                   & not_done)
            if hit.any():
                stack.append(int(child))
    return pops - leaf_pops, leaf_pops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--scene", default="default")
    ap.add_argument("--widths", default="24,32")
    ap.add_argument("--drain", type=int, default=3)
    ap.add_argument("--expand", type=int, default=2)
    ap.add_argument("--any-hit", action="store_true")
    args = ap.parse_args()

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam = rt.Camera(cam_eye, [0.0, 0.5, 0.0], aspect_ratio=1.0)
    if args.scene == "sponza":
        from rust_renderer_tpu.models import create_sponza_scale_scene
        create_sponza_scale_scene(r, cam)
    else:
        create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_bvh(np.asarray(scene.positions),
                           np.asarray(scene.indices), leaf_size=12)

    # Binary tree arrays (leaf refs already remapped to the production
    # leaf-table order by _finalize).
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    miss = np.asarray(bvh.node_miss)
    nleaf = np.asarray(bvh.node_leaf)

    collapses = {16: (np.asarray(bvh.wnode_packed),
                      np.arange(bvh.leaf_packed.shape[0]))}
    for wdt in (int(x) for x in args.widths.split(",")):
        packed, depth, _meta, perm = bvhmod._collapse_wide(
            nmin, nmax, miss, nleaf, width=wdt)
        collapses[wdt] = (packed, perm)
        print(f"width {wdt}: {packed.shape[0]} nodes, depth {depth}, "
              f"leaf slots {len(perm)}", flush=True)

    n = args.blocks * 1024
    side = int(np.sqrt(n))
    eye = np.asarray(cam_eye, np.float32)
    look = np.asarray([0.0, 0.5, 0.0], np.float32)
    fwd = look - eye; fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    uu, vv = np.meshgrid(np.linspace(-0.6, 0.6, side),
                         np.linspace(-0.35, 0.35, side))
    dirs = (fwd[None] + uu.reshape(-1, 1) * right[None]
            + vv.reshape(-1, 1) * up[None]).astype(np.float32)[:n]
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o_cam = np.tile(eye, (n, 1)).astype(np.float32)

    print("first-hit points for bounce fronts...", flush=True)
    t_hit = closest_t(bvh, o_cam, dirs)
    orig = o_cam + np.minimum(t_hit, 1e3)[:, None] * dirs
    rng = np.random.default_rng(7)
    d_b = rng.normal(size=(n, 3)).astype(np.float32)
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)

    E, D = args.expand, args.drain
    fronts = [("camera", o_cam, dirs), ("bounce", orig, d_b)]
    for label, o, d in fronts:
        print(f"{label}:", flush=True)
        base = None
        for wdt, (packed, perm) in sorted(collapses.items()):
            t0 = time.time()
            iters = 0
            rows_tot = 0
            for b in range(n // 1024):
                worst = 1
                for g in range(8):
                    sl = slice(b * 1024 + g * 128, b * 1024 + (g + 1) * 128)
                    if wdt == 16:
                        ig, lg = walk_block(bvh, o[sl], d[sl],
                                            any_hit=args.any_hit)
                        ig -= lg
                    else:
                        ig, lg = walk_counts_w(packed, wdt, perm, bvh,
                                               o[sl], d[sl],
                                               any_hit=args.any_hit)
                    rows_tot += lg
                    worst = max(worst, max((ig + E - 1) // E,
                                           (lg + D - 1) // D))
                iters += worst
            if base is None:
                base = iters
            print(f"  w{wdt}: row8 iters {iters:7d} ({iters/base:5.2f}x) "
                  f"leaf rows {rows_tot:7d}  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
