"""CPU replay: per-sublane-ROW traversal cursors vs the block-union walk.

The round-3 verdict closed per-iteration cost as VPU-throughput-bound
(~0.87 us = 3.3k vec ops / 4 ALUs) and scheduling tricks as mined out;
the remaining traversal cost is STRUCTURAL packet-union width — a block
walks the union of 1024 lanes' node sets. This tool evaluates splitting
the cursor: G independent cursors per block, each owning 1024/G
contiguous lanes (G=8 -> one cursor per (1,128) sublane row). Key
economics: testing 16 boxes of G DIFFERENT nodes against an (8,128)
packet costs the SAME vector work as 16 boxes of ONE node (sublanes are
not independently billable on the VPU), so per-iteration vector cost is
~flat while each iteration retires G nodes — IF the per-row unions are
narrower than the block union (they should be: compaction already sorts
lanes by origin Morton code, so rows are tight origin clusters).

Cost model (validated against the sdd replay numbers in PERFORMANCE.md):
  prod  sdd3 dual-expand iters ~= max(ceil(internal/2), ceil(leaf/3))
  rowG  single-expand-per-cursor iters = max over cursors of
        max(internal_g, ceil(leaf_g/D))      [D leaf rows drained/iter/cursor]
  rowG2 dual-expand-per-cursor             = max(ceil(internal_g/2), ...)

Reported per front: total iters per arrangement (sum over blocks), the
leaf-row duplication factor sum_g(leaf_g)/leaf_union (DMA-traffic proxy
for Sponza's dma_leaf mode), and the row-imbalance ratio mean/max.

Usage: python tools/eval_rowcursor.py [--blocks 64] [--live 0.8,0.4,0.2,0.1]
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
from eval_tree import walk_block  # noqa: E402
from eval_compaction import (  # noqa: E402
    closest_t, morton_codes, partition_key)


def walk_counts(bvh, o, d, any_hit):
    """(internal_pops, leaf_pops) for one lane group; dead group = (0, 0)."""
    if not np.any(np.abs(d).sum(1) > 0):
        return 0, 0
    p, lp = walk_block(bvh, o, d, any_hit=any_hit)
    return p - lp, lp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--live", default="0.8,0.4,0.2,0.1")
    ap.add_argument("--any-hit", action="store_true")
    ap.add_argument("--drain", type=int, default=3)
    ap.add_argument("--scene", default="default")
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

    side = max(32, (int(np.sqrt(args.blocks * 1024)) // 32) * 32)
    n = side * side
    eye = np.asarray(cam_eye, np.float32)
    look = np.asarray([0.0, 0.5, 0.0], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    uu, vv = np.meshgrid(np.linspace(-0.6, 0.6, side),
                         np.linspace(-0.35, 0.35, side))
    dirs = (fwd[None] + uu.reshape(-1, 1) * right[None]
            + vv.reshape(-1, 1) * up[None]).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o_cam = np.tile(eye, (n, 1)).astype(np.float32)

    print("computing first-hit points (exact replay)...", flush=True)
    t0 = time.time()
    t_hit = closest_t(bvh, o_cam, dirs)
    hit = t_hit < 0.99e4
    print(f"  {time.time() - t0:.1f}s; hit fraction {hit.mean():.2f}",
          flush=True)
    orig = o_cam + np.minimum(t_hit, 1e3)[:, None] * dirs

    rng = np.random.default_rng(7)
    d_b = rng.normal(size=(n, 3)).astype(np.float32)
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)

    base_noise = rng.normal(size=(side, side))
    k = 15
    ker = np.ones(k) / k
    sm = np.apply_along_axis(lambda m: np.convolve(m, ker, mode="same"), 0,
                             base_noise)
    sm = np.apply_along_axis(lambda m: np.convolve(m, ker, mode="same"), 1,
                             sm).reshape(-1)[:n]

    D = args.drain
    nb = n // 1024

    def eval_front(o, d, label):
        """All arrangements assume the production morton-compacted order
        (already applied by the caller)."""
        iters_prod = 0
        rows_union = 0
        per_g = {}
        for G in (2, 4, 8):
            per_g[G] = dict(it1=0, it2=0, rows=0, imb=[])
        for b in range(nb):
            sl = slice(b * 1024, (b + 1) * 1024)
            ib, lb = walk_counts(bvh, o[sl], d[sl], args.any_hit)
            if ib == 0 and lb == 0:
                iters_prod += 1
            else:
                iters_prod += max((ib + 1) // 2, (lb + D - 1) // D)
            rows_union += lb
            for G, acc in per_g.items():
                lanes = 1024 // G
                it1 = it2 = 0
                rows = 0
                per_cursor = []
                for g in range(G):
                    s2 = slice(b * 1024 + g * lanes,
                               b * 1024 + (g + 1) * lanes)
                    ig, lg = walk_counts(bvh, o[s2], d[s2], args.any_hit)
                    rows += lg
                    c1 = max(ig, (lg + D - 1) // D)
                    c2 = max((ig + 1) // 2, (lg + D - 1) // D)
                    per_cursor.append(c1)
                    it1 = max(it1, c1)
                    it2 = max(it2, c2)
                acc["it1"] += max(it1, 1)
                acc["it2"] += max(it2, 1)
                acc["rows"] += rows
                if max(per_cursor) > 0:
                    acc["imb"].append(
                        np.mean(per_cursor) / max(per_cursor))
        print(f"  {label}: prod-sdd{D} iters {iters_prod:7d} "
              f"(union leaf rows {rows_union})", flush=True)
        for G, acc in per_g.items():
            dup = acc["rows"] / max(rows_union, 1)
            imb = np.mean(acc["imb"]) if acc["imb"] else 0.0
            print(f"    row{G}:  single-exp {acc['it1']:7d} "
                  f"({acc['it1'] / iters_prod:5.2f}x)  dual-exp "
                  f"{acc['it2']:7d} ({acc['it2'] / iters_prod:5.2f}x)  "
                  f"leafdup {dup:4.2f}  balance {imb:4.2f}", flush=True)

    # camera front (100% live, coherent) — raster order is the production
    # layout for primaries (no compaction on full-live fronts)
    print("== camera primary front ==", flush=True)
    eval_front(o_cam, dirs, "camera")

    mc = morton_codes(orig)
    for frac in [float(x) for x in args.live.split(",")]:
        thr = np.quantile(sm[hit], frac) if frac < 1 else sm.max() + 1
        live = hit & (sm < thr)
        d = np.where(live[:, None], d_b, 0.0).astype(np.float32)
        # production arrangement: morton sort (dead last) over 64-block
        # windows (window >= front here, matching compact_window=64 at
        # this size)
        ow, dw = partition_key(orig, d, live, n, mc)
        print(f"== bounce front, live {live.mean() * 100:.0f}% ==",
              flush=True)
        eval_front(ow, dw, "bounce")


if __name__ == "__main__":
    main()
