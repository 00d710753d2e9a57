"""CPU economics for t-INTERVAL SPLIT closest-hit traversal.

Late bounce fronts dominate the 1080p frame (profile: closest b3+b4 =
828 ms of a 3.3 s frame even after compaction) and their walks are
origin-driven near-full unions. Idea: walk twice over disjoint t-intervals —
pass 1 with t_max clamped to a small g (best_t init = g prunes every box
with tnear > g: the packet only expands nodes within g of SOME lane origin),
pass 2 re-walks ONLY the lanes that found nothing inside g, over [g, inf)
(boxes fully inside g are culled by tfar < t_min). Lanes that hit in pass 1
retire with zero directions, so pass 2's dead lanes compact away and its
blocks walk narrow far-unions (sky lanes cluster spatially).

Exactness: a closest hit found in [t_min, g) is the global closest (any
farther hit has larger t); a lane with no hit there finds its true closest
in [g, inf). Boundary uses g*(1-1e-4) overlap to dodge open/closed races.

This tool replays the production sdd walk (tools/eval_lq.walk_queued) per
block and reports iters / rows / slots for single-pass vs pass1+pass2 at
several g, with a device-cost estimate (iter fixed+2 expands ~= 0.6 us,
row slot ~= 0.39 us — PERFORMANCE.md round-3 constants).

Usage: python tools/eval_tsplit.py [--blocks 16] [--scene default]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import rust_renderer_tpu as rt  # noqa: E402
from rust_renderer_tpu.models import create_scene  # noqa: E402
from rust_renderer_tpu.ops import bvh as bvhmod  # noqa: E402
from tools.eval_lq import walk_queued  # noqa: E402
from tools.eval_tree import make_fronts  # noqa: E402

IT_US = 0.6    # per-iteration fixed + dual expand
SLOT_US = 0.39  # per leaf-row slot


def cost(c):
    return c["iters"] * IT_US + c["row_slots"] * SLOT_US


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--leaf", type=int, default=12)
    ap.add_argument("--scene", default="default", choices=["default", "sponza"])
    ap.add_argument("--gs", default="")
    args = ap.parse_args()

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam_look = [0.0, 0.5, 0.0]
    cam = rt.Camera(cam_eye, cam_look, aspect_ratio=1.0)
    if args.scene == "sponza":
        from rust_renderer_tpu.models import create_sponza_scale_scene
        create_sponza_scale_scene(r, cam)
    else:
        create_scene(r, cam)
    scene = r.pack()
    pos = np.asarray(scene.positions)
    idx = np.asarray(scene.indices)
    bvh = bvhmod.build_bvh(pos, idx, leaf_size=args.leaf)
    fin = pos[(np.abs(pos) < 1e30).all(1)]
    diag = float(np.linalg.norm(fin.max(0) - fin.min(0)))
    gs = ([float(x) for x in args.gs.split(",")] if args.gs
          else [diag * f for f in (0.05, 0.1, 0.2, 0.4)])
    fronts = make_fronts(scene, (cam_eye, cam_look), args.blocks)
    kw = dict(drain=3, pops=2)  # production sdd3

    print(f"scene diag {diag:.1f}  blocks={args.blocks}  "
          f"cost model: iter {IT_US} us + slot {SLOT_US} us (per block)")
    for label, (o, d) in fronts:
        print(f"-- {label} closest --")
        base = None
        for b in range(args.blocks):
            sl = slice(b * 1024, (b + 1) * 1024)
            c = walk_queued(bvh, o[sl], d[sl], False, **kw)
            base = c if base is None else {k: base[k] + c[k] for k in c}
        nb = args.blocks
        print(f"  single      iters {base['iters']/nb:7.1f} "
              f"slots {base['row_slots']/nb:7.1f} "
              f"cost {cost(base)/nb:7.1f} us")
        for g in gs:
            tot1 = tot2 = None
            miss_frac = 0.0
            for b in range(args.blocks):
                sl = slice(b * 1024, (b + 1) * 1024)
                ob, db = o[sl], d[sl]
                c1, best_t, _ = walk_queued(
                    bvh, ob, db, False, t_max=g, return_state=True, **kw)
                live = (db * db).sum(1) > 0
                miss = (best_t >= g * (1 - 1e-6)) & live
                miss_frac += miss.mean()
                d2 = np.where(miss[:, None], db, 0.0)
                c2 = walk_queued(
                    bvh, ob, d2, False, t_min=g * (1 - 1e-4), **kw)
                tot1 = c1 if tot1 is None else {
                    k: tot1[k] + c1[k] for k in c1}
                tot2 = c2 if tot2 is None else {
                    k: tot2[k] + c2[k] for k in c2}
            tot = {k: tot1[k] + tot2[k] for k in tot1}
            print(f"  g={g:6.2f}  iters {tot['iters']/nb:7.1f} "
                  f"(p1 {tot1['iters']/nb:6.1f} p2 {tot2['iters']/nb:6.1f}) "
                  f"slots {tot['row_slots']/nb:7.1f} "
                  f"cost {cost(tot)/nb:7.1f} us "
                  f"({cost(tot)/max(cost(base),1e-9)*100:5.1f}%) "
                  f"miss-in-g {miss_frac/nb*100:4.1f}%", flush=True)


if __name__ == "__main__":
    main()
