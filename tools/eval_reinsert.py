"""CPU pop-count A/B of insertion-based BVH optimization (no TPU).

The 1080p PT frame is ~86% traversal and per-iteration cost is intrinsic
(PERFORMANCE.md round 3) — the remaining honest lever is POPS, i.e. tree
quality. This replays the production wide walk (tools/eval_tree.py) on
camera + bounce fronts against the plain binned-SAH tree and the same tree
after ops/bvh_opt.py reinsertion, and checks closest-t equality (same
triangle set, so best_t must match bit-exactly up to tie order).

Usage: python tools/eval_reinsert.py [--blocks 16] [--scene atrium|sponza]
                                     [--passes 8] [--frac 0.05]
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
from rust_renderer_tpu.models import scenes as scn  # noqa: E402
from rust_renderer_tpu.ops import bvh as bvhmod  # noqa: E402
from eval_tree import make_fronts, walk_block  # noqa: E402


def replay(bvh, fronts, blocks):
    rows = {}
    for label, (o, d) in fronts:
        for mode in (False, True):
            tot_p = tot_l = 0
            for b in range(blocks):
                sl = slice(b * 1024, (b + 1) * 1024)
                p_, l_ = walk_block(bvh, o[sl], d[sl], any_hit=mode)
                tot_p += p_
                tot_l += l_
            rows[(label, "anyhit" if mode else "closest")] = (
                tot_p / blocks, tot_l / blocks)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--scene", default="atrium")
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--frac", type=float, default=0.05)
    args = ap.parse_args()

    import logging
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam_look = [0.0, 0.5, 0.0]
    cam = rt.Camera(cam_eye, cam_look, aspect_ratio=1.0)
    if args.scene == "sponza":
        scn.create_sponza_scale_scene(r, cam)
    else:
        scn.create_scene(r, cam)
    scene = r.pack()
    pos = np.asarray(scene.positions)
    idx = np.asarray(scene.indices)
    print(f"{len(idx)} triangles", flush=True)
    fronts = make_fronts(scene, (cam_eye, cam_look), args.blocks)

    t0 = time.time()
    base = bvhmod.build_bvh(pos, idx, leaf_size=12)
    print(f"base build {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    opt = bvhmod.build_bvh(pos, idx, leaf_size=12,
                           reinsert_passes=args.passes)
    print(f"opt build {time.time() - t0:.1f}s", flush=True)

    # exactness: closest-t identical on a sample block of each front
    for label, (o, d) in fronts:
        _, _, t_a = walk_block(base, o[:1024], d[:1024], return_t=True)
        _, _, t_b = walk_block(opt, o[:1024], d[:1024], return_t=True)
        if not np.array_equal(t_a, t_b):
            bad = int((t_a != t_b).sum())
            print(f"WARNING {label}: {bad}/1024 best_t differ "
                  f"(max rel {np.max(np.abs(t_a - t_b) / np.maximum(t_a, 1e-9)):.2e})")
        else:
            print(f"{label}: best_t bit-equal", flush=True)

    rows_a = replay(base, fronts, args.blocks)
    rows_b = replay(opt, fronts, args.blocks)
    print(f"{'front':16s} {'base pops/leaf':>20s} {'reinsert pops/leaf':>22s} ratio")
    for key in rows_a:
        pa, la = rows_a[key]
        pb, lb = rows_b[key]
        print(f"{key[0]+' '+key[1]:16s} {pa:10.1f}/{la:8.1f} "
              f"{pb:12.1f}/{lb:8.1f}  {pb / pa:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
