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

    # diagnostic: biggest node box of the raw binary tree (the internal-SA
    # sums printed by the optimizer looked ~1e78 — find the culprit)
    from rust_renderer_tpu import native
    raw = native.build_bvh_sah(pos, idx.astype(np.int32), 12)
    if raw is not None:
        nm, nx = raw[0], raw[1]
        d = np.maximum(nx - nm, 0.0)
        areas = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        top = np.argsort(-areas)[:3]
        for i in top:
            print(f"  big node {i}: area {areas[i]:.3g} lo {nm[i]} hi {nx[i]}")

    import functools
    builders = {
        "base": functools.partial(bvhmod.build_bvh, pos, idx, leaf_size=12),
        "base+area": functools.partial(
            bvhmod.build_bvh, pos, idx, leaf_size=12, reinsert_passes=0,
            reinsert_child_order="area"),
        "opt": functools.partial(
            bvhmod.build_bvh, pos, idx, leaf_size=12,
            reinsert_passes=args.passes),
        "opt+area": functools.partial(
            bvhmod.build_bvh, pos, idx, leaf_size=12,
            reinsert_passes=args.passes, reinsert_child_order="area"),
    }
    trees = {}
    for name, fn in builders.items():
        t0 = time.time()
        trees[name] = fn()
        print(f"{name} build {time.time() - t0:.1f}s", flush=True)

    base = trees["base"]
    for name, tree in trees.items():
        if name == "base":
            continue
        for label, (o, d) in fronts:
            _, _, t_a = walk_block(base, o[:1024], d[:1024], return_t=True)
            _, _, t_b = walk_block(tree, o[:1024], d[:1024], return_t=True)
            if not np.array_equal(t_a, t_b):
                bad = int((t_a != t_b).sum())
                print(f"WARNING {name}/{label}: {bad}/1024 best_t differ")

    rows = {name: replay(tree, fronts, args.blocks)
            for name, tree in trees.items()}
    names = list(trees)
    print(f"{'front':16s} " + " ".join(f"{v:>16s}" for v in names))
    for key in rows["base"]:
        line = f"{key[0]+' '+key[1]:16s} "
        pa = rows["base"][key][0]
        for v in names:
            p_, l_ = rows[v][key]
            line += f" {p_:7.1f} ({p_/pa:4.2f}x)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
