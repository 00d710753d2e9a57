"""CPU pop-count evaluation of OCCLUDER SEEDING for any-hit queries.

Discovery (round 3, post-stall): the FLT_MAX gizmo sphere used to poison 13
BVH nodes with infinite boxes, forcing every packet down a chain to a MIXED
leaf of camera-area wall triangles — an ACCIDENTAL occluder cache that made
camera any-hit queries terminate in 6.4 pops/block (clean tree: 121.8).
Filtering the far triangles (ops/bvh.py) is correct hygiene, but the
accident points at a real mechanism: test each occlusion ray against K
likely-occluder leaf rows BEFORE traversal; already-occluded lanes get zero
directions (retire at the degenerate-ray guard, and windowed compaction
drops them), so only genuinely-hard rays walk the tree. Exact — occlusion
is boolean, extra tests can only find occluders earlier.

This replays the production walk with seed pre-tests of the top-K
total-triangle-area leaf rows and reports pops + seed kill fraction.

Usage: python tools/eval_seed.py [--blocks 16] [--ks 0,4,8,16,32]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import rust_renderer_tpu as rt  # noqa: E402
from rust_renderer_tpu.models import scenes as scn  # noqa: E402
from rust_renderer_tpu.ops import bvh as bvhmod  # noqa: E402
from eval_tree import make_fronts, walk_block  # noqa: E402


def rows_by_area(bvh, k):
    v0 = np.asarray(bvh.leaf_v0)
    e1 = np.asarray(bvh.leaf_e1)
    e2 = np.asarray(bvh.leaf_e2)
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum(axis=1)
    return np.argsort(-area)[:k]


def seed_occluded(bvh, rows, o, d, t_min=1e-3, t_max=1e4):
    """Vectorized Moller-Trumbore of every ray against the seed rows."""
    v0 = np.asarray(bvh.leaf_v0)[rows].reshape(-1, 3)  # (K*LS, 3)
    e1 = np.asarray(bvh.leaf_e1)[rows].reshape(-1, 3)
    e2 = np.asarray(bvh.leaf_e2)[rows].reshape(-1, 3)
    tid = np.asarray(bvh.leaf_tris)[rows].reshape(-1)
    keep = tid >= 0
    v0, e1, e2 = v0[keep], e1[keep], e2[keep]
    occ = np.zeros(len(o), bool)
    live = np.abs(d).sum(1) > 0
    # chunk triangles to bound memory
    for s in range(0, len(v0), 64):
        a, b, c = v0[s:s + 64], e1[s:s + 64], e2[s:s + 64]
        p = np.cross(d[:, None, :], c[None])          # (N, T, 3)
        det = np.einsum("ntk,tk->nt", p, b)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o[:, None, :] - a[None]
        u = np.einsum("ntk,ntk->nt", tv, p) * inv
        q = np.cross(tv, b[None])
        v = np.einsum("ntk,nk->nt", q, d) * inv
        t = np.einsum("ntk,tk->nt", q, c) * inv
        hit = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
               & (t > t_min) & (t < t_max))
        occ |= hit.any(1)
    return occ & live


def seed_closest_t(bvh, rows, o, d, t_min=1e-3, t_max=1e4):
    """Per-ray min hit t over the seed rows (t_max where none)."""
    v0 = np.asarray(bvh.leaf_v0)[rows].reshape(-1, 3)
    e1 = np.asarray(bvh.leaf_e1)[rows].reshape(-1, 3)
    e2 = np.asarray(bvh.leaf_e2)[rows].reshape(-1, 3)
    tid = np.asarray(bvh.leaf_tris)[rows].reshape(-1)
    keep = tid >= 0
    v0, e1, e2 = v0[keep], e1[keep], e2[keep]
    best = np.full(len(o), t_max, np.float32)
    for s in range(0, len(v0), 64):
        a, b, c = v0[s:s + 64], e1[s:s + 64], e2[s:s + 64]
        p = np.cross(d[:, None, :], c[None])
        det = np.einsum("ntk,tk->nt", p, b)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = o[:, None, :] - a[None]
        u = np.einsum("ntk,ntk->nt", tv, p) * inv
        q = np.cross(tv, b[None])
        v = np.einsum("ntk,nk->nt", q, d) * inv
        t = np.einsum("ntk,tk->nt", q, c) * inv
        hit = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
               & (t > t_min))
        best = np.minimum(best, np.where(hit, t, t_max).min(1))
    return best


def front_cost(bvh, o, d, any_hit=True, t_max=None):
    nb = len(o) // 1024
    tot = 0
    for b in range(nb):
        sl = slice(b * 1024, (b + 1) * 1024)
        if not np.any(np.abs(d[sl]).sum(1) > 0):
            tot += 1
            continue
        tm = 1e4 if t_max is None else t_max[sl]
        p, _ = walk_block(bvh, o[sl], d[sl], t_max=tm, any_hit=any_hit)
        tot += p
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--ks", default="0,4,8,16,32")
    args = ap.parse_args()

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam_look = [0.0, 0.5, 0.0]
    cam = rt.Camera(cam_eye, cam_look, aspect_ratio=1.0)
    scn.create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_bvh(np.asarray(scene.positions),
                           np.asarray(scene.indices), leaf_size=12)
    fronts = make_fronts(scene, (cam_eye, cam_look), args.blocks)

    # sun-like front: bounce origins, one shared up-ish direction
    o_b, _ = fronts[1][1]
    sun = np.asarray([0.3, 0.9, 0.2], np.float32)
    sun /= np.linalg.norm(sun)
    d_sun = np.tile(sun, (len(o_b), 1)).astype(np.float32)
    fronts = fronts + [("sun", (o_b, d_sun))]

    for label, (o, d) in fronts:
        base = front_cost(bvh, o, d)
        line = f"{label:7s} anyhit base {base:8d}"
        for k in [int(x) for x in args.ks.split(",") if int(x)]:
            rows = rows_by_area(bvh, k)
            occ = seed_occluded(bvh, rows, o, d)
            d2 = np.where(occ[:, None], 0.0, d).astype(np.float32)
            c = front_cost(bvh, o, d2)
            line += f" | K={k}: {c / base:4.2f}x kill {occ.mean() * 100:4.1f}%"
        print(line, flush=True)

    # closest-hit priming: clamp t_max with the seed rows' min hit t
    for label, (o, d) in fronts[:2]:
        base = front_cost(bvh, o, d, any_hit=False)
        line = f"{label:7s} closest base {base:7d}"
        for k in [int(x) for x in args.ks.split(",") if int(x)]:
            rows = rows_by_area(bvh, k)
            ts = seed_closest_t(bvh, rows, o, d)
            c = front_cost(bvh, o, d, any_hit=False, t_max=ts)
            primed = (ts < 0.99e4).mean()
            line += f" | K={k}: {c / base:4.2f}x primed {primed * 100:4.1f}%"
        print(line, flush=True)


if __name__ == "__main__":
    main()
