"""CPU pop-count evaluator for BVH tree quality (no TPU needed).

The per-iteration cost of the Pallas wide walk is closed as intrinsic
(PERFORMANCE.md round-3: 0.87 us/iteration), so tree quality — the pop
COUNT — is the remaining traversal lever. This tool replays the production
wide-kernel walk (same pop order, same best_t culling, same leaf tests) in
numpy over 1024-ray packet blocks and reports mean pops / leaf pops per
block for camera-primary and synthetic bounce-like fronts, for any set of
build configurations (baseline vs pre-split trees).

Usage: python tools/eval_tree.py [--blocks 32] [--scene default|sponza]
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
from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W  # noqa: E402


def walk_block(bvh, o, d, t_max=1e4, t_min=1e-3, any_hit=False,
               return_t=False):
    """Replay of _make_kernel_wide's walk for one block: returns
    (pops, leaf_pops) — or (pops, leaf_pops, best_t) with return_t."""
    wn = np.asarray(bvh.wnode_packed)
    wn_i = wn.view(np.int32)
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
    best_t = np.full(len(o), min(3.0e38, 1e38), np.float32)
    best_t = np.minimum(best_t, t_max)
    done = degenerate.copy()

    stack = [0]
    pops = 0
    leaf_pops = 0
    while stack:
        ref = stack.pop()
        pops += 1
        if ref < 0:
            leaf_pops += 1
            li = -2 - ref
            alive = ~done
            for s in range(leaf_tris.shape[1]):
                tri = leaf_tris[li, s]
                if tri < 0:
                    continue
                v0 = leaf_v0[li, s]
                e1 = leaf_e1[li, s]
                e2 = leaf_e2[li, s]
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
            hit = (tfar >= np.maximum(tnear, t_min)) & (tnear <= best_t) & not_done
            if hit.any():
                stack.append(int(child))
    if return_t:
        return pops, leaf_pops, best_t
    return pops, leaf_pops


def make_fronts(scene, cam_view, n_blocks, seed=3):
    """(label, origins, directions) per front: coherent camera primaries and
    divergent bounce-like rays (origins on surfaces, random directions)."""
    rng = np.random.default_rng(seed)
    pos = np.asarray(scene.positions)
    idx = np.asarray(scene.indices)

    n = n_blocks * 1024
    # camera-like: one origin, jittered pinhole directions over a grid
    eye = np.asarray(cam_view[0], np.float32)
    look = np.asarray(cam_view[1], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    side = int(np.sqrt(n))
    uu, vv = np.meshgrid(np.linspace(-0.6, 0.6, side),
                         np.linspace(-0.35, 0.35, side))
    dirs = (fwd[None] + uu.reshape(-1, 1) * right[None]
            + vv.reshape(-1, 1) * up[None])
    dirs = dirs[:n] if len(dirs) >= n else np.tile(dirs, (2, 1))[:n]
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    cam = (np.tile(eye, (n, 1)).astype(np.float32), dirs.astype(np.float32))

    # bounce-like: origins on area-sampled surface points, cosine-ish dirs
    v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    p = area / area.sum()
    t = rng.choice(len(idx), size=n, p=p)
    r1, r2 = rng.random(n), rng.random(n)
    s1 = np.sqrt(r1)
    bary = np.stack([1 - s1, s1 * (1 - r2), s1 * r2], 1).astype(np.float32)
    orig = (bary[:, :1] * v0[t] + bary[:, 1:2] * v1[t] + bary[:, 2:3] * v2[t])
    nrm = np.cross(v1[t] - v0[t], v2[t] - v0[t])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = (d * nrm).sum(1) < 0
    d[flip] -= 2 * (d[flip] * nrm[flip]).sum(1, keepdims=True) * nrm[flip]
    orig = (orig + 1e-3 * nrm).astype(np.float32)
    bounce = (orig, d.astype(np.float32))
    return [("camera", cam), ("bounce", bounce)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--ratios", default="1.0,1.3,1.6")
    args = ap.parse_args()

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam_look = [0.0, 0.5, 0.0]
    cam = rt.Camera(cam_eye, cam_look, aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    pos = np.asarray(scene.positions)
    idx = np.asarray(scene.indices)
    fronts = make_fronts(scene, (cam_eye, cam_look), args.blocks)

    for ratio in [float(x) for x in args.ratios.split(",")]:
        t0 = time.time()
        bvh = bvhmod.build_bvh(pos, idx, leaf_size=12, presplit_ratio=ratio)
        bt = time.time() - t0
        nl = int(np.asarray(bvh.leaf_tris).shape[0])
        nw = int(np.asarray(bvh.wnode_packed).shape[0])
        print(f"== ratio {ratio}: build {bt:.1f}s, {nw} wide nodes, "
              f"{nl} leaf rows ==", flush=True)
        for label, (o, d) in fronts:
            for mode in (False, True):
                tot_p, tot_l = 0, 0
                for b in range(args.blocks):
                    sl = slice(b * 1024, (b + 1) * 1024)
                    p_, l_ = walk_block(bvh, o[sl], d[sl], any_hit=mode)
                    tot_p += p_
                    tot_l += l_
                tag = "anyhit" if mode else "closest"
                print(f"  {label:7s} {tag:8s}: pops/block "
                      f"{tot_p / args.blocks:8.1f}  leaf/block "
                      f"{tot_l / args.blocks:7.1f}", flush=True)


if __name__ == "__main__":
    main()
