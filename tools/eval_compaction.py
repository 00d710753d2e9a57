"""CPU pop-count evaluation of WINDOWED liveness compaction (no TPU).

Late bounce fronts dominate the 1080p PT frame (PERFORMANCE.md round 3:
closest b3-b5 = 1.9 s of the 5.9 s frame at 16-30% live lanes) because a
block walks while ANY of its 1024 lanes is live. GLOBAL active-first
compaction measured a wash on real fronts (bench_fronts round 3): ~6x fewer
live blocks but origins scrambled scene-wide widen each block's union walk
by about the same factor (unions are origin-driven). Hypothesis here:
compacting only WITHIN windows of G adjacent blocks keeps origins local
(bounded union growth) while still zeroing out mostly-dead blocks.

This tool replays the production wide walk in numpy (tools/eval_tree.py)
over a camera->bounce front with spatially clustered live masks and reports
total pops per arrangement: baseline / global compact / windowed G=2..16.
Pops are the cost model: per-iteration cost is intrinsic ~0.87 us
(PERFORMANCE.md), so total pops ~ front wall time (minus the permutation
gathers, which are measured separately on TPU).

Usage: python tools/eval_compaction.py [--blocks 64] [--live 0.4,0.2,0.1]
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


def closest_t(bvh, o, d):
    """Per-lane closest-hit t via the walk replay itself (exact)."""
    best = np.empty(len(o), np.float32)
    for b in range(len(o) // 1024):
        sl = slice(b * 1024, (b + 1) * 1024)
        _, _, bt = walk_block(bvh, o[sl], d[sl], return_t=True)
        best[sl] = bt
    return best


def front_cost(bvh, o, d, any_hit=False):
    """Total pops over all 1024-lane blocks (a fully-dead block costs 1)."""
    nb = len(o) // 1024
    tot = 0
    for b in range(nb):
        sl = slice(b * 1024, (b + 1) * 1024)
        if not np.any(np.abs(d[sl]).sum(1) > 0):
            tot += 1
            continue
        p, _ = walk_block(bvh, o[sl], d[sl], any_hit=any_hit)
        tot += p
    return tot


def partition(o, d, live, window_lanes):
    """Stable-partition live lanes first within each window."""
    o2, d2 = o.copy(), d.copy()
    n = len(o)
    for s in range(0, n, window_lanes):
        sl = slice(s, min(s + window_lanes, n))
        order = np.argsort(~live[sl], kind="stable")
        o2[sl] = o[sl][order]
        d2[sl] = d[sl][order]
    return o2, d2


def morton_codes(o, bits=10):
    """30-bit Morton code of each origin quantized over its own bbox."""
    lo = o.min(0)
    span = np.maximum(o.max(0) - lo, 1e-12)
    q = np.minimum(((o - lo) / span * (1 << bits)).astype(np.uint64),
                   (1 << bits) - 1)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2))


def partition_key(o, d, live, window_lanes, key):
    """Dead-last sort within each window by an arbitrary secondary key
    (live lanes ordered by `key`, dead lanes keep stable order at the
    tail)."""
    o2, d2 = o.copy(), d.copy()
    n = len(o)
    big = np.uint64(1) << np.uint64(62)
    k = np.where(live, key.astype(np.uint64), big)
    for s in range(0, n, window_lanes):
        sl = slice(s, min(s + window_lanes, n))
        order = np.argsort(k[sl], kind="stable")
        o2[sl] = o[sl][order]
        d2[sl] = d[sl][order]
    return o2, d2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--live", default="0.4,0.2,0.1")
    ap.add_argument("--any-hit", action="store_true")
    ap.add_argument("--morton", action="store_true",
                    help="also evaluate origin-Morton sorted arrangements "
                         "(unions are origin-driven; direction sorts all "
                         "failed — this clusters ORIGINS within windows)")
    args = ap.parse_args()

    r = rt.Renderer()
    cam_eye = [-10.28, 2.10, -0.18]
    cam_look = [0.0, 0.5, 0.0]
    cam = rt.Camera(cam_eye, cam_look, aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    pos = np.asarray(scene.positions)
    idx = np.asarray(scene.indices)
    bvh = bvhmod.build_bvh(pos, idx, leaf_size=12)

    # side a multiple of 32 so the image maps to whole 32x32 tile blocks
    # (the production lane layout: traverse_packet_pallas's pack()).
    side = max(32, (int(np.sqrt(args.blocks * 1024)) // 32) * 32)
    n = side * side
    # Camera front in IMAGE ORDER (row-major) — the real lane->pixel layout.
    eye = np.asarray(cam_eye, np.float32)
    look = np.asarray(cam_look, np.float32)
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

    def tilepack(x):
        """Image order -> the production tile-major lane order (32x32
        image tiles -> one 1024-lane block each)."""
        x = x.reshape(side // 32, 32, side // 32, 32, -1)
        return np.ascontiguousarray(
            x.transpose(0, 2, 1, 3, 4)).reshape(n, -1).squeeze()

    print("computing first-hit points (brute, exact)...", flush=True)
    t0 = time.time()
    t_hit = closest_t(bvh, o_cam, dirs)
    hit = t_hit < 0.99e4  # walk caps best_t at t_max=1e4 on miss
    print(f"  {time.time() - t0:.1f}s; hit fraction {hit.mean():.2f}",
          flush=True)
    orig = o_cam + np.minimum(t_hit, 1e3)[:, None] * dirs

    rng = np.random.default_rng(7)
    d_b = rng.normal(size=(n, 3)).astype(np.float32)
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)

    # Spatially clustered extra deaths: smooth noise over the image grid
    # thresholded to the target live fraction (mimics paths that escaped).
    base_noise = rng.normal(size=(side, side))
    k = 15
    ker = np.ones(k) / k
    sm = np.apply_along_axis(lambda m: np.convolve(m, ker, mode="same"), 0,
                             base_noise)
    sm = np.apply_along_axis(lambda m: np.convolve(m, ker, mode="same"), 1,
                             sm).reshape(-1)
    sm = np.concatenate([sm, sm[: n - len(sm)]])[:n]

    n_blocks = n // 1024
    for frac in [float(x) for x in args.live.split(",")]:
        thr = np.quantile(sm[hit], frac) if frac < 1 else sm.max() + 1
        live = hit & (sm < thr)
        lf = live.mean()
        # move everything into the production tile-major lane order; blocks
        # are then consecutive 1024-lane runs and windows adjacent tiles
        o = tilepack(orig.copy())
        d = tilepack(np.where(live[:, None], d_b, 0.0).astype(np.float32))
        live = tilepack(live[:, None].copy()).astype(bool)
        rows = []
        base = front_cost(bvh, o, d, args.any_hit)
        rows.append(("baseline", base))
        og, dg = partition(o, d, live, n)
        rows.append(("global", front_cost(bvh, og, dg, args.any_hit)))
        for g in (2, 4, 8, 16):
            ow, dw = partition(o, d, live, g * 1024)
            rows.append((f"win{g}", front_cost(bvh, ow, dw, args.any_hit)))
        if args.morton:
            mc = morton_codes(o)
            # direction octant folded into the low bits as a tiebreak
            octant = ((d[:, 0] < 0).astype(np.uint64)
                      | ((d[:, 1] < 0).astype(np.uint64) << np.uint64(1))
                      | ((d[:, 2] < 0).astype(np.uint64) << np.uint64(2)))
            mo = (mc << np.uint64(3)) | octant
            for g in (4, 8, 16):
                ow, dw = partition_key(o, d, live, g * 1024, mc)
                rows.append((f"win{g}m",
                             front_cost(bvh, ow, dw, args.any_hit)))
            for g in (8, 16):
                ow, dw = partition_key(o, d, live, g * 1024, mo)
                rows.append((f"win{g}mo",
                             front_cost(bvh, ow, dw, args.any_hit)))
            ow, dw = partition_key(o, d, live, n, mc)
            rows.append(("globalm", front_cost(bvh, ow, dw, args.any_hit)))
        print(f"== live {lf * 100:.0f}% ({int(live.sum())} lanes, "
              f"{n_blocks} blocks) ==", flush=True)
        for name, c in rows:
            print(f"  {name:9s} total pops {c:8d}  ({c / base:5.2f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
