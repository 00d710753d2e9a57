"""CPU economics simulator for the leaf-queue traversal variants.

The leaf slot loop dominates the frame (PERFORMANCE.md round 3: leaf pops
are 56-69% of all pops, ~39 VPU ops x slots each), and the lq kernel's
flush tests a FIXED W=16 rows per trigger regardless of how many are queued
(`valid` only masks the result writes, not the vector work). Whether lq
wins therefore depends on flush FULLNESS — this tool replays the exact
walk with queue semantics in numpy and reports, per variant:

  iters       while-loop trips (straight-line body executions)
  int_pops    internal expands (16 slab tests + 1 extract each)
  rows        leaf rows actually tested (deferral inflates this vs prod
              for closest: best_t tightens later -> more pushes survive)
  row_slots   leaf-row vector work actually PAID (flushes x 16 for lq;
              iters x D for sd) — the waste metric
  flushes     cond branch contexts paid (lq only)
  max_q       peak queue depth (SMEM sizing for sd)

Variants: prod (leaf refs on the stack, one cond per pop), lqK (queue,
flush at qn>=K taking min(qn,16)), sdD (steady drain: every iteration
drains min(qn,D) rows with NO cond — body is fully straight-line).

Usage: python tools/eval_lq.py [--blocks 16] [--leaf 12]
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
from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W  # noqa: E402
from tools.eval_tree import make_fronts  # noqa: E402


def walk_queued(bvh, o, d, any_hit, flush_k=None, drain=None, pops=1,
                natural=False, t_max=1e4, t_min=1e-3, return_state=False):
    """Replay of the wide walk with leaf-queue semantics. Exactly one of
    flush_k (lq) / drain (sd) set; both None = prod (leaf refs on stack).
    pops>1 (sd only) expands that many internal nodes per iteration (the
    dual-pop trick: they share the one vector->scalar extract), with the
    second node's children pushed first so DFS order is preserved."""
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
    best_t = np.full(len(o), np.float32(3.0e38), np.float32)
    if np.ndim(t_max):
        best_t = np.minimum(best_t, t_max)
    else:
        best_t = np.minimum(best_t, np.float32(t_max))
    done = degenerate.copy()

    def test_row(li):
        nonlocal best_t, done
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

    def expand(ref):
        """Slab-test ref's children vs current best_t; return (internal
        child refs to push, leaf row indices to queue), in slot order."""
        row, row_i = wn[ref], wn_i[ref]
        not_done = ~done
        push_int, push_leaf = [], []
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
                if child < 0:
                    push_leaf.append(-2 - child)
                else:
                    push_int.append(child)
        return push_int, push_leaf

    c = dict(iters=0, int_pops=0, rows=0, row_slots=0, flushes=0, max_q=0,
             kill_iter=0)

    if flush_k is None and drain is None:  # prod replay
        stack = [0]
        while stack:
            c["iters"] += 1
            ref = stack.pop()
            if ref < 0:
                c["rows"] += 1
                c["row_slots"] += 1
                test_row(-2 - ref)
                if any_hit and done.all():
                    break
                continue
            c["int_pops"] += 1
            push_int, push_leaf = expand(ref)
            # kernel pushes in slot order regardless of kind
            row_i = wn_i[ref]
            for ch in range(W):
                child = row_i[6 * W + ch]
                if child == WIDE_EMPTY:
                    continue
                if child < 0 and (-2 - child) in push_leaf:
                    stack.append(child)
                elif child >= 0 and child in push_int:
                    stack.append(child)
        return (c, best_t, done) if return_state else c

    stack, queue = [0], []
    while stack or queue:
        c["iters"] += 1
        # Pop up to `pops` refs FIRST (they share one extract), then expand;
        # push deeper-node children LAST so DFS order survives (mirrors the
        # dual kernel's push order).
        refs = [stack.pop() for _ in range(min(pops, len(stack)))]
        for ref in reversed(refs):
            c["int_pops"] += 1
            push_int, push_leaf = expand(ref)
            queue.extend(push_leaf)
            stack.extend(push_int)
        c["max_q"] = max(c["max_q"], len(queue))
        if drain is not None:
            take = min(len(queue), drain)
            c["row_slots"] += drain
            for _ in range(take):
                test_row(queue.pop())
                c["rows"] += 1
            if any_hit and take and done.all():
                if not natural:
                    break
                # natural termination (no alive extract): expands push
                # nothing once every lane is done, so the walk drains the
                # remaining stack/queue with masked work — count it
                if c.get("kill_iter", 0) == 0:
                    c["kill_iter"] = c["iters"]
        else:
            if len(queue) >= flush_k or (not stack and queue):
                take = min(len(queue), W)
                c["flushes"] += 1
                c["row_slots"] += W
                for _ in range(take):
                    test_row(queue.pop())
                    c["rows"] += 1
                if any_hit and done.all():
                    break
    return (c, best_t, done) if return_state else c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument("--leaf", type=int, default=12)
    ap.add_argument("--scene", default="default",
                    choices=["default", "sponza"])
    ap.add_argument("--variants",
                    default="prod,lq4,lq8,lq12,sd1,sd2,sd3")
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
    fronts = make_fronts(scene, (cam_eye, cam_look), args.blocks)
    variants = args.variants.split(",")

    print(f"leaf_size={args.leaf}  blocks={args.blocks}  "
          f"(all counts per block)")
    for label, (o, d) in fronts:
        for any_hit in (False, True):
            tag = "anyhit" if any_hit else "closest"
            print(f"-- {label} {tag} --")
            for v in variants:
                kw = {}
                vv, natural = (v[:-1], True) if v.endswith("n") else (v, False)
                if vv.startswith("lq"):
                    kw = dict(flush_k=int(vv[2:]))
                elif vv.startswith("sdd"):
                    kw = dict(drain=int(vv[3:]), pops=2, natural=natural)
                elif vv.startswith("sd"):
                    kw = dict(drain=int(vv[2:]), natural=natural)
                tot = None
                for b in range(args.blocks):
                    sl = slice(b * 1024, (b + 1) * 1024)
                    cc = walk_queued(bvh, o[sl], d[sl], any_hit, **kw)
                    tot = cc if tot is None else {
                        k: tot[k] + cc[k] for k in cc}
                nb = args.blocks
                kill = (f"  kill {tot['kill_iter']/nb:6.1f}"
                        if tot.get("kill_iter") else "")
                print(f"  {v:6s} iters {tot['iters']/nb:7.1f}  "
                      f"int {tot['int_pops']/nb:6.1f}  "
                      f"rows {tot['rows']/nb:6.1f}  "
                      f"slots {tot['row_slots']/nb:7.1f}  "
                      f"flush {tot['flushes']/nb:6.1f}  "
                      f"maxq {tot['max_q']/nb:5.1f}{kill}", flush=True)


if __name__ == "__main__":
    main()
