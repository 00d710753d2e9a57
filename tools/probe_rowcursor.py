"""Price the per-iteration MECHANICS of row-cursor traversal on real TPU.

tools/eval_rowcursor.py (CPU replay, exact walks) shows per-sublane-row
cursors cut iterations 2-3x on bounce fronts (row8 dual-exp 0.30-0.49x,
row4 dual 0.45-0.62x at Sponza scale) at IDENTICAL vector work per
iteration (slot tests carry a different node per sublane for free). The
open question is the scalar side: G cursors need G node-row gathers
(dynamic slices), G/2..G mask extracts, and Gx16..32 masked push ops per
iteration, where production sdd3 pays 2 broadcasts + ONE extract + 32
pushes. This probe builds forced-N-iteration kernels with the REAL
mechanics (gathers, column-slice slab tests, mask packing, SMEM pushes,
per-cursor drains) but a synthetic ref chase, and reports us/iteration
from the N=16 vs N=1 delta — the go/no-go number for the real kernel.

Variants:
  ctrl   production sdd3 shape: dual scalar-broadcast expand + 3 full-block
         drain rows + 1 extract + 32 bit pushes       (expect ~0.87 us)
  g8s    8 cursors, single expand via (8,128) row gather + 16 column-slice
         slots + 4 extracts + 128 bit pushes + 3 gathered drain slots
  g8d    8 cursors, dual expand: 2 gathers, 32 slots, 8 extracts, 256 pushes
  g8sm   g8s with CWBVH-style mask pushes (per-cursor ~10 scalar ops + 2
         conditional writes) instead of 128 per-bit pushes
  g4d    4 cursors dual expand (duplicated-sublane gathers), 4 extracts,
         128 pushes

Usage: python tools/probe_rowcursor.py [--variants ctrl,g8s,g8d,g8sm,g4d]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_scene
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops.bvh import WIDE_WIDTH as W


def make_kernel(variant, n_iters, n_nodes, n_leaf):
    G = {"ctrl": 1, "g8s": 8, "g8d": 8, "g8sm": 8, "g4d": 4}[variant]
    dual = variant in ("ctrl", "g8d", "g4d")
    mask_push = variant == "g8sm"

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, stack_ref):
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12,
                             jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)

        def slab_scalar(row, c, best_t):
            """Production form: scalar broadcast operands."""
            tx0 = (row[c] - ox) * ix
            ty0 = (row[W + c] - oy) * iy
            tz0 = (row[2 * W + c] - oz) * iz
            tx1 = (row[3 * W + c] - ox) * ix
            ty1 = (row[4 * W + c] - oy) * iy
            tz1 = (row[5 * W + c] - oz) * iz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            return (tfar >= jnp.maximum(tnear, t_min)) & (tnear <= best_t)

        def slab_cols(rows, c, best_t):
            """Row-cursor form: (8,1) column-slice operands per sublane."""
            tx0 = (rows[:, c:c + 1] - ox) * ix
            ty0 = (rows[:, W + c:W + c + 1] - oy) * iy
            tz0 = (rows[:, 2 * W + c:2 * W + c + 1] - oz) * iz
            tx1 = (rows[:, 3 * W + c:3 * W + c + 1] - ox) * ix
            ty1 = (rows[:, 4 * W + c:4 * W + c + 1] - oy) * iy
            tz1 = (rows[:, 5 * W + c:5 * W + c + 1] - oz) * iz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            return (tfar >= jnp.maximum(tnear, t_min)) & (tnear <= best_t)

        def gather_rows(ref, idxs):
            return jnp.concatenate(
                [ref[pl.ds(i, 1)] for i in idxs], axis=0)

        def tri_tests_cols(lrows, best_t):
            """12 MT tests, per-sublane rows via column slices."""
            cands = []
            for s in range(12):
                b = s * 9
                v0x = lrows[:, b:b + 1]
                v0y = lrows[:, b + 1:b + 2]
                v0z = lrows[:, b + 2:b + 3]
                e1x = lrows[:, b + 3:b + 4]
                e1y = lrows[:, b + 4:b + 5]
                e1z = lrows[:, b + 5:b + 6]
                e2x = lrows[:, b + 6:b + 7]
                e2y = lrows[:, b + 7:b + 8]
                e2z = lrows[:, b + 8:b + 9]
                px_ = dy * e2z - dz * e2y
                py_ = dz * e2x - dx * e2z
                pz_ = dx * e2y - dy * e2x
                det = e1x * px_ + e1y * py_ + e1z * pz_
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                      & (u + v <= 1) & (t > t_min) & (t < best_t))
                cands.append(jnp.where(ok, t, 3.0e38))
            while len(cands) > 1:
                cands = [jnp.minimum(cands[i], cands[i + 1])
                         if i + 1 < len(cands) else cands[i]
                         for i in range(0, len(cands), 2)]
            return jnp.minimum(best_t, cands[0])

        def tri_tests_scalar(lrow, best_t):
            """Production form: one row broadcast to the whole block."""
            cands = []
            for s in range(12):
                b = s * 9
                v0x, v0y, v0z = lrow[b], lrow[b + 1], lrow[b + 2]
                e1x, e1y, e1z = lrow[b + 3], lrow[b + 4], lrow[b + 5]
                e2x, e2y, e2z = lrow[b + 6], lrow[b + 7], lrow[b + 8]
                px_ = dy * e2z - dz * e2y
                py_ = dz * e2x - dx * e2z
                pz_ = dx * e2y - dy * e2x
                det = e1x * px_ + e1y * py_ + e1z * pz_
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv
                t = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                      & (u + v <= 1) & (t > t_min) & (t < best_t))
                cands.append(jnp.where(ok, t, 3.0e38))
            while len(cands) > 1:
                cands = [jnp.minimum(cands[i], cands[i + 1])
                         if i + 1 < len(cands) else cands[i]
                         for i in range(0, len(cands), 2)]
            return jnp.minimum(best_t, cands[0])

        half = max(n_nodes // 2, 1)
        lhalf = max(n_leaf // 2, 1)

        def body(state):
            it, best_t, acc = state[0], state[1], state[2]
            refs = list(state[3:])

            if variant == "ctrl":
                ra = refs[0]
                rb = (refs[0] + 1) % half
                packed = jnp.zeros((8, 128), jnp.int32)
                children = []
                for hf, ref in enumerate((ra, rb)):
                    row = node_ref[ref]
                    row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                    for c in range(W):
                        hit = slab_scalar(row, c, best_t)
                        packed = packed | (
                            hit.astype(jnp.int32) << (hf * W + c))
                        children.append(row_i[6 * W + c])
                for s in (1, 2, 4):
                    packed = packed | pltpu.roll(packed, s, axis=0)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    packed = packed | pltpu.roll(packed, s, axis=1)
                word = packed[0, 0]
                sp = jnp.int32(0)
                for c in range(2 * W):
                    bit = (word >> c) & 1

                    @pl.when(bit == 1)
                    def _(child=children[c], at=sp):
                        stack_ref[0, at & 63] = child

                    sp = sp + bit
                acc = acc + word
                # 3 full-block drain rows
                for k in range(3):
                    lrow = leaf_ref[(it * 3 + k) % lhalf]
                    best_t = tri_tests_scalar(lrow, best_t)
                nrefs = [(refs[0] + 2) % half]
            else:
                idx_a = [(refs[g % G] + (g % G)) % half for g in range(8)]
                rows_a = gather_rows(node_ref, idx_a)
                rows_ai = jax.lax.bitcast_convert_type(rows_a, jnp.int32)
                packed = jnp.zeros((8, 128), jnp.int32)
                for c in range(W):
                    hit = slab_cols(rows_a, c, best_t)
                    packed = packed | (hit.astype(jnp.int32) << c)
                tiles = [rows_ai]
                if dual:
                    idx_b = [(i + 1) % half for i in idx_a]
                    rows_b = gather_rows(node_ref, idx_b)
                    rows_bi = jax.lax.bitcast_convert_type(rows_b, jnp.int32)
                    for c in range(W):
                        hit = slab_cols(rows_b, c, best_t)
                        packed = packed | (hit.astype(jnp.int32) << (W + c))
                    tiles.append(rows_bi)
                # per-sublane masks -> lanes: OR along lanes only
                for s in (1, 2, 4, 8, 16, 32, 64):
                    packed = packed | pltpu.roll(packed, s, axis=1)

                words = []
                if G == 8 and dual:
                    # 32 bits per cursor: one extract per sublane
                    for g in range(8):
                        words.append((g, packed[g, 0]))
                else:
                    # 16-bit masks: pair sublanes into one 32-bit word
                    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    hi = jnp.where(rid % 2 == 1, packed << 16, 0)
                    lo = jnp.where(rid % 2 == 0, packed, 0)
                    comb = lo | pltpu.roll(hi, 7, axis=0)
                    for g2 in range(0, 8, 2):
                        words.append((g2, comb[g2, 0]))

                sps = [jnp.int32(0)] * G
                if mask_push:
                    # CWBVH-style: per cursor ~10 scalar ops + 2 cond writes
                    for g, w in words:
                        cg = g if G == 8 else g // 2
                        m16 = w & jnp.int32(0xFFFF)
                        lowbit = m16 & (-m16)
                        rest = m16 ^ lowbit
                        base = rows_ai[g if G == 8 else g, 6 * W]
                        ent = base + lowbit

                        @pl.when(rest != 0)
                        def _(cg=cg, v=ent, at=sps[cg]):
                            stack_ref[cg, at & 63] = v

                        sps[cg] = sps[cg] + (rest != 0).astype(jnp.int32)

                        @pl.when((w >> 16) != 0)
                        def _(cg=cg, v=ent + 1, at=sps[cg]):
                            stack_ref[cg, at & 63] = v

                        sps[cg] = sps[cg] + ((w >> 16) != 0).astype(jnp.int32)
                        acc = acc + w
                else:
                    for g, w in words:
                        nb = 32 if (G == 8 and dual) else 32
                        # decode both 16-bit halves (two cursors for the
                        # paired case, A+B halves for the dual case)
                        for c in range(nb):
                            bit = (w >> c) & 1
                            sub = g if (G == 8 and dual) else g + (c // 16)
                            cg = sub if G == 8 else sub // 2
                            tile = tiles[c // 16 if dual and G == 8 else 0]
                            child = tile[sub, 6 * W + (c % W)]

                            @pl.when(bit == 1)
                            def _(cg=cg, child=child, at=sps[cg]):
                                stack_ref[cg, at & 63] = child

                            sps[cg] = sps[cg] + bit
                        acc = acc + w

                # 3 drain slots, per-cursor gathered leaf rows
                for k in range(3):
                    lidx = [(refs[g % G] * 3 + k + g) % lhalf
                            for g in range(8)]
                    lrows = gather_rows(leaf_ref, lidx)
                    best_t = tri_tests_cols(lrows, best_t)
                nrefs = [(refs[g] + 2 + g) % half for g in range(G)]

            return (it + 1, best_t, acc, *nrefs)

        def cond(state):
            return state[0] < n_iters

        init = (jnp.int32(0),
                jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
                jnp.int32(0)) + tuple(jnp.int32(g) for g in range(G))
        out = jax.lax.while_loop(cond, body, init)
        best_t, acc = out[1], out[2]
        t_out[0] = best_t
        prim_out[0] = jnp.full((8, 128), acc + stack_ref[0, 0], jnp.int32)
        u_out[0] = ix
        v_out[0] = iy

    return kernel


@functools.partial(jax.jit, static_argnames=("variant", "n_iters"))
def run(node, leaf, o, d, tlim, variant, n_iters):
    b = o.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
    ]
    in_block = lambda n: pl.BlockSpec((1, n, 8, 128), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            in_block(3), in_block(3), in_block(2),
        ],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.SMEM((8, 64), jnp.int32)],
    )
    return pl.pallas_call(
        make_kernel(variant, n_iters, node.shape[0], leaf.shape[0]),
        out_shape=out_shape, grid_spec=grid_spec)(node, leaf, o, d, tlim)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="ctrl,g8s,g8d,g8sm,g4d")
    ap.add_argument("--blocks", type=int, default=256)
    args = ap.parse_args()

    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    node = bvh.wnode_packed
    if node.shape[1] % 128:
        node = jnp.pad(node, ((0, 0), (0, 128 - node.shape[1] % 128)))
    leaf = bvh.leaf_packed
    if leaf.shape[1] % 128:
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1] % 128)))

    rng = np.random.default_rng(0)
    nb = args.blocks
    o = jnp.asarray(rng.uniform(-5, 5, (nb, 3, 8, 128)).astype(np.float32))
    dd = rng.normal(size=(nb, 3, 8, 128)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = jnp.asarray(dd)
    tlim = jnp.stack([jnp.full((nb, 8, 128), 1e-3),
                      jnp.full((nb, 8, 128), 1e4)], axis=1)

    print(f"node {node.shape} leaf {leaf.shape} blocks {nb}")
    for variant in args.variants.split(","):
        res = {}
        for n_iters in (1, 16):
            f = lambda: run(node, leaf, o, d, tlim, variant, n_iters)
            jax.block_until_ready(f())
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = f()
            jax.block_until_ready(out)
            res[n_iters] = (time.perf_counter() - t0) / reps * 1000
        per_it = (res[16] - res[1]) / 15 / nb * 1000
        print(f"{variant:6s}  N=1 {res[1]:8.3f} ms  N=16 {res[16]:8.3f} ms"
              f"  -> {per_it:6.3f} us/iter", flush=True)


if __name__ == "__main__":
    main()
