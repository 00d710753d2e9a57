"""Probe: can the MXU beat the VPU on the leaf slot loop?

The leaf row test dominates the walk (PERFORMANCE.md round 3: leaf rows cost
~2x the per-iteration fixed cost; ~50 vector ops x 12 slots per row). All 12
slots' Moller-Trumbore numerators are LINEAR in per-lane quantities once the
scalar triple products are regrouped:

  det = d . (e2 x e1)
  u*det = w . e2 - d . (e2 x v0)      with w = o x d   (per lane, per WALK)
  v*det = -w . e1 - d . (v0 x e1)
  t*det = o . n - v0 . n              with n = e1 x e2

so one f32 matmul  Gt(60,10) @ Xt(10,1024)  yields det / u_n / v_n / t_n / id
for every slot at once; the epilogue is sign tests + one division + a slot
reduction. This probe measures per-row cost inside a production-shaped while
loop (scalar dynamic row fetch per iteration, LCG index chase so nothing is
loop-invariant), with an empty-row control and ITERATION-COUNT SLOPE per the
round-3 measurement rules (launch costs 7-12 ms flat; never read a single
timing).

Variants:
  ctrl      row fetch + trivial consume (loop + fetch overhead floor)
  mt        production closest-hit leaf test (_leaf_tests_from_row)
  mtany     production any-hit leaf test
  mxu       matmul leaf test, flat-row fetch + reshape to (64,10)
  mxuany    matmul any-hit (epilogue = OR-reduce only)
  mxufix    matmul with a loop-CARRIED but fetch-free G (isolates fetch+reshape)

--check compares mt vs mxu hit results on shared random geometry (and both
vs float64 numpy) instead of timing.

Usage: python tools/probe_mxu_leaf.py [--blocks 256] [--iters 16,80]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rust_renderer_tpu.ops.pallas.traversal import _leaf_tests_from_row

LEAF = 12
KDIM = 10          # [o(3), d(3), w=o x d(3), 1]
KPAD = 16          # K padded to a sublane tile
QROWS = 5 * LEAF   # det, u_n, v_n, t_n, id  -> 60
GROWS = 64         # padded output count for the stored Gt rows


def make_g_table(v0, e1, e2, tri_id):
    """(R, LEAF, 3) triangle data -> (R, GROWS, KDIM) Gt tables."""
    n = np.cross(e1, e2)
    k1 = np.cross(e2, v0)
    k2 = np.cross(v0, e1)
    k3 = np.einsum("rsk,rsk->rs", v0, n)
    R = v0.shape[0]
    g = np.zeros((R, GROWS, KDIM), np.float32)
    # det rows [0:12): d-block = e2 x e1 = -n
    g[:, 0:LEAF, 3:6] = -n
    # u rows [12:24): w-block = e2, d-block = -(e2 x v0)
    g[:, LEAF:2 * LEAF, 6:9] = e2
    g[:, LEAF:2 * LEAF, 3:6] = -k1
    # v rows [24:36): w-block = -e1, d-block = -(v0 x e1)
    g[:, 2 * LEAF:3 * LEAF, 6:9] = -e1
    g[:, 2 * LEAF:3 * LEAF, 3:6] = -k2
    # t rows [36:48): o-block = n, const = -v0.n
    g[:, 3 * LEAF:4 * LEAF, 0:3] = n
    g[:, 3 * LEAF:4 * LEAF, 9] = -k3
    # id rows [48:60): const = tri_id (f32-exact below 2^24)
    g[:, 4 * LEAF:5 * LEAF, 9] = tri_id.astype(np.float32)
    return g


def to_flat(x):
    """(8,128) -> (1,1024). Mosaic supports neither the reshape nor concat
    of slices with mismatched offsets, so each sublane is rolled to offset 0
    before the lane concat."""
    rows = [(pltpu.roll(x, 8 - s, axis=0) if s else x)[0:1] for s in range(8)]
    return jnp.concatenate(rows, axis=1)


def from_flat(y):
    """(1,1024) -> (8,128), inverse of to_flat."""
    parts = [(pltpu.roll(y, 128 * (8 - s), axis=1) if s else y)[:, 0:128]
             for s in range(8)]
    return jnp.concatenate(parts, axis=0)


def mxu_epilogue(y, t_min, best_t_flat, alive_flat, any_hit, precision):
    """y: (GROWS, 1024) matmul output. Returns per-quantity winners in
    (1,1024)-flat form (closest) or the hit mask (any_hit)."""
    det = y[0:LEAF]
    u_n = y[LEAF:2 * LEAF]
    v_n = y[2 * LEAF:3 * LEAF]
    t_n = y[3 * LEAF:4 * LEAF]
    ids = y[4 * LEAF:5 * LEAF]
    det_pos = det >= 0.0
    det_ok = jnp.abs(det) > 1e-12
    u_ok = (u_n >= 0.0) == det_pos
    v_ok = (v_n >= 0.0) == det_pos
    uv_ok = ((u_n + v_n - det) <= 0.0) == det_pos
    inv = 1.0 / det
    t = t_n * inv
    ok = (
        det_ok & u_ok & v_ok & uv_ok
        & (t > t_min) & (t < best_t_flat)
        & alive_flat
        & (ids >= 0.0)
    )
    if any_hit:
        return jnp.max(ok.astype(jnp.int32), axis=0, keepdims=True)
    tmask = jnp.where(ok, t, 3.0e38)
    # winner slot per lane: min t, earliest slot keeps ties (match mt merge)
    tw = jnp.min(tmask, axis=0, keepdims=True)
    win = tmask == tw
    slot = jax.lax.broadcasted_iota(jnp.int32, tmask.shape, 0)
    minslot = jnp.min(jnp.where(win, slot, jnp.int32(LEAF)), axis=0,
                      keepdims=True)
    pick = win & (slot == minslot)
    pf = pick.astype(jnp.float32)
    idw = jnp.sum(ids * pf, axis=0, keepdims=True)
    uw = jnp.sum(u_n * inv * pf, axis=0, keepdims=True)
    vw = jnp.sum(v_n * inv * pf, axis=0, keepdims=True)
    return tw, idw, uw, vw


def make_kernel(variant, n_iters, n_rows, precision):
    matmul = variant.startswith("mxu")
    any_hit = variant.endswith("any")

    def kernel(tab_ref, o_ref, d_ref, t_out, prim_out, u_out, v_out):
        ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
        dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
        t_min = jnp.float32(1e-3)
        if matmul:
            wx = oy * dz - oz * dy
            wy = oz * dx - ox * dz
            wz = ox * dy - oy * dx
            one = jnp.ones((8, 128), jnp.float32)
            zero = jnp.zeros((8, 128), jnp.float32)
            xt = jnp.concatenate(
                [to_flat(c)
                 for c in (ox, oy, oz, dx, dy, dz, wx, wy, wz, one,
                           zero, zero, zero, zero, zero, zero)], axis=0)
        if variant == "mxufix":
            # loop-invariant G: fetch hoisted by construction, so the slope
            # isolates matmul + epilogue
            g_fix = tab_ref[0]

        def body(state):
            it, idx, best_t, best_prim, best_u, best_v, done = state
            g = None
            if variant == "mxufix":
                g = g_fix
                row = None
            elif matmul:
                g = tab_ref[idx]
            else:
                row = tab_ref[idx]
            if variant == "ctrl":
                best_u = best_u + row[0]
            elif matmul:
                if g.shape == (GROWS, KPAD):   # mxuB: plain (64,16)@(16,1024)
                    y = jax.lax.dot_general(
                        g, xt, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                else:                          # mxuA: contract dim0 x dim0
                    y = jax.lax.dot_general(
                        g, xt, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                bt_flat = to_flat(best_t)
                alive = to_flat(done) == 0
                if any_hit:
                    hit = mxu_epilogue(y, t_min, bt_flat, alive, True,
                                       precision)
                    done = jnp.maximum(done, from_flat(hit))
                else:
                    tw, idw, uw, vw = mxu_epilogue(
                        y, t_min, bt_flat, alive, False, precision)
                    twb = from_flat(tw)
                    improved = twb < best_t
                    best_t = jnp.where(improved, twb, best_t)
                    best_prim = jnp.where(
                        improved,
                        from_flat((idw + 0.5).astype(jnp.int32)), best_prim)
                    best_u = jnp.where(improved, from_flat(uw), best_u)
                    best_v = jnp.where(improved, from_flat(vw), best_v)
            else:
                args = (best_t, best_prim, best_u, best_v, done)
                args = _leaf_tests_from_row(
                    row, LEAF, any_hit, ox, oy, oz, dx, dy, dz, t_min, args)
                best_t, best_prim, best_u, best_v, done = args
            idx = (idx * 1664525 + 1013904223) % n_rows
            return (it + 1, idx, best_t, best_prim, best_u, best_v, done)

        state = (
            jnp.int32(0), jnp.int32(0),
            jnp.full((8, 128), 3.0e38, jnp.float32),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.int32),
        )
        state = jax.lax.while_loop(lambda s: s[0] < n_iters, body, state)
        _, _, best_t, best_prim, best_u, best_v, done = state
        t_out[0] = best_t
        prim_out[0] = best_prim + done
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def run(tab, o, d, variant, n_iters, precision):
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), in_block(3),
                  in_block(3)],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
    )
    return pl.pallas_call(
        make_kernel(variant, n_iters, tab.shape[0], precision),
        out_shape=out_shape, grid_spec=grid_spec)(tab, o, d)


def build_tables(n_rows, rng):
    """Random triangle soup in [-5,5]^3, all table formats."""
    v0 = rng.uniform(-5, 5, (n_rows, LEAF, 3)).astype(np.float32)
    e1 = rng.normal(0, 1.5, (n_rows, LEAF, 3)).astype(np.float32)
    e2 = rng.normal(0, 1.5, (n_rows, LEAF, 3)).astype(np.float32)
    ids = np.arange(n_rows * LEAF, dtype=np.int32).reshape(n_rows, LEAF)
    # mt layout: [v0 e1 e2] x 12 slots then 12 int ids, padded to 128
    mt = np.zeros((n_rows, 128), np.float32)
    tri = np.concatenate([v0, e1, e2], axis=2).reshape(n_rows, LEAF * 9)
    mt[:, :LEAF * 9] = tri
    mt[:, LEAF * 9:LEAF * 10] = ids.view(np.float32)
    g = make_g_table(v0, e1, e2, ids)            # (R, GROWS, KDIM)
    gb = np.zeros((n_rows, GROWS, KPAD), np.float32)
    gb[:, :, :KDIM] = g                          # mxuB: (64, 16) per row
    ga = np.ascontiguousarray(gb.transpose(0, 2, 1))  # mxuA: (16, 64) per row
    return jnp.asarray(mt), jnp.asarray(ga), jnp.asarray(gb), (v0, e1, e2, ids)


def check(tab_mt, tab_g, o, d, precision):
    t1, p1, u1, v1 = [np.asarray(x)[0] for x in run(
        tab_mt, o, d, "mt", 64, precision)]
    t2, p2, u2, v2 = [np.asarray(x)[0] for x in run(
        tab_g, o, d, "mxuA", 64, precision)]
    hit1, hit2 = p1 >= 0, p2 >= 0
    agree = hit1 == hit2
    both = hit1 & hit2
    print(f"hit agreement: {agree.mean() * 100:.3f}%  "
          f"(hit rate mt {hit1.mean() * 100:.1f}%)")
    if both.any():
        rt = np.abs(t1[both] - t2[both]) / np.maximum(np.abs(t1[both]), 1e-6)
        same_prim = (p1[both] == p2[both]).mean()
        print(f"same prim: {same_prim * 100:.3f}%  t rel err max {rt.max():.2e}"
              f" mean {rt.mean():.2e}")
        ru = np.abs(u1[both] - u2[both]).max()
        rv = np.abs(v1[both] - v2[both]).max()
        print(f"u abs err max {ru:.2e}  v abs err max {rv:.2e}")
    a1, a2 = [np.asarray(run(t, o, d, v, 64, precision)[1])[0]
              for t, v in ((tab_mt, "mtany"), (tab_g, "mxuAany"))]
    # mt reports an occluded lane as prim 0 + done 1; mxu leaves prim -1 and
    # sets done — compare occlusion verdicts, not encodings
    print(f"anyhit agreement: {((a1 >= 0) == (a2 >= 0)).mean() * 100:.3f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=256)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--iters", default="16,80")
    ap.add_argument("--variants",
                    default="ctrl,mt,mtany,mxuA,mxuAany,mxuB,mxuBany,mxufix")
    ap.add_argument("--precision", default="default",
                    choices=["default", "high", "highest"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    precision = {"default": jax.lax.Precision.DEFAULT,
                 "high": jax.lax.Precision.HIGH,
                 "highest": jax.lax.Precision.HIGHEST}[args.precision]

    rng = np.random.default_rng(0)
    tab_mt, tab_ga, tab_gb, _ = build_tables(args.rows, rng)
    b = args.blocks
    o = jnp.asarray(rng.uniform(-5, 5, (b, 3, 8, 128)).astype(np.float32))
    dd = rng.normal(size=(b, 3, 8, 128)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = jnp.asarray(dd)

    if args.check:
        check(tab_mt, tab_ga, o[:1], d[:1], precision)
        return

    iters = [int(x) for x in args.iters.split(",")]
    print(f"blocks={b} rows={args.rows} iters={iters} "
          f"precision={args.precision}")
    for variant in args.variants.split(","):
        if variant in ("ctrl", "mt", "mtany"):
            tab = tab_mt
        elif variant.startswith("mxuB"):
            tab = tab_gb
        else:
            tab = tab_ga
        times = []
        for n in iters:
            # fold outputs to one scalar on device; the timed readback is 4
            # bytes (block_until_ready measured NOT blocking for pallas
            # outputs under the axon tunnel — flat 0.05ms at any iter count)
            f = jax.jit(lambda tab, o, d, n=n, v=variant: sum(
                jnp.sum(x.astype(jnp.float32)) for x in run(
                    tab, o, d, v, n, precision)))
            float(f(tab, o, d))
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                s = float(f(tab, o, d))
            times.append((time.perf_counter() - t0) / reps * 1000)
        slope_ns = ((times[-1] - times[0])
                    / (iters[-1] - iters[0]) / b * 1e6)
        detail = " ".join(f"{t:8.2f}ms@{n}" for t, n in zip(times, iters))
        print(f"{variant:8s} {detail}   per-row {slope_ns:8.1f} ns",
              flush=True)


if __name__ == "__main__":
    main()
