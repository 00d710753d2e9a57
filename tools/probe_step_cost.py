"""Bisect the ~45us/grid-step FIXED cost of the traversal kernels.

Round-2 forensics (PERFORMANCE.md): `nopush` (walk dies at root, 256 blocks)
still costs 12.6 ms => ~49 us/step with ~zero walk work; the cause was never
isolated (not I/O block count, not row stride). At 1080p this fixed cost is
~1 s/frame across the ~11 traversal launches, so it is worth one more
methodical bisect. Variants, all on the SAME grid/blockspec layout as the
production kernel (b blocks of (8,128), node+leaf tables as inputs):

  empty     kernel writes constants, reads nothing
  readrow   + one scalar node-row fetch, no loop
  state     + full loop state materialized (init vregs), no loop
  while1    + while loop that runs exactly ONE production-shaped iteration
  whileN    + while loop forced to N iterations (chase via miss pointers)
  nopush    the production body, children never pushed (as round 2)

Per-variant: total ms and us/grid-step at several block counts (grid scaling
separates per-step from per-launch cost).
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
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W
from rust_renderer_tpu.settings import RenderSettings


def make_kernel(leaf_size, variant, n_iters=0):
    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, stack_ref):
        if variant == "empty":
            t_out[0] = jnp.full((8, 128), 3.0e38, jnp.float32)
            prim_out[0] = jnp.full((8, 128), -1, jnp.int32)
            u_out[0] = jnp.zeros((8, 128), jnp.float32)
            v_out[0] = jnp.zeros((8, 128), jnp.float32)
            return

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
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        if variant == "readrow":
            row = node_ref[0]
            t_out[0] = jnp.full((8, 128), row[0], jnp.float32)
            prim_out[0] = jnp.full((8, 128), -1, jnp.int32)
            u_out[0] = ix
            v_out[0] = iy
            return

        init = (
            jnp.int32(0),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
        )

        if variant == "state":
            cur, best_t, best_prim, best_u, best_v, done, _ = init
            t_out[0] = best_t + ix
            prim_out[0] = best_prim
            u_out[0] = best_u + iy
            v_out[0] = best_v + iz
            return

        def body(state):
            cur, best_t, best_prim, best_u, best_v, done, it = state
            row = node_ref[jnp.maximum(cur, 0)]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            not_done = done == 0
            packed = jnp.zeros((8, 128), jnp.int32)
            children = []
            for c in range(W):
                tx0 = (row[c] - ox) * ix
                ty0 = (row[W + c] - oy) * iy
                tz0 = (row[2 * W + c] - oz) * iz
                tx1 = (row[3 * W + c] - ox) * ix
                ty1 = (row[4 * W + c] - oy) * iy
                tz1 = (row[5 * W + c] - oz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1))
                hit = ((tfar >= jnp.maximum(tnear, t_min))
                       & (tnear <= best_t) & not_done)
                packed = packed | (hit.astype(jnp.int32) << c)
                children.append(row_i[6 * W + c])
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            mask = packed[0, 0]
            # Chase: next node from the first child ref if it is an internal
            # node, else stop (nopush) or wrap to keep iterating (whileN).
            if variant == "whileN":
                nxt = jnp.where(it + 1 >= n_iters, -1,
                                (cur + 1) % max(node_ref.shape[0] // 2, 1))
            else:  # nopush
                nxt = jnp.int32(-1)
            best_u = best_u + jnp.float32(mask)  # consume mask
            return (nxt, best_t, best_prim, best_u, best_v, done, it + 1)

        def cond(state):
            return state[0] >= 0

        cur, best_t, best_prim, best_u, best_v, done, it = jax.lax.while_loop(
            cond, body, init)
        t_out[0] = best_t
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


@functools.partial(jax.jit, static_argnames=("leaf_size", "variant",
                                             "n_iters", "stack_size"))
def run(node, leaf, o, d, tlim, leaf_size, variant, n_iters, stack_size):
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
        scratch_shapes=[pltpu.SMEM((stack_size,), jnp.int32)],
    )
    return pl.pallas_call(make_kernel(leaf_size, variant, n_iters),
                          out_shape=out_shape, grid_spec=grid_spec)(
        node, leaf, o, d, tlim)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="empty,readrow,state,while1,while16,nopush")
    ap.add_argument("--blocks", default="64,256,1024")
    args = ap.parse_args()

    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    ls = bvh.leaf_tris.shape[1]
    leaf = bvh.leaf_packed
    if leaf.shape[1] < 128:
        leaf = jnp.pad(leaf, ((0, 0), (0, 128 - leaf.shape[1])))
    stack_size = max((W - 1) * int(bvh.wide_depth) + 2 * W, 128)

    rng = np.random.default_rng(0)
    bmax = max(int(v) for v in args.blocks.split(","))
    o = jnp.asarray(rng.uniform(-5, 5, (bmax, 3, 8, 128)).astype(np.float32))
    dd = rng.normal(size=(bmax, 3, 8, 128)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    d = jnp.asarray(dd)
    tlim = jnp.stack([jnp.full((bmax, 8, 128), 1e-3),
                      jnp.full((bmax, 8, 128), 1e4)], axis=1)

    print(f"node table {bvh.wnode_packed.shape} leaf {leaf.shape}")
    for variant in args.variants.split(","):
        v = variant
        n_iters = 0
        if v.startswith("while") and v != "while1":
            n_iters = int(v[5:])
            v = "whileN"
        elif v == "while1":
            v, n_iters = "whileN", 1
        for nb in (int(x) for x in args.blocks.split(",")):
            f = lambda: run(bvh.wnode_packed, leaf, o[:nb], d[:nb],
                            tlim[:nb], ls, v, n_iters, stack_size)
            out = f()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = f()
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"{variant:10s} blocks={nb:5d}  {ms:8.3f} ms   "
                  f"{ms * 1000 / nb:7.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
