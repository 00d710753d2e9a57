"""Probe Mosaic primitive support + per-op cost for traversal-kernel design.

Questions (PERFORMANCE.md round-2): scalar extraction from a loaded row
appears to dominate the walk (~56 extracts/iteration). Measure:
  P1  N scalar extracts from a (128,)-row load, used in vector math
  P2  (8,128) vector-slice load via pl.ds on the major dim + column slices
  P3  in-kernel reshape (1,128)->(8,16)      (supported?)
  P4  sublane roll-OR tree + single extract  (reduction replacement cost)
Each probe loops K iterations inside one kernel so per-iteration cost is
measurable; a dependency on the loop carry prevents DCE/hoisting.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 2000
N_ROWS = 4096


def run(kernel, n_out=1, name=""):
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(N_ROWS, 128)).astype(np.float32)
    )
    try:
        f = jax.jit(lambda t: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t))
        out = f(table)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(table)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 5 * 1000
        print(f"{name}: {ms:.3f} ms total, {ms / K * 1e6:.1f} ns/iter")
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")


def p1_extracts(n_extract):
    def kernel(t_ref, o_ref):
        def body(i, acc):
            row = t_ref[i % N_ROWS]  # (128,)
            s = jnp.float32(0)
            for c in range(n_extract):
                s = s + row[c]
            return acc + s

        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


def p2_vector_slice():
    def kernel(t_ref, o_ref):
        def body(i, acc):
            base = (i % (N_ROWS // 8)) * 8
            tile = t_ref[pl.ds(base, 8), :]  # (8,128) vector slice
            acc = acc + tile * 0.5
            return acc

        acc = jax.lax.fori_loop(0, K, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc

    return kernel


def p2b_col_broadcast():
    def kernel(t_ref, o_ref):
        def body(i, acc):
            base = (i % (N_ROWS // 8)) * 8
            tile = t_ref[pl.ds(base, 8), :]
            # 6 column slices broadcast over lanes (slab-test shape)
            for c in range(6):
                acc = acc + tile[:, c:c + 1]
            return acc

        acc = jax.lax.fori_loop(0, K, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc

    return kernel


def p3_reshape():
    def kernel(t_ref, o_ref):
        def body(i, acc):
            row = t_ref[i % N_ROWS]  # (128,)
            tile = row.reshape(8, 16)
            return acc + jnp.pad(tile, ((0, 0), (0, 112)))

        acc = jax.lax.fori_loop(0, K, body, jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc

    return kernel


def p4_rollor():
    def kernel(t_ref, o_ref):
        def body(i, acc):
            row = t_ref[i % N_ROWS]
            x = (row > 0).astype(jnp.int32) * jnp.int32(3)
            x2 = jnp.broadcast_to(x, (8, 128)).astype(jnp.int32)
            for s in (1, 2, 4):
                x2 = x2 | pltpu.roll(x2, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                x2 = x2 | pltpu.roll(x2, s, axis=1)
            return acc + x2[0, 0].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


def p5_scalar_loads(n_extract):
    """Like P1 but via direct element loads t_ref[i, c] (SMEM-path scalar
    loads) instead of loading the row as a vector first."""
    def kernel(t_ref, o_ref):
        def body(i, acc):
            r = i % N_ROWS
            s = jnp.float32(0)
            for c in range(n_extract):
                s = s + t_ref[r, c]
            return acc + s

        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


if __name__ == "__main__":
    run(p1_extracts(8), name="P1 row-load + 8 extracts")
    run(p1_extracts(56), name="P1 row-load + 56 extracts")
    run(p2_vector_slice(), name="P2 (8,128) pl.ds vector slice")
    run(p2b_col_broadcast(), name="P2b slice + 6 col broadcasts")
    run(p3_reshape(), name="P3 reshape (128,)->(8,16)")
    run(p4_rollor(), name="P4 roll-OR tree + extract")
    run(p5_scalar_loads(8), name="P5 8 direct scalar loads")
    run(p5_scalar_loads(56), name="P5 56 direct scalar loads")
