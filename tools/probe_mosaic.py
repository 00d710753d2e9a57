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


def p6_cond_passthrough(n_state):
    """lax.cond carrying n_state (8,128) vregs through a pass-through branch:
    measures the per-cond fixed cost + state-copy cost in a loop body."""
    def kernel(t_ref, o_ref):
        def body(i, state):
            row = t_ref[i % N_ROWS]

            def yes(args):
                return tuple(a + row[0] for a in args)

            def no(args):
                return args

            return jax.lax.cond((i & 3) == 0, yes, no, state)

        init = tuple(
            jnp.full((8, 128), float(k), jnp.float32) for k in range(n_state)
        )
        out = jax.lax.fori_loop(0, K, body, init)
        acc = out[0]
        for a in out[1:]:
            acc = acc + a
        o_ref[...] = acc

    return kernel


def p7_multi_rollor(n_chains):
    """n independent roll-OR trees + extracts per iteration: do the
    vector->scalar latencies overlap?"""
    def kernel(t_ref, o_ref):
        def body(i, acc):
            s = jnp.float32(0)
            for k in range(n_chains):
                row = t_ref[(i + k * 7) % N_ROWS]
                x = (row > 0).astype(jnp.int32) * jnp.int32(3)
                x2 = jnp.broadcast_to(x, (8, 128)).astype(jnp.int32)
                for sft in (1, 2, 4):
                    x2 = x2 | pltpu.roll(x2, sft, axis=0)
                for sft in (1, 2, 4, 8, 16, 32, 64):
                    x2 = x2 | pltpu.roll(x2, sft, axis=1)
                s = s + x2[0, 0].astype(jnp.float32)
            return acc + s

        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


def p8_bare_loop():
    """Scalar-only while body: the per-iteration control floor."""
    def kernel(t_ref, o_ref):
        def cond(state):
            return state[0] < K

        def body(state):
            i, acc = state
            return i + 1, acc + jnp.float32(i & 7)

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0)))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


def p9_extract_only(n_chains):
    """n independent raw extracts (no roll tree) per iteration."""
    def kernel(t_ref, o_ref):
        def body(i, acc):
            s = jnp.float32(0)
            for k in range(n_chains):
                row = t_ref[(i + k * 13) % N_ROWS]
                v = jnp.broadcast_to(row, (8, 128)) * 2.0
                s = s + v[0, 0]
            return acc + s

        acc = jax.lax.fori_loop(0, K, body, jnp.float32(0))
        o_ref[...] = jnp.full((8, 128), acc)

    return kernel


def p10_serial_chase(n_chains, with_cond=False):
    """n interleaved cursor chases: each chain's NEXT index comes from a
    vector->scalar extract of work on the current row — the traversal
    dependency structure, minus leaves/stacks. If independent chains overlap,
    time/iter stays ~flat with n; if the sync roundtrips serialize, it grows
    linearly."""
    def kernel(t_ref, o_ref):
        def body(state):
            i = state[0]
            curs = state[1]
            new = []
            for k in range(n_chains):
                row = t_ref[curs[k]]
                x = (row * 3.0 + 1.0) > 0.5
                x2 = jnp.broadcast_to(x, (8, 128)).astype(jnp.int32)
                for sft in (1, 2, 4):
                    x2 = x2 | pltpu.roll(x2, sft, axis=0)
                for sft in (1, 2, 4, 8, 16, 32, 64):
                    x2 = x2 | pltpu.roll(x2, sft, axis=1)
                nxt = (curs[k] * 5 + x2[0, 0] + k) % N_ROWS

                if with_cond:
                    def yes(c):
                        return c

                    def no(c):
                        return (c + 1) % N_ROWS

                    nxt = jax.lax.cond((nxt & 1) == 0, yes, no, nxt)
                new.append(nxt)
            return (i + 1, tuple(new))

        def cond(state):
            return state[0] < K

        _, curs = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tuple(jnp.int32(k) for k in range(n_chains)))
        )
        acc = curs[0]
        for c in curs[1:]:
            acc = acc + c
        o_ref[...] = jnp.full((8, 128), acc.astype(jnp.float32))

    return kernel


def p11_kernel_shape(n_slabs=8, with_cond=False, with_pushes=False,
                     carry_vregs=0, leaf_ops=0):
    """Incrementally reconstruct the traversal body inside a GATED while loop
    to find which ingredient costs the ~1.1 us/iteration:
    - n_slabs slab tests from row extracts (56 extracts + ~130 vector ops)
    - optional two-branch cond (internal vs leaf_ops-heavy leaf)
    - optional 8 pl.when SMEM pushes with dynamic index
    - carry_vregs loop-carried (8,128) vector registers
    """
    def kernel(t_ref, o_ref, stack_ref):
        base = t_ref[0] * 0.0  # (128,) zero
        ox = jnp.broadcast_to(base, (8, 128)) + 0.5
        stack_ref[0] = jnp.int32(1)

        def slabs(row, carry):
            packed = jnp.zeros((8, 128), jnp.int32)
            for c in range(n_slabs):
                tx0 = (row[c] - ox) * 1.7
                ty0 = (row[8 + c] - ox) * 1.3
                tz0 = (row[16 + c] - ox) * 0.7
                tx1 = (row[24 + c] - ox) * 1.9
                ty1 = (row[32 + c] - ox) * 0.3
                tz1 = (row[40 + c] - ox) * 0.9
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1))
                hit = (tfar >= tnear) & (tnear <= carry[0] if carry_vregs
                                         else tfar >= tnear)
                packed = packed | (hit.astype(jnp.int32) << c)
            return packed

        def body(state):
            i, cur, carry = state
            row = t_ref[cur]

            if with_cond:
                def internal(c):
                    return slabs(row, c), tuple(v + 1.0 for v in c)

                def leaf(c):
                    acc = jnp.zeros((8, 128), jnp.int32)
                    cc = list(c)
                    for s in range(leaf_ops):
                        v = row[s % 64] * ox + float(s)
                        if carry_vregs:
                            cc[s % carry_vregs] = jnp.minimum(
                                cc[s % carry_vregs], v)
                        acc = acc | (v > 1.0).astype(jnp.int32)
                    return acc, tuple(cc)

                packed, carry = jax.lax.cond(
                    (cur & 1) == 0, internal, leaf, carry)
            else:
                packed = slabs(row, carry)

            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]

            sp = jnp.int32(0)
            if with_pushes:
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                for c in range(8):
                    bit = (word >> c) & 1

                    @pl.when(bit == 1)
                    def _(child=row_i[48 + c], at=sp):
                        stack_ref[at] = child

                    sp = sp + bit

            nxt = (cur * 5 + word + sp) % N_ROWS
            return (i + 1, nxt, carry)

        def cond(state):
            return state[0] < K

        carry0 = tuple(
            jnp.full((8, 128), float(k), jnp.float32) for k in range(carry_vregs)
        ) if carry_vregs else ()
        _, cur, carry = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), carry0))
        acc = jnp.full((8, 128), cur.astype(jnp.float32))
        for v in carry:
            acc = acc + v
        o_ref[...] = acc

    def call(table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )(table)

    return call


def run_call(call, name=""):
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(N_ROWS, 128)).astype(np.float32)
    )
    try:
        f = jax.jit(call)
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


def p12_real_body(leaf_size=8, ray_vregs=True):
    """The actual traversal body (distinct ray-component vregs, full
    Moller-Trumbore leaf branch with its 80 row extracts, pl.when pushes)
    driven by a synthetic K-iteration chase — isolates per-iteration cost
    from the data-dependent walk. If this is ~1 us/iter, register pressure /
    branch spills explain the real kernel; if ~30 ns, the cost is elsewhere."""
    def kernel(t_ref, o_ref, stack_ref):
        r0 = t_ref[0]
        mk = lambda s: jnp.broadcast_to(r0 * 0.0, (8, 128)) + s
        ox, oy, oz = mk(0.1), mk(0.2), mk(0.3)
        dx, dy, dz = mk(0.5), mk(0.6), mk(0.7)
        ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        t_min = mk(1e-3)
        stack_ref[0] = jnp.int32(1)

        def leaf_tests(row, row_i, args):
            best_t, best_prim, best_u, best_v, done = args
            for s in range(leaf_size):
                base = s * 9
                v0x, v0y, v0z = row[base], row[base + 1], row[base + 2]
                e1x, e1y, e1z = row[base + 3], row[base + 4], row[base + 5]
                e2x, e2y, e2z = row[base + 6], row[base + 7], row[base + 8]
                tri_id = row_i[9 * leaf_size + s]
                px_ = dy * e2z - dz * e2y
                py_ = dz * e2x - dx * e2z
                pz_ = dx * e2y - dy * e2x
                det = e1x * px_ + e1y * py_ + e1z * pz_
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((tri_id >= 0) & (jnp.abs(det) > 1e-12)
                      & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t > t_min) & (t < best_t) & (done == 0))
                best_t = jnp.where(ok, t, best_t)
                best_prim = jnp.where(ok, tri_id, best_prim)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
            return best_t, best_prim, best_u, best_v, done

        def body(state):
            i, cur, best_t, best_prim, best_u, best_v, done = state
            row = t_ref[cur]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)

            def do_leaf(args):
                return leaf_tests(row, row_i, args) + (
                    jnp.zeros((8, 128), jnp.int32), *(jnp.int32(0),) * 8)

            def do_internal(args):
                best_t, best_prim, best_u, best_v, done = args
                not_done = done == 0
                children = []
                packed = jnp.zeros((8, 128), jnp.int32)
                for c in range(8):
                    tx0 = (row[c] - ox) * ix
                    ty0 = (row[8 + c] - oy) * iy
                    tz0 = (row[16 + c] - oz) * iz
                    tx1 = (row[24 + c] - ox) * ix
                    ty1 = (row[32 + c] - oy) * iy
                    tz1 = (row[40 + c] - oz) * iz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    hit = ((tfar >= jnp.maximum(tnear, t_min))
                           & (tnear <= best_t) & not_done)
                    packed = packed | (hit.astype(jnp.int32) << c)
                    children.append(row_i[48 + c])
                return (best_t, best_prim, best_u, best_v, done,
                        packed, *children)

            res = jax.lax.cond(
                (cur & 1) == 0, do_leaf, do_internal,
                (best_t, best_prim, best_u, best_v, done))
            best_t, best_prim, best_u, best_v, done = res[:5]
            packed = res[5]
            children = list(res[6:14])
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]
            sp = jnp.int32(0)
            for c in range(8):
                bit = (word >> c) & 1

                @pl.when(bit == 1)
                def _(child=children[c], at=sp):
                    stack_ref[at] = child

                sp = sp + bit
            nxt = (cur * 5 + word + sp + 1) % N_ROWS
            return (i + 1, nxt, best_t, best_prim, best_u, best_v, done)

        def cond(state):
            return state[0] < K

        init = (jnp.int32(0), jnp.int32(0), mk(3e38),
                jnp.full((8, 128), -1, jnp.int32), mk(0.0), mk(0.0),
                jnp.zeros((8, 128), jnp.int32))
        out = jax.lax.while_loop(cond, body, init)
        o_ref[...] = out[2] + out[4] + out[5] + out[6].astype(jnp.float32)

    def call(table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )(table)

    return call


def p13_gridded(iters):
    """The P12 body under a REAL grid: 256 steps, block-pipelined ray inputs,
    two whole-array VMEM tables (node-shaped + leaf-shaped) — reproduces the
    production pallas_call structure with a fixed iteration count per step.
    Compares per-step cost vs the single-step P12 to find the grid overhead,
    and leaf tables at 102 vs 128 columns to find DMA-stride cost."""
    def kernel(node_ref, leaf_ref, o_ref, out_ref, stack_ref):
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = ox * 0.5 + 0.6
        dy = oy * 0.3 + 0.8
        dz = oz * 0.2 + 0.9
        ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        t_min = ox * 0.0 + 1e-3
        stack_ref[0] = jnp.int32(1)
        n_nodes = node_ref.shape[0]
        n_leaves = leaf_ref.shape[0]

        def body(state):
            i, cur, best_t, done = state
            row = node_ref[cur % n_nodes]
            lrow = leaf_ref[cur % n_leaves]
            packed = jnp.zeros((8, 128), jnp.int32)
            not_done = done == 0
            for c in range(8):
                tx0 = (row[c] - ox) * ix
                ty0 = (row[8 + c] - oy) * iy
                tz0 = (row[16 + c] - oz) * iz
                tx1 = (row[24 + c] - ox) * ix
                ty1 = (row[32 + c] - oy) * iy
                tz1 = (row[40 + c] - oz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1))
                hit = ((tfar >= jnp.maximum(tnear, t_min))
                       & (tnear <= best_t) & not_done)
                packed = packed | (hit.astype(jnp.int32) << c)
            best_t = jnp.minimum(best_t, jnp.abs(lrow[0]) + best_t * 0.999)
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]
            stack_ref[word & 31] = cur
            nxt = (cur * 5 + word + 1) % N_ROWS
            return (i + 1, nxt, best_t, done)

        def cond(state):
            return state[0] < iters

        init = (jnp.int32(0), jnp.int32(0), ox * 0.0 + 3e38,
                jnp.zeros((8, 128), jnp.int32))
        out = jax.lax.while_loop(cond, body, init)
        out_ref[0] = out[2]

    def call(node, leaf, rays):
        b = rays.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )(node, leaf, rays)

    return call


def run_grid(call, leaf_cols, name=""):
    rng = np.random.default_rng(0)
    node = jnp.asarray(rng.normal(size=(1793, 64)).astype(np.float32))
    leaf = jnp.asarray(rng.normal(size=(4214, leaf_cols)).astype(np.float32))
    rays = jnp.asarray(rng.normal(size=(256, 3, 8, 128)).astype(np.float32))
    try:
        f = jax.jit(call)
        out = f(node, leaf, rays)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(node, leaf, rays)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 5 * 1000
        print(f"{name}: {ms:.3f} ms total, {ms / 256 * 1e3:.2f} us/step")
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    import sys as _sys

    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "r1"):
        run(p1_extracts(8), name="P1 row-load + 8 extracts")
        run(p1_extracts(56), name="P1 row-load + 56 extracts")
        run(p2_vector_slice(), name="P2 (8,128) pl.ds vector slice")
        run(p2b_col_broadcast(), name="P2b slice + 6 col broadcasts")
        run(p3_reshape(), name="P3 reshape (128,)->(8,16)")
        run(p4_rollor(), name="P4 roll-OR tree + extract")
        run(p5_scalar_loads(8), name="P5 8 direct scalar loads")
        run(p5_scalar_loads(56), name="P5 56 direct scalar loads")
    if which in ("all", "r2"):
        run(p8_bare_loop(), name="P8 bare scalar while loop")
        run(p9_extract_only(1), name="P9 1 extract/iter")
        run(p9_extract_only(4), name="P9 4 indep extracts/iter")
        run(p7_multi_rollor(1), name="P7 1 roll-OR chain/iter")
        run(p7_multi_rollor(2), name="P7 2 indep roll-OR chains/iter")
        run(p7_multi_rollor(4), name="P7 4 indep roll-OR chains/iter")
        run(p6_cond_passthrough(1), name="P6 cond passthrough 1 vreg")
        run(p6_cond_passthrough(5), name="P6 cond passthrough 5 vregs")
        run(p6_cond_passthrough(10), name="P6 cond passthrough 10 vregs")
    if which in ("all", "r3"):
        run(p10_serial_chase(1), name="P10 serial chase x1")
        run(p10_serial_chase(2), name="P10 serial chase x2")
        run(p10_serial_chase(4), name="P10 serial chase x4")
        run(p10_serial_chase(8), name="P10 serial chase x8")
        run(p10_serial_chase(1, with_cond=True), name="P10c chase+cond x1")
        run(p10_serial_chase(4, with_cond=True), name="P10c chase+cond x4")
    if which in ("all", "r4"):
        run_call(p11_kernel_shape(), name="P11 gated slabs (56 extracts)")
        run_call(p11_kernel_shape(with_pushes=True),
                 name="P11 + 8 pl.when pushes")
        run_call(p11_kernel_shape(carry_vregs=5),
                 name="P11 + 5 carried vregs")
        run_call(p11_kernel_shape(with_cond=True, carry_vregs=5, leaf_ops=16),
                 name="P11 + cond(leaf16) + 5 vregs")
        run_call(p11_kernel_shape(with_cond=True, carry_vregs=5, leaf_ops=64),
                 name="P11 + cond(leaf64) + 5 vregs")
        run_call(
            p11_kernel_shape(with_cond=True, with_pushes=True,
                             carry_vregs=5, leaf_ops=64),
            name="P11 full shape",
        )
    if which in ("all", "r5"):
        run_call(p12_real_body(), name="P12 real body (synthetic chase)")
    if which in ("all", "r7"):
        # A: 1D VMEM footprint — compiles only if 1D arrays are packed
        # (a (3M,) f32 = 12 MB logical; 8x sublane padding would OOM).
        def p14a(nelem):
            def kernel(flat_ref, o_ref):
                def body(state):
                    i, cur, acc = state
                    v = flat_ref[cur]
                    nxt = (cur * 5 + 17 + jnp.int32(v * 0)) % nelem
                    return (i + 1, nxt, acc + v)

                _, _, acc = jax.lax.while_loop(
                    lambda s: s[0] < K, body,
                    (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
                o_ref[...] = jnp.full((8, 128), acc)

            def call(flat):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(flat)

            flat = jnp.arange(nelem, dtype=jnp.float32)
            try:
                f = jax.jit(call)
                out = f(flat)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = f(flat)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / 5 * 1000
                print(f"P14a 1D VMEM ({nelem*4//2**20} MB): OK "
                      f"{ms/K*1e6:.1f} ns/load-chase")
            except Exception as e:
                print(f"P14a 1D VMEM ({nelem*4//2**20} MB): FAILED — "
                      f"{str(e)[:160]}")

        p14a(1 << 20)   # 4 MB
        p14a(3 << 20)   # 12 MB

        # B: gated chase with 56 flat scalar loads per iteration (the
        # planarized internal-node pop shape).
        def p14b():
            nelem = 1 << 20

            def kernel(flat_ref, o_ref):
                def body(state):
                    i, cur, acc = state
                    s = jnp.float32(0)
                    for c in range(56):
                        s = s + flat_ref[cur + c * 16384]
                    nxt = (cur * 5 + 13 + jnp.int32(s * 0)) % 16384
                    return (i + 1, nxt, acc + s)

                _, _, acc = jax.lax.while_loop(
                    lambda s: s[0] < K, body,
                    (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
                o_ref[...] = jnp.full((8, 128), acc)

            def call(flat):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                )(flat)

            flat = jnp.arange(nelem, dtype=jnp.float32)
            run_call_direct(call, flat, "P14b 56 flat loads/iter chase")

        def run_call_direct(call, arg, name):
            try:
                f = jax.jit(call)
                out = f(arg)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = f(arg)
                jax.block_until_ready(out)
                ms = (time.perf_counter() - t0) / 5 * 1000
                print(f"{name}: {ms/K*1e6:.1f} ns/iter")
            except Exception as e:
                print(f"{name}: FAILED — {str(e)[:160]}")

        p14b()
    if which in ("all", "r6"):
        for iters in (38, 408):
            for leaf_cols in (102, 128):
                run_grid(
                    p13_gridded(iters), leaf_cols,
                    name=f"P13 grid256 iters={iters} leafcols={leaf_cols}",
                )
