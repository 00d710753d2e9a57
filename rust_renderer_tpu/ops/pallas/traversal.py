"""Pallas TPU kernel: packet BVH traversal with the tree resident in VMEM.

The XLA packet traversal (ops/bvh.py::traverse_packet) still pays two real
costs per step: a per-block row gather from HBM and ~50 small fusion
dispatches (~4 us each) per `while` iteration. This kernel moves the whole
walk inside ONE kernel:

- the tree lives in VMEM for the kernel's lifetime: width-16 wide nodes
  (112 of the 128 lanes a VMEM row costs) + 12-slot leaf rows (120/128).
  Trees over the ~14 MB scoped-vmem budget keep the node table resident
  and DMA leaf rows from HBM per leaf pop (dma_leaf=True, auto-selected);
- each grid step owns one 1024-ray packet, laid out as (8, 128) planar
  component registers;
- the per-block traversal cursor is a SCALAR: node and leaf rows are fetched
  with scalar dynamic indexing and broadcast into the packet's vector ops —
  no gathers anywhere;
- the traversal loop is a `lax.while_loop` inside the kernel: zero dispatch
  overhead per step.

`traverse_packet_pallas` is a drop-in alternative to
`ops.bvh.traverse_packet` (same results); `ops.bvh.make_closest_hit(...,
backend="pallas")` selects it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACKET = 1024  # rays per block: (8, 128) f32 registers per component


def _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                ox, oy, oz, dx, dy, dz, t_min, args, valid=None):
    """Test all leaf_size triangles of one leaf row against the packet.

    The slot tests are INDEPENDENT — each runs against the leaf-ENTRY best_t
    and the winners merge through a tournament min afterwards. The obvious
    sequential formulation (each slot's `ok` reading the previous slot's
    best_t) chains ~45 vector ops x 8 slots into a ~360-deep serial
    dependency that measured ~2 us per leaf pop — 16x the internal-node pop
    (see PERFORMANCE.md round-2 bisect). Ties keep the lowest slot, matching
    the sequential semantics exactly.
    """
    lrow = leaf_ref[jnp.maximum(leaf, 0)]
    return _leaf_tests_from_row(lrow, leaf_size, any_hit,
                                ox, oy, oz, dx, dy, dz, t_min, args,
                                valid=valid)


def _leaf_tests_from_row(lrow, leaf_size, any_hit,
                         ox, oy, oz, dx, dy, dz, t_min, args, valid=None):
    best_t, best_prim, best_u, best_v, done = args
    lrow_i = jax.lax.bitcast_convert_type(lrow, jnp.int32)
    alive = done == 0
    if valid is not None:  # scalar: masked-off slot of a leaf-queue flush
        alive = jnp.logical_and(alive, valid)
    cands = []
    hits = []
    for s in range(leaf_size):
        base = s * 9
        v0x, v0y, v0z = lrow[base], lrow[base + 1], lrow[base + 2]
        e1x, e1y, e1z = lrow[base + 3], lrow[base + 4], lrow[base + 5]
        e2x, e2y, e2z = lrow[base + 6], lrow[base + 7], lrow[base + 8]
        tri_id = lrow_i[9 * leaf_size + s]
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
        ok = (
            (tri_id >= 0)
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > t_min) & (t < best_t)
            & alive
        )
        if any_hit:
            # Occlusion queries consume only `prim >= 0` (make_any_hit,
            # combine_any_hit): skip the closest-slot tournament and its
            # per-slot selects — one OR tree replaces ~5 selects/slot.
            hits.append(ok)
            continue
        cands.append((
            jnp.where(ok, t, 3.0e38),
            jnp.where(ok, tri_id, -1),
            u, v,
        ))

    if any_hit:
        while len(hits) > 1:
            hits = [
                jnp.logical_or(hits[i], hits[i + 1])
                if i + 1 < len(hits) else hits[i]
                for i in range(0, len(hits), 2)
            ]
        hit_any = hits[0]
        best_prim = jnp.where(hit_any, jnp.int32(0), best_prim)
        done = jnp.maximum(done, hit_any.astype(jnp.int32))
        return best_t, best_prim, best_u, best_v, done

    def merge(a, b):
        ta, pa, ua, va = a
        tb, pb, ub, vb = b
        take_b = tb < ta  # strict: the earlier slot keeps ties
        return (
            jnp.where(take_b, tb, ta),
            jnp.where(take_b, pb, pa),
            jnp.where(take_b, ub, ua),
            jnp.where(take_b, vb, va),
        )

    while len(cands) > 1:
        cands = [
            merge(cands[i], cands[i + 1]) if i + 1 < len(cands) else cands[i]
            for i in range(0, len(cands), 2)
        ]
    t_c, p_c, u_c, v_c = cands[0]
    improved = t_c < best_t
    best_t = jnp.where(improved, t_c, best_t)
    best_prim = jnp.where(improved, p_c, best_prim)
    best_u = jnp.where(improved, u_c, best_u)
    best_v = jnp.where(improved, v_c, best_v)
    return best_t, best_prim, best_u, best_v, done


def _steady_drain(drain, q0, queue_ref, leaf_ref, leaf_size, any_hit,
                  ox, oy, oz, dx, dy, dz, t_min, args,
                  dma_leaf=False, rowbuf_ref=None, dma_sem=None):
    """Test up to `drain` queued leaf rows (LIFO), surplus masked by valid.

    DMA mode pipelines: all `drain` row fetches are STARTED before the
    first wait (the row indices are all known up front), so the fetch
    latencies overlap instead of serializing one start/wait per row."""
    if dma_leaf:
        dmas = []
        for k in range(drain):
            row_idx = queue_ref[jnp.maximum(q0 - 1 - k, 0)]
            dma = pltpu.make_async_copy(
                leaf_ref.at[pl.ds(jnp.maximum(row_idx, 0), 1)],
                rowbuf_ref.at[pl.ds(k, 1)],
                dma_sem.at[k],
            )
            dma.start()
            dmas.append(dma)
        for k in range(drain):
            dmas[k].wait()
            args = _leaf_tests_from_row(
                rowbuf_ref[k], leaf_size, any_hit,
                ox, oy, oz, dx, dy, dz, t_min, args, valid=q0 > k,
            )
        return args
    for k in range(drain):
        row_idx = queue_ref[jnp.maximum(q0 - 1 - k, 0)]
        args = _leaf_tests(leaf_ref, row_idx, leaf_size, any_hit,
                           ox, oy, oz, dx, dy, dz, t_min, args,
                           valid=q0 > k)
    return args


def _make_kernel(leaf_size: int, any_hit: bool):
    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out):
        ox = o_ref[0, 0]  # (8, 128)
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        # `done` is carried as int32 (Mosaic miscompiles i1 vectors through
        # conditional pass-through branches).
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        def cond(state):
            cur = state[0]
            return cur >= 0

        def body(state):
            cur, best_t, best_prim, best_u, best_v, done = state
            row = node_ref[cur]  # (8,) scalar-indexed fetch
            tx0 = (row[0] - ox) * ix
            ty0 = (row[1] - oy) * iy
            tz0 = (row[2] - oz) * iz
            tx1 = (row[3] - ox) * ix
            ty1 = (row[4] - oy) * iy
            tz1 = (row[5] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            # Mosaic bitcasts operate on vectors, not scalars.
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            miss = row_i[6]
            leaf = row_i[7]
            not_done = done == 0
            ray_hit = (
                (tfar >= jnp.maximum(tnear, t_min))
                & (tnear <= best_t)
                & not_done
            )
            block_hit = jnp.any(ray_hit)
            is_leaf = leaf >= 0

            def leaf_tests(args):
                return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                                   ox, oy, oz, dx, dy, dz, t_min, args)

            do_leaf = jnp.logical_and(block_hit, is_leaf)
            best_t, best_prim, best_u, best_v, done = jax.lax.cond(
                do_leaf, leaf_tests, lambda a: a,
                (best_t, best_prim, best_u, best_v, done),
            )

            descend = jnp.logical_and(block_hit, jnp.logical_not(is_leaf))
            nxt = jnp.where(descend, cur + 1, miss)
            if any_hit:
                nxt = jnp.where(jnp.all(done > 0), -1, nxt)
            return nxt, best_t, best_prim, best_u, best_v, done

        init = (
            jnp.int32(0),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
        )
        cur, best_t, best_prim, best_u, best_v, done = jax.lax.while_loop(
            cond, body, init
        )
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def _make_kernel_ordered(leaf_size: int, any_hit: bool):
    """Ordered (near-child-first) traversal with a per-block SMEM stack.

    The skip-pointer walk steps through MISSED nodes too and cannot order
    children by distance. Here popped nodes are only box-HIT candidates and
    the nearer child is visited first, so best_t shrinks early and far
    subtrees get culled — fewer iterations per packet. The stack is scalar
    state in SMEM (tree depth bounded; 64 entries is ample). Right child of
    an internal node is recovered as the left child's miss pointer (the DFS
    pre-order layout invariant)."""

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
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        n_nodes = node_ref.shape[0]

        def slab(row, best_t, done):
            tx0 = (row[0] - ox) * ix
            ty0 = (row[1] - oy) * iy
            tz0 = (row[2] - oz) * iz
            tx1 = (row[3] - ox) * ix
            ty1 = (row[4] - oy) * iy
            tz1 = (row[5] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            hit = (
                (tfar >= jnp.maximum(tnear, t_min))
                & (tnear <= best_t)
                & (done == 0)
            )
            return hit, tnear

        def leaf_tests(leaf, args):
            return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                               ox, oy, oz, dx, dy, dz, t_min, args)

        stack_ref[0] = jnp.int32(0)  # root

        def cond(state):
            sp = state[0]
            return sp > 0

        def body(state):
            sp, best_t, best_prim, best_u, best_v, done = state
            node = stack_ref[sp - 1]
            sp = sp - 1
            row = node_ref[node]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            leaf = row_i[7]
            hit, _ = slab(row, best_t, done)
            block_hit = jnp.any(hit)
            is_leaf = leaf >= 0

            do_leaf = jnp.logical_and(block_hit, is_leaf)
            best_t, best_prim, best_u, best_v, done = jax.lax.cond(
                do_leaf,
                lambda a: leaf_tests(leaf, a),
                lambda a: a,
                (best_t, best_prim, best_u, best_v, done),
            )

            # Internal: evaluate both children, push far then near.
            do_int = jnp.logical_and(block_hit, jnp.logical_not(is_leaf))
            left = jnp.minimum(node + 1, n_nodes - 1)
            lrow = node_ref[left]
            lrow_i = jax.lax.bitcast_convert_type(lrow, jnp.int32)
            right = jnp.clip(lrow_i[6], 0, n_nodes - 1)  # left's miss = sibling
            rrow = node_ref[right]

            hit_l, tn_l = slab(lrow, best_t, done)
            hit_r, tn_r = slab(rrow, best_t, done)
            any_l = jnp.logical_and(do_int, jnp.any(hit_l))
            any_r = jnp.logical_and(do_int, jnp.any(hit_r))
            big = jnp.float32(3.0e38)
            tmin_l = jnp.min(jnp.where(hit_l, tn_l, big))
            tmin_r = jnp.min(jnp.where(hit_r, tn_r, big))
            near_is_left = tmin_l <= tmin_r
            first = jnp.where(near_is_left, left, right)
            second = jnp.where(near_is_left, right, left)
            push_first = jnp.where(near_is_left, any_l, any_r)
            push_second = jnp.where(near_is_left, any_r, any_l)

            @pl.when(push_second)
            def _():
                stack_ref[sp] = second

            sp = sp + push_second.astype(jnp.int32)

            @pl.when(push_first)
            def _():
                stack_ref[sp] = first

            sp = sp + push_first.astype(jnp.int32)

            if any_hit:
                sp = jnp.where(jnp.all(done > 0), 0, sp)
            return sp, best_t, best_prim, best_u, best_v, done

        init = (
            jnp.int32(1),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
        )
        sp, best_t, best_prim, best_u, best_v, done = jax.lax.while_loop(
            cond, body, init
        )
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def _make_kernel_wide(leaf_size: int, any_hit: bool, ordered: bool,
                      dma_leaf: bool = False, mask_via_vmem: bool = False):
    """Wide (BVH8) stack traversal: each popped internal node tests its 8
    children against the whole packet from ONE scalar row fetch.

    vs the binary skip walk (_make_kernel): the skip walk spends one iteration
    (fetch + slab) per node INCLUDING missed ones; here every iteration
    retires 8 boxes, and only box-HIT children are ever revisited — ~3x fewer
    iterations on coherent packets and better on divergent ones (the union
    path shrinks at every level). Leaf children are pushed as encoded negative
    refs (-2 - leaf_row) and tested on pop; `ordered=True` additionally pushes
    children far-to-near (packet-min tnear, 19-exchange sorting network on
    scalars) so best_t shrinks early and far subtrees die on the
    `tnear <= best_t` cull.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        rest = list(rest)
        mvm_ref = rest.pop() if mask_via_vmem else None
        n_scratch = 3 if dma_leaf else 1
        stack_ref = rest[-n_scratch]
        if dma_leaf:
            rowbuf_ref, dma_sem = rest[-2], rest[-1]
        stats_out = rest[0] if len(rest) == n_scratch + 1 else None
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        def leaf_tests(leaf, args):
            if dma_leaf:
                # At-scale mode: the leaf table stays in HBM; fetch one
                # 512 B row per leaf pop (nodes remain VMEM-resident).
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(jnp.maximum(leaf, 0), 1)],
                    rowbuf_ref, dma_sem,
                )
                dma.start()
                dma.wait()
                return _leaf_tests_from_row(
                    rowbuf_ref[0], leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                )
            return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                               ox, oy, oz, dx, dy, dz, t_min, args)

        stack_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)
        zero_f = jnp.float32(0.0)

        def cond(state):
            return state[0] > 0

        def body(state):
            sp, best_t, best_prim, best_u, best_v, done, iters, leaf_pops = state
            ref = stack_ref[sp - 1]
            sp = sp - 1
            is_leaf = ref < 0
            iters = iters + 1
            leaf_pops = leaf_pops + is_leaf.astype(jnp.int32)

            def do_leaf(args):
                out = leaf_tests(-2 - ref, args)
                if any_hit:
                    # any-lane-alive, via the same roll-OR trick (done only
                    # changes here, so the all-done early-exit check lives in
                    # this branch — one reduction per iteration either way).
                    alive_v = (out[4] == 0).astype(jnp.int32)
                    for s in (1, 2, 4):
                        alive_v = alive_v | pltpu.roll(alive_v, s, axis=0)
                    for s in (1, 2, 4, 8, 16, 32, 64):
                        alive_v = alive_v | pltpu.roll(alive_v, s, axis=1)
                    alive = alive_v[0, 0]
                else:
                    alive = jnp.int32(1)
                return out + (zero_i,) * (W + 1) + (zero_f,) * W + (alive,)

            def do_internal(args):
                best_t, best_prim, best_u, best_v, done = args
                row = node_ref[jnp.maximum(ref, 0)]
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                not_done = done == 0
                children = []
                tns = []
                packed = jnp.zeros((8, 128), jnp.int32)
                for c in range(W):
                    tx0 = (row[c] - ox) * ix
                    ty0 = (row[W + c] - oy) * iy
                    tz0 = (row[2 * W + c] - oz) * iz
                    tx1 = (row[3 * W + c] - ox) * ix
                    ty1 = (row[4 * W + c] - oy) * iy
                    tz1 = (row[5 * W + c] - oz) * iz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = (
                        (tfar >= jnp.maximum(tnear, t_min))
                        & (tnear <= best_t)
                        & not_done
                    )
                    # Per-lane child bitmask; ONE cross-vector reduction below
                    # replaces 8 jnp.any() calls — vector->scalar reductions
                    # have ~µs latency and serialize the walk (measured:
                    # 1.4 µs/iteration with 16 reductions).
                    packed = packed | (hit.astype(jnp.int32) << c)
                    children.append(row_i[6 * W + c])
                    if ordered:
                        tns.append(jnp.min(jnp.where(hit, tnear, 3.0e38)))
                # One reduction answers "did any lane hit child c" for all W
                # children at once: OR-tree across lanes/sublanes with
                # log2 rotations (Mosaic has no or-reduce primitive), then a
                # single max (every element now holds the full OR).
                for s in (1, 2, 4):
                    packed = packed | pltpu.roll(packed, s, axis=0)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    packed = packed | pltpu.roll(packed, s, axis=1)
                if mask_via_vmem:
                    # Experiment: route the vector->scalar handoff through
                    # a VMEM store + scalar load instead of the computed-
                    # vector extract, probing whether the memory-port sync
                    # is cheaper than the extract's pipeline drain.
                    mvm_ref[...] = packed
                    mask = mvm_ref[0, 0]
                else:
                    mask = packed[0, 0]  # all elements equal after the OR-tree
                empty_bits = jnp.int32(0)
                for c in range(W):
                    empty_bits = empty_bits | (
                        (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                    )
                mask = mask & ~empty_bits
                if not ordered:
                    tns = [zero_f] * W
                return (best_t, best_prim, best_u, best_v, done, mask,
                        *children, *tns, jnp.int32(1))

            res = jax.lax.cond(
                is_leaf, do_leaf, do_internal,
                (best_t, best_prim, best_u, best_v, done),
            )
            best_t, best_prim, best_u, best_v, done, mask = res[:6]
            children = list(res[6:6 + W])
            tns = list(res[6 + W:6 + 2 * W])
            alive = res[6 + 2 * W]
            bits = [(mask >> c) & 1 for c in range(W)]

            if ordered:
                # Push far-to-near: sort descending by packet-min tnear with
                # an odd-even transposition network (width exchanges x width
                # rounds; scalar compare-exchanges).
                net = [
                    (i, i + 1)
                    for r in range(W)
                    for i in range(r % 2, W - 1, 2)
                ]
                for i, j in net:
                    swap = tns[i] < tns[j]  # descending
                    for arr in (tns, children, bits):
                        ai = jnp.where(swap, arr[j], arr[i])
                        aj = jnp.where(swap, arr[i], arr[j])
                        arr[i], arr[j] = ai, aj

            # (Unconditional compacted pushes were measured 3.5x SLOWER here —
            # dynamic-index SMEM stores cost more than taken branches.)
            for c in range(W):
                @pl.when(bits[c] == 1)
                def _(child=children[c], at=sp):
                    stack_ref[at] = child

                sp = sp + bits[c]

            if any_hit:
                sp = jnp.where(alive == 0, 0, sp)
            return sp, best_t, best_prim, best_u, best_v, done, iters, leaf_pops

        init = (
            jnp.int32(1),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
            jnp.int32(0),
        )
        (sp, best_t, best_prim, best_u, best_v, done, iters,
         leaf_pops) = jax.lax.while_loop(cond, body, init)
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if stats_out is not None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[0] = jnp.where(rid == 0, iters, leaf_pops)

    return kernel


def _make_kernel_wide_lq(leaf_size: int, any_hit: bool, flush_k: int,
                         dma_leaf: bool = False):
    """Wide stack traversal with a deferred LEAF QUEUE.

    The round-2 bisect priced a leaf pop at ~2-3 us against ~124 ns for an
    internal pop — the cost is the lax.cond branch context, not the
    triangle math. Here the stack holds ONLY internal refs: a popped node's
    leaf children append to an SMEM queue instead, and once `flush_k` rows
    are queued (or the stack runs dry) ONE cond branch tests all of them
    back-to-back — the branch context is paid once per `flush_k` leaf rows,
    and the main loop body becomes straight-line code with no per-iteration
    branch at all. Deferral means up to flush_k-1 leaf rows are tested
    later than strict DFS order would — best_t tightens a little later
    (slightly more pushes) and closest-hit tie-breaking order changes
    (identical-t duplicates may resolve differently; hit results are
    otherwise exact).
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        n_scratch = 4 if dma_leaf else 2
        stack_ref, queue_ref = rest[-n_scratch], rest[-n_scratch + 1]
        if dma_leaf:
            rowbuf_ref, dma_sem = rest[-2], rest[-1]
        stats_out = rest[0] if len(rest) == n_scratch + 1 else None
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        def leaf_tests(leaf, valid, args):
            if dma_leaf:
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(jnp.maximum(leaf, 0), 1)],
                    rowbuf_ref, dma_sem,
                )
                dma.start()
                dma.wait()
                return _leaf_tests_from_row(
                    rowbuf_ref[0], leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args, valid=valid,
                )
            return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                               ox, oy, oz, dx, dy, dz, t_min, args,
                               valid=valid)

        stack_ref[0] = jnp.int32(0)
        queue_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)

        def cond(state):
            return jnp.logical_or(state[0] > 0, state[1] > 0)

        def body(state):
            (sp, qn, best_t, best_prim, best_u, best_v, done, pops,
             leaf_pops) = state
            # Unconditional pop-and-expand: the stack never holds leaves,
            # so there is no is_leaf dispatch. A drained stack (queue
            # drain tail) expands the root with its mask forced to zero.
            active = sp > 0
            ref = jnp.where(active, stack_ref[jnp.maximum(sp - 1, 0)],
                            zero_i)
            sp = jnp.maximum(sp - 1, 0)
            pops = pops + active.astype(jnp.int32)

            row = node_ref[jnp.maximum(ref, 0)]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            not_done = done == 0
            children = []
            packed = jnp.zeros((8, 128), jnp.int32)
            for c in range(W):
                tx0 = (row[c] - ox) * ix
                ty0 = (row[W + c] - oy) * iy
                tz0 = (row[2 * W + c] - oz) * iz
                tx1 = (row[3 * W + c] - ox) * ix
                ty1 = (row[4 * W + c] - oy) * iy
                tz1 = (row[5 * W + c] - oz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                hit = (
                    (tfar >= jnp.maximum(tnear, t_min))
                    & (tnear <= best_t)
                    & not_done
                )
                packed = packed | (hit.astype(jnp.int32) << c)
                children.append(row_i[6 * W + c])
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]
            empty_bits = jnp.int32(0)
            for c in range(W):
                empty_bits = empty_bits | (
                    (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                )
            mask = jnp.where(active, word & ~empty_bits, 0)

            for c in range(W):
                bit = (mask >> c) & 1
                is_leaf_c = children[c] < 0
                leaf_bit = bit * is_leaf_c.astype(jnp.int32)
                int_bit = bit - leaf_bit

                @pl.when(leaf_bit == 1)
                def _(row_idx=-2 - children[c], at=qn):
                    queue_ref[at] = row_idx

                qn = qn + leaf_bit

                @pl.when(int_bit == 1)
                def _(child=children[c], at=sp):
                    stack_ref[at] = child

                sp = sp + int_bit

            # Flush processes up to W rows per trigger (one pop can append
            # up to W, so a smaller batch would let the queue grow without
            # bound); flush_k only sets the trigger threshold.
            do_flush = jnp.logical_or(
                qn >= flush_k, jnp.logical_and(sp == 0, qn > 0)
            )
            n_take = jnp.minimum(qn, W)
            leaf_pops = leaf_pops + jnp.where(do_flush, n_take, 0)

            def flush(args):
                for k in range(W):
                    valid = k < n_take
                    row_idx = queue_ref[jnp.maximum(qn - 1 - k, 0)]
                    args = leaf_tests(row_idx, valid, args)
                if any_hit:
                    alive_v = (args[4] == 0).astype(jnp.int32)
                    for s in (1, 2, 4):
                        alive_v = alive_v | pltpu.roll(alive_v, s, axis=0)
                    for s in (1, 2, 4, 8, 16, 32, 64):
                        alive_v = alive_v | pltpu.roll(alive_v, s, axis=1)
                    return args + (alive_v[0, 0],)
                return args + (jnp.int32(1),)

            bests = (best_t, best_prim, best_u, best_v, done)
            res = jax.lax.cond(do_flush, flush,
                               lambda a: a + (jnp.int32(1),), bests)
            best_t, best_prim, best_u, best_v, done = res[:5]
            qn = jnp.where(do_flush, qn - n_take, qn)
            if any_hit:
                all_done = res[5] == 0
                sp = jnp.where(all_done, 0, sp)
                qn = jnp.where(all_done, 0, qn)
            return (sp, qn, best_t, best_prim, best_u, best_v, done, pops,
                    leaf_pops)

        init = (
            jnp.int32(1),
            jnp.int32(0),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
            jnp.int32(0),
        )
        (sp, qn, best_t, best_prim, best_u, best_v, done, pops,
         leaf_pops) = jax.lax.while_loop(cond, body, init)
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if stats_out is not None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[0] = jnp.where(rid == 0, pops, leaf_pops)

    return kernel


SD_QCAP = 1024  # steady-drain SMEM leaf-queue capacity (4 KB SMEM). Queue
                # growth is drain-rate-bound, not statically bound: drain=1
                # cannot keep up on camera fronts (mean peak 229/block,
                # tools/eval_lq.py) — use drain >= 2. Sponza-scale camera
                # fronts reach mean peak 266 under sdd3, hence 1024. Writes
                # clamp at SD_QCAP-1 (overflow would drop rows, never
                # corrupt); the TPU sweep test asserts peak < SD_QCAP // 2.


def _make_kernel_wide_sd(leaf_size: int, any_hit: bool, drain: int,
                         dma_leaf: bool = False):
    """Wide traversal with a STEADY leaf drain — no lax.cond anywhere.

    The lq kernel amortizes the leaf branch context to one cond per
    flush, but its flush tests a fixed W=16 rows regardless of queue
    depth (`valid` only masks the writes), so partially-full flushes
    nearly double the leaf vector work (CPU replay, tools/eval_lq.py:
    832 row-slots vs prod's 427 on the bounce-closest front). Here every
    iteration is one straight-line body: pop-and-expand one internal node
    (masked no-op once the stack drains) + test `drain` queued leaf rows
    (masked when fewer are queued). With mean leaf rows per internal pop
    ~1.3 on the bench scenes, drain=2 keeps the queue bounded (peak ~32)
    and the body branch-free: bounce-closest does 304 iterations at
    2 row-slots each vs prod's 729 cond-guarded pops.

    Any-hit early exit: the all-lanes-done bit rides bit W of the same
    packed word the child-hit mask reduces through, so termination reuses
    the one vector->scalar extract per iteration (it lags the drain by one
    iteration — dead lanes mask every test meanwhile, so results are
    unaffected). Deferral semantics match the lq kernel: best_t tightens
    up to queue-depth rows later than strict DFS, which only changes
    identical-t tie resolution.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        n_scratch = 4 if dma_leaf else 2
        stack_ref, queue_ref = rest[-n_scratch], rest[-n_scratch + 1]
        if dma_leaf:
            rowbuf_ref, dma_sem = rest[-2], rest[-1]
        stats_out = rest[0] if len(rest) == n_scratch + 1 else None
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        stack_ref[0] = jnp.int32(0)
        # A drain on an empty queue reads slot 0 (index clamp) with its
        # test masked — the slot must still hold an IN-BOUNDS row index.
        queue_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)

        def cond(state):
            sp, qn, alive = state[0], state[1], state[2]
            return jnp.logical_and(
                jnp.logical_or(sp > 0, qn > 0), alive > 0
            )

        def body(state):
            (sp, qn, alive, best_t, best_prim, best_u, best_v, done, pops,
             rows, max_q) = state
            active = sp > 0
            ref = jnp.where(active, stack_ref[jnp.maximum(sp - 1, 0)],
                            zero_i)
            sp = jnp.maximum(sp - 1, 0)
            pops = pops + active.astype(jnp.int32)

            row = node_ref[jnp.maximum(ref, 0)]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            not_done = done == 0
            children = []
            # Bits 0..W-1: per-child any-lane-hit; bit W: any lane alive
            # (one OR-tree + extract serves both the mask and the any-hit
            # termination check).
            packed = not_done.astype(jnp.int32) << W
            for c in range(W):
                tx0 = (row[c] - ox) * ix
                ty0 = (row[W + c] - oy) * iy
                tz0 = (row[2 * W + c] - oz) * iz
                tx1 = (row[3 * W + c] - ox) * ix
                ty1 = (row[4 * W + c] - oy) * iy
                tz1 = (row[5 * W + c] - oz) * iz
                tnear = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.minimum(tz0, tz1),
                )
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.maximum(tz0, tz1),
                )
                hit = (
                    (tfar >= jnp.maximum(tnear, t_min))
                    & (tnear <= best_t)
                    & not_done
                )
                packed = packed | (hit.astype(jnp.int32) << c)
                children.append(row_i[6 * W + c])
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]
            if any_hit:
                alive = (word >> W) & 1
            empty_bits = jnp.int32(0)
            for c in range(W):
                empty_bits = empty_bits | (
                    (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                )
            mask = jnp.where(active, word & ~empty_bits, 0)

            for c in range(W):
                bit = (mask >> c) & 1
                is_leaf_c = children[c] < 0
                leaf_bit = bit * is_leaf_c.astype(jnp.int32)
                int_bit = bit - leaf_bit

                @pl.when(leaf_bit == 1)
                def _(row_idx=-2 - children[c],
                      at=jnp.minimum(qn, SD_QCAP - 1)):
                    queue_ref[at] = row_idx

                qn = qn + leaf_bit

                @pl.when(int_bit == 1)
                def _(child=children[c], at=sp):
                    stack_ref[at] = child

                sp = sp + int_bit
            max_q = jnp.maximum(max_q, qn)

            # Steady drain: exactly `drain` row tests per iteration, the
            # surplus masked by valid — straight-line, no cond.
            args = (best_t, best_prim, best_u, best_v, done)
            q0 = qn
            if dma_leaf:
                args = _steady_drain(
                    drain, q0, queue_ref, leaf_ref, leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                    dma_leaf=True, rowbuf_ref=rowbuf_ref, dma_sem=dma_sem,
                )
            else:
                args = _steady_drain(
                    drain, q0, queue_ref, leaf_ref, leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                )
            take = jnp.minimum(q0, drain)
            qn = q0 - take
            rows = rows + take
            best_t, best_prim, best_u, best_v, done = args
            return (sp, qn, alive, best_t, best_prim, best_u, best_v, done,
                    pops, rows, max_q)

        init = (
            jnp.int32(1),
            jnp.int32(0),
            jnp.int32(1),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        )
        (sp, qn, alive, best_t, best_prim, best_u, best_v, done, pops,
         rows, max_q) = jax.lax.while_loop(cond, body, init)
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if stats_out is not None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[0] = jnp.where(
                rid == 0, pops, jnp.where(rid == 1, rows, max_q)
            )

    return kernel


def _make_kernel_wide_sdd(leaf_size: int, any_hit: bool, drain: int,
                          dma_leaf: bool = False, drain_first: bool = False):
    """Dual-expand steady-drain: TWO internal expands + `drain` leaf-row
    tests per iteration, all straight-line, ONE vector->scalar extract.

    The two expands' 16-bit child-hit masks exactly fill the one extracted
    int32 (bits 0-15 = top-of-stack node A, 16-31 = node B), so per
    iteration the walk retires up to 32 boxes + `drain` leaf rows against
    a single extract latency — CPU replay (tools/eval_lq.py): bounce
    closest 144 iters vs prod's 664 cond-guarded pops at near-equal leaf
    rows (394 vs 380), bounce any-hit 57 vs 178.

    There is NO room for the any-hit all-done bit, and it does not pay:
    real NEE fronts keep sky-miss lanes un-done forever, so the all-done
    early exit almost never fires (measured: identical iteration counts
    with and without it). Any-hit runs to natural drain-out — done lanes
    mask every hit, so expansion stops feeding the stack within one level.
    DFS order: node B's children are pushed first, then A's, so A's
    subtree (the DFS-earlier one) keeps popping first.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        n_scratch = 4 if dma_leaf else 2
        stack_ref, queue_ref = rest[-n_scratch], rest[-n_scratch + 1]
        if dma_leaf:
            rowbuf_ref, dma_sem = rest[-2], rest[-1]
        stats_out = rest[0] if len(rest) == n_scratch + 1 else None
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        stack_ref[0] = jnp.int32(0)
        # A drain on an empty queue reads slot 0 (index clamp) with its
        # test masked — the slot must still hold an IN-BOUNDS row index.
        queue_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)

        def cond(state):
            return jnp.logical_or(state[0] > 0, state[1] > 0)

        def do_drain(qn, best_t, best_prim, best_u, best_v, done, rows):
            args = (best_t, best_prim, best_u, best_v, done)
            q0 = qn
            if dma_leaf:
                args = _steady_drain(
                    drain, q0, queue_ref, leaf_ref, leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                    dma_leaf=True, rowbuf_ref=rowbuf_ref, dma_sem=dma_sem,
                )
            else:
                args = _steady_drain(
                    drain, q0, queue_ref, leaf_ref, leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                )
            take = jnp.minimum(q0, drain)
            return (q0 - take, *args, rows + take)

        def body(state):
            (sp, qn, best_t, best_prim, best_u, best_v, done, pops,
             rows, max_q) = state
            if drain_first:
                # Drain the PREVIOUS iteration's queue before expanding:
                # the expand culls against the freshest best_t, and the
                # scalar extract at the end of the body overlaps the next
                # iteration's leaf vector work instead of serializing ahead
                # of this one's. Row tests land one iteration later than
                # drain-last — the same deferral class (tie-resolution
                # only; exactness tested).
                (qn, best_t, best_prim, best_u, best_v, done,
                 rows) = do_drain(qn, best_t, best_prim, best_u, best_v,
                                  done, rows)
            active_a = sp > 0
            active_b = sp > 1
            ref_a = jnp.where(active_a, stack_ref[jnp.maximum(sp - 1, 0)],
                              zero_i)
            ref_b = jnp.where(active_b, stack_ref[jnp.maximum(sp - 2, 0)],
                              zero_i)
            sp = jnp.maximum(sp - 2, 0)
            pops = pops + active_a.astype(jnp.int32) \
                + active_b.astype(jnp.int32)

            not_done = done == 0
            packed = jnp.zeros((8, 128), jnp.int32)
            children = []  # [A slots..., B slots...]
            for half, ref in enumerate((ref_a, ref_b)):
                row = node_ref[jnp.maximum(ref, 0)]
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                for c in range(W):
                    tx0 = (row[c] - ox) * ix
                    ty0 = (row[W + c] - oy) * iy
                    tz0 = (row[2 * W + c] - oz) * iz
                    tx1 = (row[3 * W + c] - ox) * ix
                    ty1 = (row[4 * W + c] - oy) * iy
                    tz1 = (row[5 * W + c] - oz) * iz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = (
                        (tfar >= jnp.maximum(tnear, t_min))
                        & (tnear <= best_t)
                        & not_done
                    )
                    packed = packed | (
                        hit.astype(jnp.int32) << (half * W + c)
                    )
                    children.append(row_i[6 * W + c])
            for s in (1, 2, 4):
                packed = packed | pltpu.roll(packed, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                packed = packed | pltpu.roll(packed, s, axis=1)
            word = packed[0, 0]
            empty_a = jnp.int32(0)
            empty_b = jnp.int32(0)
            for c in range(W):
                empty_a = empty_a | (
                    (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                )
                empty_b = empty_b | (
                    (children[W + c] == WIDE_EMPTY).astype(jnp.int32) << c
                )
            mask_a = jnp.where(active_a, word & jnp.int32(0xFFFF) & ~empty_a,
                               0)
            mask_b = jnp.where(
                active_b,
                jax.lax.shift_right_logical(word, 16) & jnp.int32(0xFFFF)
                & ~empty_b,
                0,
            )

            # Push B's children first, then A's: A (the DFS-earlier node)
            # keeps popping first.
            for half, mask in ((1, mask_b), (0, mask_a)):
                for c in range(W):
                    bit = (mask >> c) & 1
                    child = children[half * W + c]
                    is_leaf_c = child < 0
                    leaf_bit = bit * is_leaf_c.astype(jnp.int32)
                    int_bit = bit - leaf_bit

                    @pl.when(leaf_bit == 1)
                    def _(row_idx=-2 - child,
                          at=jnp.minimum(qn, SD_QCAP - 1)):
                        queue_ref[at] = row_idx

                    qn = qn + leaf_bit

                    @pl.when(int_bit == 1)
                    def _(child=child, at=sp):
                        stack_ref[at] = child

                    sp = sp + int_bit
            max_q = jnp.maximum(max_q, qn)

            if not drain_first:
                (qn, best_t, best_prim, best_u, best_v, done,
                 rows) = do_drain(qn, best_t, best_prim, best_u, best_v,
                                  done, rows)
            return (sp, qn, best_t, best_prim, best_u, best_v, done,
                    pops, rows, max_q)

        init = (
            jnp.int32(1),
            jnp.int32(0),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
        )
        (sp, qn, best_t, best_prim, best_u, best_v, done, pops,
         rows, max_q) = jax.lax.while_loop(cond, body, init)
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if stats_out is not None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[0] = jnp.where(
                rid == 0, pops, jnp.where(rid == 1, rows, max_q)
            )

    return kernel


RC_SCAP = 64    # row-cursor per-cursor stack entries (1 per wide-tree level)
RC_QCAP = 192   # row-cursor per-cursor leaf-queue entries (<=16 rows each)


def _pc16(x):
    """Scalar popcount of a 16-bit value (SWAR; no popcount intrinsic
    dependence in Mosaic)."""
    x = x - ((x >> 1) & 0x5555)
    x = (x & 0x3333) + ((x >> 2) & 0x3333)
    x = (x + (x >> 4)) & 0x0F0F
    return (x + (x >> 8)) & 0x1F


def _pc32(x):
    """Scalar popcount of a 32-bit value (SWAR, logical shifts: the sign
    bit is a live mask bit — slot 0 of a bit-reversed width-32 mask)."""
    lsr = jax.lax.shift_right_logical
    x = x - (lsr(x, 1) & jnp.int32(0x55555555))
    x = (x & jnp.int32(0x33333333)) + (lsr(x, 2) & jnp.int32(0x33333333))
    x = (x + lsr(x, 4)) & jnp.int32(0x0F0F0F0F)
    x = x + lsr(x, 8)
    x = x + lsr(x, 16)
    return x & jnp.int32(0x3F)


def _make_kernel_wide_row32(leaf_size: int, any_hit: bool, drain: int,
                            expand: int, dma_leaf: bool = False):
    """Row-cursor traversal over the QUANTIZED width-32 wide tree
    (bvh.wnode_q32 — _quantize_wide32 layout: 3 packed 16-bit plane pairs
    per child in lanes [p*32+c], f32 grid origin/scale header in lanes
    96..101).

    Same scheduling as _make_kernel_wide_row (8 per-sublane-row cursors,
    steady leaf drain, single-pop mask entries), with three deltas:
    - each expand retires 32 boxes per cursor instead of 16 (one VMEM row
      fetch either way — rows cost 512 B at ANY width; this is the whole
      point of quantization: carry 2x more tree per fetch);
    - stack/queue entries are (ptr, mask32) PAIRS in two parallel SMEM
      planes (32 mask bits no longer share an int32 with the pointer;
      node count is no longer capped at 64k);
    - slab operands dequantize on the fly: the whole fetched row converts
      with TWO ops (lo/hi 16-bit halves -> f32) and each plane is one fma
      q*A_k + B_k against per-node A_k = scale_k * inv_d,
      B_k = (origin_k - o_k) * inv_d — fewer vector ops per child than the
      f32 kernel's (b - o) * inv per plane.

    Exactness: quantized boxes are conservative supersets (see
    _quantize_wide32), so the walk visits a superset of the f32 walk's
    nodes and the triangle tests decide. Leaf rows resolve through the
    q32_leaf_perm SMEM table (the leaf table itself stays in the width-16
    collapse order shared by every other kernel).

    Reference role: the traversal scheduling of
    utopian/src/raytracing.rs:113-217 (PREFER_FAST_TRACE BLAS), re-planned
    for packet SIMD + quantized wide nodes.
    """
    W = 32

    def kernel(node_ref, leaf_ref, meta_ref, perm_ref, o_ref, d_ref,
               tlim_ref, t_out, prim_out, u_out, v_out, *rest):
        sptr_ref, smask_ref, qptr_ref, qmask_ref = rest[0:4]
        rowbuf_ref = rest[4] if dma_leaf else None
        dma_sem = rest[5] if dma_leaf else None
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

        n_meta = meta_ref.shape[0] // 4
        dead_row = leaf_ref.shape[0] - 1
        lsr = jax.lax.shift_right_logical
        # Synthetic root: meta row n_meta-1 has int_last=0 and
        # static_int_rev32 = 1<<31, so popping bit 31 expands wide node 0.
        root_mask = jnp.int32(np.uint32(1 << (W - 1)).astype(np.int32))
        for g in range(8):
            sptr_ref[g, 0] = jnp.int32(n_meta - 1)
            smask_ref[g, 0] = root_mask
            qptr_ref[g, 0] = jnp.int32(0)
            qmask_ref[g, 0] = jnp.int32(0)

        def slab_cols(qf_lo, qf_hi, AB, c, best_t, not_done):
            (Ax, Bx), (Ay, By), (Az, Bz) = AB
            tx0 = qf_lo[:, c:c + 1] * Ax + Bx
            ty0 = qf_hi[:, c:c + 1] * Ay + By
            tz0 = qf_lo[:, W + c:W + c + 1] * Az + Bz
            tx1 = qf_hi[:, W + c:W + c + 1] * Ax + Bx
            ty1 = qf_lo[:, 2 * W + c:2 * W + c + 1] * Ay + By
            tz1 = qf_hi[:, 2 * W + c:2 * W + c + 1] * Az + Bz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            return ((tfar >= jnp.maximum(tnear, t_min))
                    & (tnear <= best_t) & not_done)

        def tri_tests_cols(lrows, args):
            best_t, best_prim, best_u, best_v, done = args
            lrows_i = jax.lax.bitcast_convert_type(lrows, jnp.int32)
            alive = done == 0
            cands = []
            hits = []
            for s in range(leaf_size):
                b = s * 9
                col = lambda k: lrows[:, b + k:b + k + 1]
                v0x, v0y, v0z = col(0), col(1), col(2)
                e1x, e1y, e1z = col(3), col(4), col(5)
                e2x, e2y, e2z = col(6), col(7), col(8)
                tri = lrows_i[:, 9 * leaf_size + s:9 * leaf_size + s + 1]
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
                ok = (
                    (tri >= 0)
                    & (jnp.abs(det) > 1e-12)
                    & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > t_min) & (t < best_t)
                    & alive
                )
                if any_hit:
                    hits.append(ok)
                    continue
                cands.append((
                    jnp.where(ok, t, 3.0e38),
                    jnp.where(ok, jnp.broadcast_to(tri, ok.shape), -1),
                    u, v,
                ))
            if any_hit:
                while len(hits) > 1:
                    hits = [
                        jnp.logical_or(hits[i], hits[i + 1])
                        if i + 1 < len(hits) else hits[i]
                        for i in range(0, len(hits), 2)
                    ]
                hit_any = hits[0]
                best_prim = jnp.where(hit_any, jnp.int32(0), best_prim)
                done = jnp.maximum(done, hit_any.astype(jnp.int32))
                return best_t, best_prim, best_u, best_v, done

            def merge(a, b):
                ta, pa, ua, va = a
                tb, pb, ub, vb = b
                take_b = tb < ta
                return (
                    jnp.where(take_b, tb, ta),
                    jnp.where(take_b, pb, pa),
                    jnp.where(take_b, ub, ua),
                    jnp.where(take_b, vb, va),
                )

            while len(cands) > 1:
                cands = [
                    merge(cands[i], cands[i + 1])
                    if i + 1 < len(cands) else cands[i]
                    for i in range(0, len(cands), 2)
                ]
            t_c, p_c, u_c, v_c = cands[0]
            improved = t_c < best_t
            best_t = jnp.where(improved, t_c, best_t)
            best_prim = jnp.where(improved, p_c, best_prim)
            best_u = jnp.where(improved, u_c, best_u)
            best_v = jnp.where(improved, v_c, best_v)
            return best_t, best_prim, best_u, best_v, done

        def cond(state):
            pend = state[0]
            for k in range(1, 16):
                pend = pend | state[k]
            return pend > 0

        def body(state):
            sps = list(state[0:8])
            qns = list(state[8:16])
            best_t, best_prim, best_u, best_v, done = state[16:21]
            not_done = done == 0

            # Pops: per expand slot, each cursor decodes one bit off its
            # top (ptr, mask32) stack pair (masks bit-reversed: low bit =
            # highest slot = production visit order).
            exp_ptrs = []
            for _e in range(expand):
                ptrs = []
                for g in range(8):
                    sp = sps[g]
                    has = sp > 0
                    at = jnp.maximum(sp - 1, 0)
                    m = smask_ref[g, at]
                    m = jnp.where(has, m, 0)
                    low = m & -m
                    rest_m = m ^ low
                    pn = sptr_ref[g, at]

                    @pl.when(rest_m != 0)
                    def _(g=g, at=at, v=m ^ low):
                        smask_ref[g, at] = v

                    sps[g] = jnp.where(has & (rest_m == 0), sp - 1, sp)
                    st_int = meta_ref[4 * pn + 2]
                    child = meta_ref[4 * pn] - _pc32(st_int & (low - 1))
                    ptrs.append((jnp.where(has, child, 0), has))
                exp_ptrs.append(ptrs)

            # Expands: one (8, 128) int32 node tile per expand slot; the
            # whole tile dequantizes with two halfword->f32 converts, then
            # each child's slab is 6 fma against per-node A/B.
            packed = [jnp.zeros((8, 128), jnp.int32) for _ in range(expand)]
            for e in range(expand):
                rows = jnp.concatenate(
                    [node_ref[pl.ds(exp_ptrs[e][g][0], 1)] for g in range(8)],
                    axis=0)
                hdr = jax.lax.bitcast_convert_type(rows, jnp.float32)
                qf_lo = (rows & jnp.int32(0xFFFF)).astype(jnp.float32)
                qf_hi = lsr(rows, 16).astype(jnp.float32)
                AB = []
                for k, (o_k, i_k) in enumerate(((ox, ix), (oy, iy),
                                                (oz, iz))):
                    sc = hdr[:, 99 + k:100 + k]
                    og = hdr[:, 96 + k:97 + k]
                    AB.append((sc * i_k, (og - o_k) * i_k))
                for c in range(W):
                    hit = slab_cols(qf_lo, qf_hi, AB, c, best_t, not_done)
                    packed[e] = packed[e] | (
                        hit.astype(jnp.int32) << (W - 1 - c))
            for s in (1, 2, 4, 8, 16, 32, 64):
                for e in range(expand):
                    packed[e] = packed[e] | pltpu.roll(packed[e], s, axis=1)

            words = {}
            for e in range(expand):
                for g in range(8):
                    words[(e, g)] = packed[e][g, 0]

            # Pushes: ONE (ptr, mask) pair per expanded node per kind.
            # Expand slot 1 (the DFS-later node) pushes BEFORE slot 0.
            for e in range(expand - 1, -1, -1):
                for g in range(8):
                    ptr, act = exp_ptrs[e][g]
                    m32 = jnp.where(act, words[(e, g)], 0)
                    int_hit = m32 & meta_ref[4 * ptr + 2]
                    leaf_hit = m32 & meta_ref[4 * ptr + 3]

                    @pl.when(int_hit != 0)
                    def _(g=g, at=jnp.minimum(sps[g], RC_SCAP - 1), p=ptr,
                          v=int_hit):
                        sptr_ref[g, at] = p
                        smask_ref[g, at] = v

                    sps[g] = jnp.minimum(
                        sps[g] + (int_hit != 0).astype(jnp.int32), RC_SCAP)

                    @pl.when(leaf_hit != 0)
                    def _(g=g, at=jnp.minimum(qns[g], RC_QCAP - 1), p=ptr,
                          v=leaf_hit):
                        qptr_ref[g, at] = p
                        qmask_ref[g, at] = v

                    qns[g] = jnp.minimum(
                        qns[g] + (leaf_hit != 0).astype(jnp.int32), RC_QCAP)

            # Steady drain: per slot, each cursor decodes one leaf row off
            # its top queue pair; q32 leaf ids resolve through perm_ref.
            args = (best_t, best_prim, best_u, best_v, done)
            slot_rows = []
            for _k in range(drain):
                rows_idx = []
                for g in range(8):
                    qn = qns[g]
                    has = qn > 0
                    at = jnp.maximum(qn - 1, 0)
                    m = qmask_ref[g, at]
                    m = jnp.where(has, m, 0)
                    low = m & -m
                    rest_m = m ^ low
                    pn = qptr_ref[g, at]

                    @pl.when(rest_m != 0)
                    def _(g=g, at=at, v=m ^ low):
                        qmask_ref[g, at] = v

                    qns[g] = jnp.where(has & (rest_m == 0), qn - 1, qn)
                    st_leaf = meta_ref[4 * pn + 3]
                    li = meta_ref[4 * pn + 1] - _pc32(st_leaf & (low - 1))
                    row = perm_ref[jnp.maximum(li, 0)]
                    rows_idx.append(jnp.where(has, row, dead_row))
                slot_rows.append(rows_idx)
            if dma_leaf:
                dmas = []
                for k in range(drain):
                    for g in range(8):
                        dma = pltpu.make_async_copy(
                            leaf_ref.at[pl.ds(slot_rows[k][g], 1)],
                            rowbuf_ref.at[pl.ds(k * 8 + g, 1)],
                            dma_sem.at[k * 8 + g],
                        )
                        dma.start()
                        dmas.append(dma)
                for k in range(drain):
                    for g in range(8):
                        dmas[k * 8 + g].wait()
                    args = tri_tests_cols(rowbuf_ref[pl.ds(k * 8, 8)], args)
            else:
                for k in range(drain):
                    lrows = jnp.concatenate(
                        [leaf_ref[pl.ds(slot_rows[k][g], 1)]
                         for g in range(8)],
                        axis=0)
                    args = tri_tests_cols(lrows, args)
            best_t, best_prim, best_u, best_v, done = args
            return (*sps, *qns, best_t, best_prim, best_u, best_v, done)

        init = tuple(jnp.int32(1) for _ in range(8)) + tuple(
            jnp.int32(0) for _ in range(8)) + (
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
        )
        out = jax.lax.while_loop(cond, body, init)
        best_t, best_prim, best_u, best_v = out[16:20]
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


def _make_kernel_wide_row(leaf_size: int, any_hit: bool, drain: int,
                          expand: int, dma_leaf: bool = False,
                          overflow_stats: bool = False,
                          cursor_kill: bool = False,
                          skip_expand: bool = False,
                          skip_drain: bool = False,
                          phase_stats: bool = False):
    """Row-cursor traversal: EIGHT independent walk cursors per block, one
    per (1,128) sublane row of the packet.

    The packet-union width is the structural traversal bound (a block walks
    the union of its 1024 lanes' node sets — PERFORMANCE.md round 3). Eight
    cursors walk eight 128-lane unions instead; with Morton-compacted lane
    order the per-row unions are narrow, and the replay measures 0.30-0.50x
    iterations (max over cursors) vs the production dual-expand drain. The
    per-iteration VECTOR work is unchanged: a slot test carries a DIFFERENT
    node per sublane for free — each expand gathers its 8 cursors' node
    rows into one (8, cols) tile (8 dynamic slices) and the slab operands
    are (8,1) column slices instead of scalar broadcasts; leaf drains
    likewise retire 8 rows (one per cursor) per slot at the vector cost of
    one.

    Per-bit child pushes would eat the win on the scalar side (measured
    1.24-1.91x per-iteration — tools/probe_rowcursor.py); instead stack and
    queue entries are ONE WORD, (node_ptr << 16) | hitmask, decoded at pop
    time with ffs + SWAR popcount against the node's static child-kind
    masks (bvh.wnode_meta, SMEM-resident: [int_last, leaf_last,
    static_int_rev | static_leaf_rev << 16]). The wide collapse allocates
    each node's internal children contiguously and _finalize reorders leaf
    rows to match, so a popped bit's child pointer is last - rank. Masks
    are bit-REVERSED (bit 15-slot) so lowest-bit-first decode preserves
    the production kernels' highest-slot-first visit order (slot order is
    perf-sensitive: PERFORMANCE.md round-3 dirpush).

    expand=1 or 2 node expands per cursor per iteration; `drain` leaf rows
    per cursor per iteration (steady drain, no conds on the vector path).
    Reference role: the traversal scheduling of
    utopian/src/raytracing.rs:113-217, re-planned for packet SIMD.

    dma_leaf: the leaf table stays in HBM and each drain slot's 8 cursor
    rows arrive by async copy into a VMEM row buffer — all drain*8 fetches
    START before the first wait (row indices are known up front), same
    pipelining as _steady_drain's DMA mode. This lifts the row-cursor
    kernel to Sponza-scale trees whose leaf table exceeds VMEM.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_WIDTH as W
    assert W == 16

    assert not (overflow_stats and phase_stats)

    def kernel(node_ref, leaf_ref, meta_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        if overflow_stats or phase_stats:
            ovf_out, rest = rest[0], rest[1:]
        stack_ref, queue_ref = rest[0], rest[1]
        rowbuf_ref = rest[2] if dma_leaf else None
        dma_sem = rest[3] if dma_leaf else None
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

        n_meta = meta_ref.shape[0] // 3  # flat (N*3,): SMEM pads 2D rows to 512 B
        dead_row = leaf_ref.shape[0] - 1  # all-pad row appended at launch
        lsr = jax.lax.shift_right_logical
        # Synthetic root entry: meta row n_meta-1 has int_last=0 and
        # static_int_rev = 1<<15, so popping bit 15 expands wide node 0.
        # Built via uint32 wrap: for n_meta-1 >= 2^15 the Python-int value
        # exceeds int32 range and jnp.int32(...) would raise at trace time.
        # Kernel-side decode uses lsr(ent, 16), so the sign bit is benign.
        root_entry = jnp.int32(np.uint32(
            ((n_meta - 1) << 16) | (1 << (W - 1))).astype(np.int32))
        for g in range(8):
            stack_ref[g, 0] = root_entry
            queue_ref[g, 0] = jnp.int32(0)

        def slab_cols(rows, c, best_t, not_done):
            b = lambda k: rows[:, k * W + c:k * W + c + 1]
            tx0 = (b(0) - ox) * ix
            ty0 = (b(1) - oy) * iy
            tz0 = (b(2) - oz) * iz
            tx1 = (b(3) - ox) * ix
            ty1 = (b(4) - oy) * iy
            tz1 = (b(5) - oz) * iz
            tnear = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            tfar = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            return ((tfar >= jnp.maximum(tnear, t_min))
                    & (tnear <= best_t) & not_done)

        def tri_tests_cols(lrows, args):
            """12 slot tests; each sublane tests ITS cursor's leaf row."""
            best_t, best_prim, best_u, best_v, done = args
            lrows_i = jax.lax.bitcast_convert_type(lrows, jnp.int32)
            alive = done == 0
            cands = []
            hits = []
            for s in range(leaf_size):
                b = s * 9
                col = lambda k: lrows[:, b + k:b + k + 1]
                v0x, v0y, v0z = col(0), col(1), col(2)
                e1x, e1y, e1z = col(3), col(4), col(5)
                e2x, e2y, e2z = col(6), col(7), col(8)
                tri = lrows_i[:, 9 * leaf_size + s:9 * leaf_size + s + 1]
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
                ok = (
                    (tri >= 0)
                    & (jnp.abs(det) > 1e-12)
                    & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > t_min) & (t < best_t)
                    & alive
                )
                if any_hit:
                    hits.append(ok)
                    continue
                cands.append((
                    jnp.where(ok, t, 3.0e38),
                    jnp.where(ok, jnp.broadcast_to(tri, ok.shape), -1),
                    u, v,
                ))
            if any_hit:
                while len(hits) > 1:
                    hits = [
                        jnp.logical_or(hits[i], hits[i + 1])
                        if i + 1 < len(hits) else hits[i]
                        for i in range(0, len(hits), 2)
                    ]
                hit_any = hits[0]
                best_prim = jnp.where(hit_any, jnp.int32(0), best_prim)
                done = jnp.maximum(done, hit_any.astype(jnp.int32))
                return best_t, best_prim, best_u, best_v, done

            def merge(a, b):
                ta, pa, ua, va = a
                tb, pb, ub, vb = b
                take_b = tb < ta
                return (
                    jnp.where(take_b, tb, ta),
                    jnp.where(take_b, pb, pa),
                    jnp.where(take_b, ub, ua),
                    jnp.where(take_b, vb, va),
                )

            while len(cands) > 1:
                cands = [
                    merge(cands[i], cands[i + 1])
                    if i + 1 < len(cands) else cands[i]
                    for i in range(0, len(cands), 2)
                ]
            t_c, p_c, u_c, v_c = cands[0]
            improved = t_c < best_t
            best_t = jnp.where(improved, t_c, best_t)
            best_prim = jnp.where(improved, p_c, best_prim)
            best_u = jnp.where(improved, u_c, best_u)
            best_v = jnp.where(improved, v_c, best_v)
            return best_t, best_prim, best_u, best_v, done

        def cond(state):
            pend = state[0]
            for k in range(1, 16):
                pend = pend | state[k]
            return pend > 0

        def body(state):
            sps = list(state[0:8])
            qns = list(state[8:16])
            best_t, best_prim, best_u, best_v, done = state[16:21]
            so_cnt = state[21] if overflow_stats else None
            qo_cnt = state[22] if overflow_stats else None
            if phase_stats:
                it_cnt, ld_cnt, le_cnt, se_cnt, qe_cnt = state[21:26]
                it_cnt = it_cnt + 1
                pre_stack = sps[0]
                for g in range(1, 8):
                    pre_stack = pre_stack | sps[g]
                se_cnt = se_cnt + (pre_stack == 0).astype(jnp.int32)
            not_done = done == 0

            if cursor_kill:
                # Any-hit cursor kill (VERDICT r4 #3c): a cursor whose 128
                # lanes are ALL retired (occluded/degenerate) finds nothing
                # more, but still pops its remaining stack one BIT per
                # iteration — and the while loop runs to the slowest
                # cursor. Clearing its stack+queue removes it from that
                # max. Cost: 7 lane-rolls + 8 scalar extracts/iteration.
                al = not_done.astype(jnp.int32)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    al = al | pltpu.roll(al, s, axis=1)
                for g in range(8):
                    alive_g = al[g, 0] != 0
                    sps[g] = jnp.where(alive_g, sps[g], 0)
                    qns[g] = jnp.where(alive_g, qns[g], 0)

            if skip_expand:
                # Leaf-tail phase detector (VERDICT r4 #3): on divergent
                # fronts the per-cursor iteration bound is the LEAF term —
                # stacks empty out while queues keep draining, and every
                # tail iteration still pays the full expand (16 node-row
                # fetches + 32 slab columns) against node 0 for nothing.
                # One scalar branch skips that vector work.
                have_stack = sps[0]
                for g in range(1, 8):
                    have_stack = have_stack | sps[g]
                have_stack = have_stack > 0

            # Pops: per expand slot, each cursor decodes one bit off its
            # top stack entry (ptr<<16 | hitmask; masks bit-reversed so the
            # low bit is the highest slot = production visit order).
            exp_ptrs = []   # expand-major: [e][g] -> (child_ptr, active)
            for _e in range(expand):
                ptrs = []
                for g in range(8):
                    sp = sps[g]
                    has = sp > 0
                    ent = stack_ref[g, jnp.maximum(sp - 1, 0)]
                    m = ent & jnp.int32(0xFFFF)
                    m = jnp.where(has, m, 0)
                    low = m & -m
                    rest = m ^ low
                    pn = lsr(ent, 16)

                    @pl.when(rest != 0)
                    def _(g=g, at=jnp.maximum(sp - 1, 0), v=ent ^ low):
                        stack_ref[g, at] = v

                    sps[g] = jnp.where(has & (rest == 0), sp - 1, sp)
                    st_int = meta_ref[3 * pn + 2] & jnp.int32(0xFFFF)
                    child = meta_ref[3 * pn] - _pc16(st_int & (low - 1))
                    ptrs.append((jnp.where(has, child, 0), has))
                    if phase_stats:
                        le_cnt = le_cnt + has.astype(jnp.int32)
                exp_ptrs.append(ptrs)

            # Expands: one (8, cols) gathered node tile per expand slot;
            # each sublane's slab operands are its own cursor's node.
            # Slots 0-1 pack into one int32 per sublane; slots 2+ fill a
            # SECOND packed word (int32 shifts >= 32 would silently drop
            # hits — caught by test_pallas_row_cursor_expand3).
            def _expand_words():
                packed = jnp.zeros((8, 128), jnp.int32)
                packed_b = (jnp.zeros((8, 128), jnp.int32)
                            if expand > 2 else None)
                for e in range(expand):
                    rows = jnp.concatenate(
                        [node_ref[pl.ds(exp_ptrs[e][g][0], 1)]
                         for g in range(8)],
                        axis=0)
                    for c in range(W):
                        hit = slab_cols(rows, c, best_t, not_done)
                        # bit-reversed position, expand e in [16e, 16e+16)
                        if e < 2:
                            packed = packed | (
                                hit.astype(jnp.int32)
                                << (e * W + (W - 1 - c)))
                        else:
                            packed_b = packed_b | (
                                hit.astype(jnp.int32)
                                << ((e - 2) * W + (W - 1 - c)))
                for s in (1, 2, 4, 8, 16, 32, 64):
                    packed = packed | pltpu.roll(packed, s, axis=1)
                    if packed_b is not None:
                        packed_b = packed_b | pltpu.roll(packed_b, s, axis=1)

                # Mask extraction: expand=2 fills int32 per sublane (8
                # extracts); expand=1 pairs sublanes into 4 words; 3/4 add
                # the second word's extracts (paired when only slot 2 is
                # present).
                ws = []
                if expand >= 2:
                    for g in range(8):
                        ws.append(packed[g, 0])
                else:
                    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    hi = jnp.where(rid % 2 == 1, packed << 16, 0)
                    lo = jnp.where(rid % 2 == 0, packed, 0)
                    comb = lo | pltpu.roll(hi, 7, axis=0)
                    for g2 in range(0, 8, 2):
                        w = comb[g2, 0]
                        ws.append(w & jnp.int32(0xFFFF))
                        ws.append(lsr(w, 16))
                if expand == 4:
                    for g in range(8):
                        ws.append(packed_b[g, 0])
                elif expand == 3:
                    rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                    hi = jnp.where(rid % 2 == 1, packed_b << 16, 0)
                    lo = jnp.where(rid % 2 == 0, packed_b, 0)
                    comb = lo | pltpu.roll(hi, 7, axis=0)
                    for g2 in range(0, 8, 2):
                        w = comb[g2, 0]
                        ws.append(w & jnp.int32(0xFFFF))
                        ws.append(lsr(w, 16))
                return tuple(ws)

            n_words = 8 if expand <= 2 else 16
            if skip_expand:
                ws = jax.lax.cond(
                    have_stack, _expand_words,
                    lambda: tuple(jnp.int32(0) for _ in range(n_words)))
            else:
                ws = _expand_words()
            words = {g: ws[g] for g in range(8)}
            words_b = {g: ws[8 + g] for g in range(8)} if expand > 2 else {}

            # Pushes: ONE entry per expanded node per kind (internal mask
            # to the stack, leaf mask to the queue) — no per-child scalars.
            # Expand slot 1 (the DFS-later node) pushes BEFORE slot 0 so
            # slot 0's subtree keeps popping first (matches sdd).
            for e in range(expand - 1, -1, -1):
                for g in range(8):
                    ptr, act = exp_ptrs[e][g]
                    w = words[g] if e < 2 else words_b[g]
                    m16 = (lsr(w, 16 * (e % 2)) & jnp.int32(0xFFFF))
                    m16 = jnp.where(act, m16, 0)
                    m2 = meta_ref[3 * ptr + 2]
                    int_hit = m16 & m2 & jnp.int32(0xFFFF)
                    leaf_hit = m16 & (lsr(m2, 16) & jnp.int32(0xFFFF))
                    ent_i = (ptr << 16) | int_hit
                    ent_l = (ptr << 16) | leaf_hit

                    @pl.when(int_hit != 0)
                    def _(g=g, at=jnp.minimum(sps[g], RC_SCAP - 1), v=ent_i):
                        stack_ref[g, at] = v

                    # Overflow clamps (overwrites the top entry) rather than
                    # running off the buffer — same degradation class as the
                    # sdd queue; capacities are sized far above measured
                    # peaks (stack <= wide_depth+1 entries by construction;
                    # the launch site falls back to steady-drain when the
                    # static bound exceeds RC_SCAP). overflow_stats=True
                    # (opt-in: it adds scalar ops to a scalar-bound loop)
                    # counts clamped pushes so a capacity breach surfaces
                    # as a diagnostic instead of quiet image corruption.
                    if overflow_stats:
                        so_cnt = so_cnt + (
                            (int_hit != 0) & (sps[g] >= RC_SCAP)
                        ).astype(jnp.int32)
                    sps[g] = jnp.minimum(
                        sps[g] + (int_hit != 0).astype(jnp.int32), RC_SCAP)

                    @pl.when(leaf_hit != 0)
                    def _(g=g, at=jnp.minimum(qns[g], RC_QCAP - 1), v=ent_l):
                        queue_ref[g, at] = v

                    if overflow_stats:
                        qo_cnt = qo_cnt + (
                            (leaf_hit != 0) & (qns[g] >= RC_QCAP)
                        ).astype(jnp.int32)
                    qns[g] = jnp.minimum(
                        qns[g] + (leaf_hit != 0).astype(jnp.int32), RC_QCAP)

            # Steady drain: per slot, each cursor decodes one leaf ROW off
            # its top queue entry (empty queues test the dead row). Pops
            # for ALL slots run first so DMA mode can overlap every fetch.
            args = (best_t, best_prim, best_u, best_v, done)
            if phase_stats:
                pre_q = qns[0]
                for g in range(1, 8):
                    pre_q = pre_q | qns[g]
                qe_cnt = qe_cnt + (pre_q == 0).astype(jnp.int32)

            def _drain_phase(qns_in, args, ld_cnt=None):
                qns_l = list(qns_in)
                slot_rows = []
                for _k in range(drain):
                    rows_idx = []
                    for g in range(8):
                        qn = qns_l[g]
                        has = qn > 0
                        if ld_cnt is not None:
                            ld_cnt = ld_cnt + has.astype(jnp.int32)
                        ent = queue_ref[g, jnp.maximum(qn - 1, 0)]
                        m = ent & jnp.int32(0xFFFF)
                        m = jnp.where(has, m, 0)
                        low = m & -m
                        rest = m ^ low
                        pn = lsr(ent, 16)

                        @pl.when(rest != 0)
                        def _(g=g, at=jnp.maximum(qn - 1, 0), v=ent ^ low):
                            queue_ref[g, at] = v

                        qns_l[g] = jnp.where(has & (rest == 0), qn - 1, qn)
                        st_leaf = lsr(meta_ref[3 * pn + 2], 16) & jnp.int32(
                            0xFFFF)
                        row = meta_ref[3 * pn + 1] - _pc16(st_leaf & (low - 1))
                        rows_idx.append(jnp.where(has, row, dead_row))
                    slot_rows.append(rows_idx)
                if dma_leaf:
                    dmas = []
                    for k in range(drain):
                        for g in range(8):
                            dma = pltpu.make_async_copy(
                                leaf_ref.at[pl.ds(slot_rows[k][g], 1)],
                                rowbuf_ref.at[pl.ds(k * 8 + g, 1)],
                                dma_sem.at[k * 8 + g],
                            )
                            dma.start()
                            dmas.append(dma)
                    for k in range(drain):
                        for g in range(8):
                            dmas[k * 8 + g].wait()
                        args = tri_tests_cols(rowbuf_ref[pl.ds(k * 8, 8)],
                                              args)
                else:
                    for k in range(drain):
                        lrows = jnp.concatenate(
                            [leaf_ref[pl.ds(slot_rows[k][g], 1)]
                             for g in range(8)],
                            axis=0)
                        args = tri_tests_cols(lrows, args)
                if ld_cnt is not None:
                    return (*qns_l, *args, ld_cnt)
                return (*qns_l, *args)

            if skip_drain:
                # Drain-skip (phase-stats-measured, VERDICT r4 #3): the
                # drain's 3x12-slot MT passes are the dominant per-
                # iteration vector cost, and on real fronts only 23-54% of
                # drain slots are live — iterations where EVERY queue is
                # empty (interior descent, post-drain tails, dead blocks)
                # pay it all for dead rows. One scalar branch skips the
                # whole phase; with all queues empty it is exactly a no-op.
                assert not phase_stats, "skip_drain excludes phase_stats"
                any_q = qns[0]
                for g in range(1, 8):
                    any_q = any_q | qns[g]
                out_d = jax.lax.cond(
                    any_q > 0,
                    lambda: _drain_phase(tuple(qns), args),
                    lambda: (*qns, *args))
            else:
                out_d = _drain_phase(
                    tuple(qns), args, ld_cnt if phase_stats else None)
                if phase_stats:
                    ld_cnt = out_d[13]
            qns = list(out_d[0:8])
            args = out_d[8:13]
            best_t, best_prim, best_u, best_v, done = args
            tail = ()
            if overflow_stats:
                tail = (so_cnt, qo_cnt)
            elif phase_stats:
                tail = (it_cnt, ld_cnt, le_cnt, se_cnt, qe_cnt)
            return (*sps, *qns, best_t, best_prim, best_u, best_v, done,
                    *tail)

        init = tuple(jnp.int32(1) for _ in range(8)) + tuple(
            jnp.int32(0) for _ in range(8)) + (
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
        )
        if overflow_stats:
            init = init + (jnp.int32(0), jnp.int32(0))
        elif phase_stats:
            init = init + tuple(jnp.int32(0) for _ in range(5))
        out = jax.lax.while_loop(cond, body, init)
        best_t, best_prim, best_u, best_v = out[16:20]
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if overflow_stats:
            # Row 0 = clamped stack pushes, row 1 = clamped queue pushes
            # (block totals, broadcast across lanes).
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            ovf_out[0] = jnp.where(
                rid == 0, out[21], jnp.where(rid == 1, out[22], 0))
        elif phase_stats:
            # Phase diagnostics (VERDICT r4 #3): row 0 = iterations, row 1
            # = live drain pops (of iters*8*drain slots), row 2 = live
            # expand pops (of iters*8*expand), row 3 = all-stacks-empty
            # iterations, row 4 = all-queues-empty iterations.
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            acc = jnp.zeros((8, 128), jnp.int32)
            for r, val in enumerate(out[21:26]):
                acc = jnp.where(rid == r, val, acc)
            ovf_out[0] = acc

    return kernel


def _make_kernel_wide_dual(leaf_size: int, any_hit: bool,
                           dma_leaf: bool = False):
    """BVH-wide stack traversal popping TWO nodes per iteration.

    The wide walk is latency-bound on its one vector->scalar extract per
    iteration (~0.87 us against ~0.12 us of vector work; PERFORMANCE.md
    round-3 while16 probe). The multi-block kernel amortized that latency
    across independent ray blocks but lost on real fronts to cross-block
    tail waste (blocks finish at different times) — here both pops come
    from the SAME stack serving the SAME front, so there is no tail: the
    two 16-bit child masks are shifted into disjoint halves of ONE 32-bit
    word and the pair shares a single OR-tree + extract. When the stack
    holds only one entry the second slot expands the root with its mask
    forced to zero (wasted vector work, no correctness effect). A leaf
    pop's any-lane-alive bit rides in bit 0 of its half-word (the mask
    bits are unused on leaf pops), so any-hit leaf pops no longer pay
    their own private reduction either.

    Traversal ORDER differs from the single-pop kernel (the second node is
    popped before the first one's children are pushed) but the visited set
    is identical and closest-hit results are exact; the second node's box
    tests read best_t as updated by the first node's leaf tests — pure
    vector dataflow, so the extra culling is free.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W
    assert 2 * W <= 32, "dual-pop packs two child masks into one int32"
    half_mask = (1 << W) - 1

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, *rest):
        n_scratch = 3 if dma_leaf else 1
        stack_ref = rest[-n_scratch]
        if dma_leaf:
            rowbuf_ref, dma_sem = rest[-2], rest[-1]
        stats_out = rest[0] if len(rest) == n_scratch + 1 else None
        ox = o_ref[0, 0]
        oy = o_ref[0, 1]
        oz = o_ref[0, 2]
        dx = d_ref[0, 0]
        dy = d_ref[0, 1]
        dz = d_ref[0, 2]
        t_min = tlim_ref[0, 0]
        t_max = tlim_ref[0, 1]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = 1.0 / safe(dx)
        iy = 1.0 / safe(dy)
        iz = 1.0 / safe(dz)
        degenerate = ((dx * dx + dy * dy + dz * dz) < 1e-12).astype(jnp.int32)

        def leaf_tests(leaf, args):
            if dma_leaf:
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(jnp.maximum(leaf, 0), 1)],
                    rowbuf_ref, dma_sem,
                )
                dma.start()
                dma.wait()
                return _leaf_tests_from_row(
                    rowbuf_ref[0], leaf_size, any_hit,
                    ox, oy, oz, dx, dy, dz, t_min, args,
                )
            return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                               ox, oy, oz, dx, dy, dz, t_min, args)

        stack_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)
        zero_v = jnp.zeros((8, 128), jnp.int32)

        def process(ref, bests):
            """Expand one popped ref. Returns (bests, halfvec, children,
            empty_bits): halfvec is the un-reduced (8,128) bit vector —
            child mask for internal pops, the alive flag in bit 0 for
            any-hit leaf pops."""
            is_leaf = ref < 0

            def do_leaf(args):
                out = leaf_tests(-2 - ref, args)
                if any_hit:
                    halfvec = (out[4] == 0).astype(jnp.int32)
                else:
                    halfvec = zero_v
                return out + (halfvec, *(zero_i,) * (W + 1))

            def do_internal(args):
                best_t, best_prim, best_u, best_v, done = args
                row = node_ref[jnp.maximum(ref, 0)]
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                not_done = done == 0
                children = []
                packed = zero_v
                for c in range(W):
                    tx0 = (row[c] - ox) * ix
                    ty0 = (row[W + c] - oy) * iy
                    tz0 = (row[2 * W + c] - oz) * iz
                    tx1 = (row[3 * W + c] - ox) * ix
                    ty1 = (row[4 * W + c] - oy) * iy
                    tz1 = (row[5 * W + c] - oz) * iz
                    tnear = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1),
                    )
                    tfar = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1),
                    )
                    hit = (
                        (tfar >= jnp.maximum(tnear, t_min))
                        & (tnear <= best_t)
                        & not_done
                    )
                    packed = packed | (hit.astype(jnp.int32) << c)
                    children.append(row_i[6 * W + c])
                empty_bits = jnp.int32(0)
                for c in range(W):
                    empty_bits = empty_bits | (
                        (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                    )
                return (best_t, best_prim, best_u, best_v, done,
                        packed, *children, empty_bits)

            res = jax.lax.cond(is_leaf, do_leaf, do_internal, bests)
            return (res[:5], res[5], list(res[6:6 + W]), res[6 + W],
                    is_leaf)

        def cond(state):
            return state[0] > 0

        def body(state):
            (sp, best_t, best_prim, best_u, best_v, done, iters,
             leaf_pops) = state
            ref_a = stack_ref[sp - 1]
            has_b = (sp >= 2).astype(jnp.int32)
            # An absent second pop expands the root with its mask zeroed
            # below — never a junk leaf index.
            ref_b = jnp.where(has_b == 1,
                              stack_ref[jnp.maximum(sp - 2, 0)], zero_i)
            sp = sp - 1 - has_b

            bests = (best_t, best_prim, best_u, best_v, done)
            bests, half_a, children_a, empty_a, leaf_a = process(ref_a, bests)
            bests, half_b, children_b, empty_b, leaf_b = process(ref_b, bests)
            best_t, best_prim, best_u, best_v, done = bests
            iters = iters + 1 + has_b
            leaf_pops = (leaf_pops + leaf_a.astype(jnp.int32)
                         + jnp.logical_and(leaf_b, has_b == 1).astype(jnp.int32))

            combined = half_a | (half_b << W)
            for s in (1, 2, 4):
                combined = combined | pltpu.roll(combined, s, axis=0)
            for s in (1, 2, 4, 8, 16, 32, 64):
                combined = combined | pltpu.roll(combined, s, axis=1)
            word = combined[0, 0]
            w_a = word & half_mask
            w_b = (word >> W) & half_mask
            mask_a = jnp.where(leaf_a, 0, w_a & ~empty_a)
            mask_b = jnp.where(jnp.logical_or(leaf_b, has_b == 0),
                               0, w_b & ~empty_b)

            # B's children go on the stack FIRST so A's children end on
            # top: the next pair then keeps descending A's subtree, which
            # preserves the single-pop kernel's near-DFS order (leaves
            # reached early, best_t tightens early). The A-first order
            # measured 8-16% MORE pops on closest-hit fronts (breadth
            # creep into the older subtree).
            for c in range(W):
                bit = (mask_b >> c) & 1

                @pl.when(bit == 1)
                def _(child=children_b[c], at=sp):
                    stack_ref[at] = child

                sp = sp + bit
            for c in range(W):
                bit = (mask_a >> c) & 1

                @pl.when(bit == 1)
                def _(child=children_a[c], at=sp):
                    stack_ref[at] = child

                sp = sp + bit

            if any_hit:
                dead_a = jnp.logical_and(leaf_a, (w_a & 1) == 0)
                dead_b = jnp.logical_and(
                    jnp.logical_and(leaf_b, has_b == 1), (w_b & 1) == 0
                )
                sp = jnp.where(jnp.logical_or(dead_a, dead_b), 0, sp)
            return (sp, best_t, best_prim, best_u, best_v, done, iters,
                    leaf_pops)

        init = (
            jnp.int32(1),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),  # pops (both slots count)
            jnp.int32(0),
        )
        (sp, best_t, best_prim, best_u, best_v, done, iters,
         leaf_pops) = jax.lax.while_loop(cond, body, init)
        t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
        prim_out[0] = best_prim
        u_out[0] = best_u
        v_out[0] = best_v
        if stats_out is not None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[0] = jnp.where(rid == 0, iters, leaf_pops)

    return kernel


def _make_kernel_wide_multi(leaf_size: int, any_hit: bool, nblocks: int,
                            dma_leaf: bool = False):
    """BVH8 stack traversal with NBLOCKS independent ray blocks co-resident
    in one grid step — the latency-interleaving kernel.

    Counter instrumentation showed the wide walk is LATENCY-bound on its one
    vector->scalar reduction per iteration (~1.4 us/iter against ~0.1-0.4 us
    of vector work; PERFORMANCE.md round-2 finding 1). Here each iteration
    pops one node per still-active block (independent stacks + cursors in
    SMEM) and defers ALL cross-vector reductions to a shared tail: the
    nblocks extracts issue back-to-back, overlapping their latencies, so the
    per-pop cost approaches the vector work instead of the scalar round-trip.
    Blocks that finish early expand a masked dummy root (cheap) until the
    slowest co-resident block completes; adjacent blocks are neighboring
    image tiles with similar path lengths, so the tail waste is small.
    """
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, stack_ref, *extra):
        if dma_leaf:
            rowbuf_ref, dma_sem = extra
        ox = [o_ref[b, 0] for b in range(nblocks)]
        oy = [o_ref[b, 1] for b in range(nblocks)]
        oz = [o_ref[b, 2] for b in range(nblocks)]
        dx = [d_ref[b, 0] for b in range(nblocks)]
        dy = [d_ref[b, 1] for b in range(nblocks)]
        dz = [d_ref[b, 2] for b in range(nblocks)]
        t_min = [tlim_ref[b, 0] for b in range(nblocks)]
        t_max = [tlim_ref[b, 1] for b in range(nblocks)]

        def safe(a):
            return jnp.where(jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a)

        ix = [1.0 / safe(v) for v in dx]
        iy = [1.0 / safe(v) for v in dy]
        iz = [1.0 / safe(v) for v in dz]
        degenerate = [
            ((dx[b] * dx[b] + dy[b] * dy[b] + dz[b] * dz[b]) < 1e-12).astype(jnp.int32)
            for b in range(nblocks)
        ]

        def leaf_tests(b, leaf, args):
            if dma_leaf:
                dma = pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(jnp.maximum(leaf, 0), 1)],
                    rowbuf_ref, dma_sem,
                )
                dma.start()
                dma.wait()
                return _leaf_tests_from_row(
                    rowbuf_ref[0], leaf_size, any_hit,
                    ox[b], oy[b], oz[b], dx[b], dy[b], dz[b], t_min[b], args,
                )
            return _leaf_tests(leaf_ref, leaf, leaf_size, any_hit,
                               ox[b], oy[b], oz[b], dx[b], dy[b], dz[b],
                               t_min[b], args)

        for b in range(nblocks):
            stack_ref[b, 0] = jnp.int32(0)

        zero_i = jnp.int32(0)
        zero_v = jnp.zeros((8, 128), jnp.int32)

        def cond(state):
            alive = state[0][0] > 0
            for b in range(1, nblocks):
                alive = jnp.logical_or(alive, state[0][b] > 0)
            return alive

        def body(state):
            sps, bests = state
            sps = list(sps)
            bests = list(bests)  # per block: (t, prim, u, v, done)

            packed_vecs = []
            childrens = []
            empties = []
            actives = []
            leaves = []
            # Phase 1: per-block pop + expansion. No cross-vector reductions
            # in here — conds only contain row fetches and dense vector work.
            for b in range(nblocks):
                active = sps[b] > 0
                top = stack_ref[b, jnp.maximum(sps[b] - 1, 0)]
                # Finished blocks expand the root with a masked-off result.
                ref = jnp.where(active, top, zero_i)
                is_leaf = ref < 0
                best_t, best_prim, best_u, best_v, done = bests[b]

                def do_leaf(args, b=b, ref=ref):
                    out = leaf_tests(b, -2 - ref, args)
                    return out + (zero_v, *(zero_i,) * (W + 1))

                def do_internal(args, b=b, ref=ref):
                    best_t, best_prim, best_u, best_v, done = args
                    row = node_ref[jnp.maximum(ref, 0)]
                    row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                    not_done = done == 0
                    children = []
                    packed = zero_v
                    for c in range(W):
                        tx0 = (row[c] - ox[b]) * ix[b]
                        ty0 = (row[W + c] - oy[b]) * iy[b]
                        tz0 = (row[2 * W + c] - oz[b]) * iz[b]
                        tx1 = (row[3 * W + c] - ox[b]) * ix[b]
                        ty1 = (row[4 * W + c] - oy[b]) * iy[b]
                        tz1 = (row[5 * W + c] - oz[b]) * iz[b]
                        tnear = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1),
                        )
                        tfar = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1),
                        )
                        hit = (
                            (tfar >= jnp.maximum(tnear, t_min[b]))
                            & (tnear <= best_t)
                            & not_done
                        )
                        packed = packed | (hit.astype(jnp.int32) << c)
                        children.append(row_i[6 * W + c])
                    empty_bits = jnp.int32(0)
                    for c in range(W):
                        empty_bits = empty_bits | (
                            (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                        )
                    return (best_t, best_prim, best_u, best_v, done,
                            packed, *children, empty_bits)

                res = jax.lax.cond(
                    is_leaf, do_leaf, do_internal,
                    (best_t, best_prim, best_u, best_v, done),
                )
                bests[b] = res[:5]
                packed_vecs.append(res[5])
                childrens.append(list(res[6:6 + W]))
                empties.append(res[6 + W])
                actives.append(active)
                leaves.append(is_leaf)
                sps[b] = jnp.maximum(sps[b] - 1, 0)

            # Phase 2: gang the reductions. Each vector->scalar extract is a
            # full ~1 us sync roundtrip that does NOT pipeline with its
            # neighbors (measured), so the per-block bit-words are SHIFTED
            # into disjoint ranges of ONE combined vector and the whole gang
            # pays a single OR-tree + extract: 4 blocks (8 bits each, closest
            # hit) or 3 blocks (9 bits incl. the any-lane-alive bit, any-hit)
            # per roundtrip.
            bits_per = W + 1 if any_hit else W
            # width 16: 2 blocks/extract closest-hit, 1 any-hit;
            # width 8: 4 and 3.
            gang_size = max(32 // bits_per, 1)
            masks = [None] * nblocks
            alive_scalars = [None] * nblocks
            for g0 in range(0, nblocks, gang_size):
                gang = list(range(g0, min(g0 + gang_size, nblocks)))
                combined = zero_v
                for k, b in enumerate(gang):
                    packed = packed_vecs[b]
                    if any_hit:
                        packed = packed | (
                            (bests[b][4] == 0).astype(jnp.int32) << W
                        )
                    combined = combined | (packed << (bits_per * k))
                for s in (1, 2, 4):
                    combined = combined | pltpu.roll(combined, s, axis=0)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    combined = combined | pltpu.roll(combined, s, axis=1)
                word = combined[0, 0]
                full = jnp.int32((1 << W) - 1)
                for k, b in enumerate(gang):
                    w = word >> (bits_per * k)
                    masks[b] = jnp.where(
                        actives[b], w & full & ~empties[b], 0
                    )
                    if any_hit:
                        alive_scalars[b] = (w >> W) & 1

            # Phase 3: pushes (pl.when: taken branches beat unconditional
            # dynamic-index SMEM stores — measured).
            for b in range(nblocks):
                sp = sps[b]
                for c in range(W):
                    bit = (masks[b] >> c) & 1

                    @pl.when(bit == 1)
                    def _(child=childrens[b][c], b=b, at=sp):
                        stack_ref[b, at] = child

                    sp = sp + bit
                if any_hit:
                    sp = jnp.where(alive_scalars[b] == 0, 0, sp)
                sps[b] = sp

            return tuple(sps), tuple(bests)

        init_bests = tuple(
            (
                jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max[b]),
                jnp.full((8, 128), -1, jnp.int32),
                jnp.zeros((8, 128), jnp.float32),
                jnp.zeros((8, 128), jnp.float32),
                degenerate[b],
            )
            for b in range(nblocks)
        )
        init = (tuple(jnp.int32(1) for _ in range(nblocks)), init_bests)
        _sps, bests = jax.lax.while_loop(cond, body, init)
        for b in range(nblocks):
            best_t, best_prim, best_u, best_v, _done = bests[b]
            t_out[b] = jnp.where(best_prim >= 0, best_t, 3.0e38)
            prim_out[b] = best_prim
            u_out[b] = best_u
            v_out[b] = best_v

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "leaf_size", "any_hit", "ordered", "stack_size", "wide", "stats",
        "multi", "dma_leaf", "dual", "leaf_queue", "mask_via_vmem",
        "steady_drain", "drain_first", "row_cursors", "row_expand",
        "overflow_stats", "q32", "cursor_kill", "skip_expand", "skip_drain",
        "phase_stats",
    ),
)
def _run(node_packed, leaf_packed, o, d, tlim, leaf_size, any_hit,
         ordered=False, stack_size=64, wide=False, stats=False, multi=1,
         dma_leaf=False, dual=False, leaf_queue=0, mask_via_vmem=False,
         steady_drain=0, drain_first=False, row_cursors=0, row_expand=2,
         meta=None, overflow_stats=False, q32=False, q32_perm=None,
         cursor_kill=False, skip_expand=False, skip_drain=False,
         phase_stats=False):
    """o, d: (B, 3, 8, 128); tlim: (B, 2, 8, 128)."""
    b = o.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
    ]
    if stats:  # per-block (iterations, leaf pops) — perf diagnostics
        out_shape.append(jax.ShapeDtypeStruct((b, 8, 128), jnp.int32))
    # The row-cursor kernel launches grid=(b,) with its own spec layout;
    # multi-block co-residency does not compose with it (the multi-sized
    # BlockSpecs would index rows i*nb..i*nb+nb over a b-step grid).
    row_path = wide and row_cursors > 0 and meta is not None
    nb = multi if (wide and not ordered and not stats and not row_path) else 1
    assert b % nb == 0, f"ray blocks {b} not divisible by multi={nb}"
    in_block = lambda n: pl.BlockSpec(
        (nb, n, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec(
        (nb, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # node table, whole
        # leaf table: VMEM-resident, or HBM with per-pop row DMA at scale
        pl.BlockSpec(memory_space=pl.ANY if dma_leaf
                     else pltpu.VMEM),
        in_block(3),
        in_block(3),
        in_block(2),
    ]
    out_specs = [out_block] * (5 if stats else 4)
    leaf_cols = leaf_packed.shape[1]
    dma_scratch = [
        pltpu.VMEM((1, leaf_cols), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ] if dma_leaf else []
    if row_path:
        assert not stats, "row-cursor kernel has no stats path"
        rd = steady_drain if steady_drain > 0 else 3
        row_dma = [
            pltpu.VMEM((rd * 8, leaf_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((rd * 8,)),
        ] if dma_leaf else []
        if q32:
            kernel = _make_kernel_wide_row32(
                leaf_size, any_hit, rd, row_expand, dma_leaf=dma_leaf)
            in_specs.insert(2, pl.BlockSpec(memory_space=pltpu.SMEM))
            in_specs.insert(3, pl.BlockSpec(memory_space=pltpu.SMEM))
            grid_spec = pl.GridSpec(
                grid=(b,), in_specs=in_specs, out_specs=out_specs,
                # (ptr, mask32) pairs: two parallel SMEM planes per stack.
                scratch_shapes=[
                    pltpu.SMEM((8, RC_SCAP), jnp.int32),
                    pltpu.SMEM((8, RC_SCAP), jnp.int32),
                    pltpu.SMEM((8, RC_QCAP), jnp.int32),
                    pltpu.SMEM((8, RC_QCAP), jnp.int32),
                ] + row_dma,
            )
            return pl.pallas_call(kernel, out_shape=out_shape,
                                  grid_spec=grid_spec)(
                node_packed, leaf_packed, meta.reshape(-1),
                q32_perm, o, d, tlim)
        kernel = _make_kernel_wide_row(
            leaf_size, any_hit, rd, row_expand, dma_leaf=dma_leaf,
            overflow_stats=overflow_stats,
            cursor_kill=cursor_kill and any_hit, skip_expand=skip_expand,
            skip_drain=skip_drain and not phase_stats,
            phase_stats=phase_stats)
        if overflow_stats or phase_stats:
            out_shape.append(jax.ShapeDtypeStruct((b, 8, 128), jnp.int32))
            out_specs = out_specs + [out_block]
        in_specs.insert(2, pl.BlockSpec(memory_space=pltpu.SMEM))
        grid_spec = pl.GridSpec(
            grid=(b,), in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=[
                pltpu.SMEM((8, RC_SCAP), jnp.int32),
                pltpu.SMEM((8, RC_QCAP), jnp.int32),
            ] + row_dma,
        )
        # Flat (N*3,): a 2D SMEM window pads every row to 512 B, which blew
        # the 1 MB SMEM budget at Sponza scale (7587 rows -> 3.9 MB).
        return pl.pallas_call(kernel, out_shape=out_shape,
                              grid_spec=grid_spec)(
            node_packed, leaf_packed, meta.reshape(-1), o, d, tlim)
    if wide and nb > 1:
        kernel = _make_kernel_wide_multi(leaf_size, any_hit, nb,
                                         dma_leaf=dma_leaf)
        scratch = [pltpu.SMEM((nb, stack_size), jnp.int32)] + dma_scratch
    elif wide and steady_drain > 0 and not ordered:
        make = _make_kernel_wide_sdd if dual else _make_kernel_wide_sd
        kw = {"drain_first": drain_first} if dual else {}
        kernel = make(leaf_size, any_hit, steady_drain, dma_leaf=dma_leaf,
                      **kw)
        # Pipelined drain: one row buffer + semaphore PER drained row so
        # all fetches are in flight before the first wait (_steady_drain).
        sd_dma = [
            pltpu.VMEM((steady_drain, leaf_cols), jnp.float32),
            pltpu.SemaphoreType.DMA((steady_drain,)),
        ] if dma_leaf else []
        scratch = [
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((SD_QCAP,), jnp.int32),
        ] + sd_dma
    elif wide and leaf_queue > 0 and not ordered:
        kernel = _make_kernel_wide_lq(leaf_size, any_hit, leaf_queue,
                                      dma_leaf=dma_leaf)
        scratch = [
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((leaf_queue + 24,), jnp.int32),
        ] + dma_scratch
    elif wide and dual and not ordered:
        kernel = _make_kernel_wide_dual(leaf_size, any_hit,
                                        dma_leaf=dma_leaf)
        scratch = [pltpu.SMEM((stack_size,), jnp.int32)] + dma_scratch
    elif wide:
        kernel = _make_kernel_wide(leaf_size, any_hit, ordered,
                                   dma_leaf=dma_leaf,
                                   mask_via_vmem=mask_via_vmem)
        scratch = [pltpu.SMEM((stack_size,), jnp.int32)] + dma_scratch
        if mask_via_vmem:
            scratch = scratch + [pltpu.VMEM((8, 128), jnp.int32)]
    elif ordered:
        kernel = _make_kernel_ordered(leaf_size, any_hit)
        scratch = [pltpu.SMEM((stack_size,), jnp.int32)]
    else:
        kernel = _make_kernel(leaf_size, any_hit)
        scratch = []
    grid_spec = pl.GridSpec(
        grid=(b // nb,), in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
    )(node_packed, leaf_packed, o, d, tlim)


def traverse_packet_pallas(bvh, origin, direction, t_min=1e-3, t_max=1e4,
                           any_hit: bool = False, tile: int = 32,
                           ordered: bool = False, wide: bool = True,
                           multi: int = 1, dma_leaf: bool = False,
                           dual: bool = False, stats: bool = False,
                           leaf_queue: int = 0, mask_via_vmem: bool = False,
                           steady_drain: int = 0, drain_first: bool = False,
                           row_cursors: int = 0, row_expand: int = 2,
                           overflow_stats: bool = False, q32: bool = False,
                           cursor_kill: bool = False,
                           skip_expand: bool = False,
                           skip_drain: bool = False,
                           phase_stats: bool = False):
    """Drop-in alternative to ops.bvh.traverse_packet (same results).

    wide=True (default) walks the collapsed BVH8 (bvh.wnode_packed) with a
    per-block SMEM stack — one scalar row fetch tests 8 boxes; wide=False
    keeps the binary skip-pointer walk (round-1 kernel). multi>1 co-resides
    that many ray blocks per grid step with interleaved walks (amortizes the
    per-step fixed cost; wide only. With width-16 nodes the single-block
    kernel matches it on divergent fronts and beats it on primaries, so 1
    is the default — see PERFORMANCE.md)."""
    shape = origin.shape[:-1]

    if len(shape) == 2 and shape[0] % tile == 0 and shape[1] % tile == 0:
        h, w = shape

        def pack(x):  # (H, W) -> (B, 8, 128) via tile-major reorder
            x = x.reshape(h // tile, tile, w // tile, tile)
            x = x.transpose(0, 2, 1, 3).reshape(-1, tile * tile)
            return x.reshape(-1, 8, 128)

        def unpack(x):
            x = x.reshape(-1, tile * tile)
            x = x.reshape(h // tile, w // tile, tile, tile)
            return x.transpose(0, 2, 1, 3).reshape(h, w)
    else:
        r = 1
        for s in shape:
            r *= s
        pad = (-r) % (PACKET * max(multi, 1))

        def pack(x):
            return jnp.pad(x.reshape(-1), (0, pad)).reshape(-1, 8, 128)

        def unpack(x):
            return x.reshape(-1)[:r].reshape(shape)

    o = jnp.stack([pack(origin[..., k]) for k in range(3)], axis=1)
    d = jnp.stack([pack(direction[..., k]) for k in range(3)], axis=1)
    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), shape)
    t_max_v = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    tlim = jnp.stack([pack(t_min_v), pack(t_max_v)], axis=1)

    ls = bvh.leaf_tris.shape[1]
    # The kernels (VMEM layout + DMA row slices) need rows padded to the
    # 128-lane tile width (a 24-slot row is 240 cols -> 256 = two lane
    # tiles); the stored table keeps its logical width for the XLA gather
    # path. XLA constant-folds this pad of a closed-over constant.
    leaf_packed = bvh.leaf_packed
    if leaf_packed.shape[1] % 128:
        leaf_packed = jnp.pad(
            leaf_packed,
            ((0, 0), (0, 128 - leaf_packed.shape[1] % 128)),
        )
    if wide:
        # A popped wide node pushes up to width-1 deferred siblings per
        # level of the wide tree (+width slack).
        from rust_renderer_tpu.ops.bvh import WIDE_WIDTH

        stack_size = max(
            (WIDE_WIDTH - 1) * int(bvh.wide_depth) + 2 * WIDE_WIDTH, 48
        )
        if dual:
            # Two expansions per iteration can defer siblings from two
            # nodes at the same level.
            stack_size *= 2
        node_table = bvh.wnode_packed
        leaf_table = leaf_packed
    else:
        # Ordered binary traversal pushes at most one frame per tree level
        # (+2 slack for the two pushes a step can make before popping).
        stack_size = max(int(getattr(bvh, "max_depth", 62)) + 2, 16)
        node_table = bvh.node_packed
        leaf_table = leaf_packed
    nb = max(int(multi), 1)
    while nb > 1 and o.shape[0] % nb:
        nb //= 2
    assert not (dma_leaf and not wide), "dma_leaf requires the wide kernel"
    meta = None
    q32_perm = None
    if row_cursors and q32:
        meta32 = getattr(bvh, "wnode_meta32", None)
        q32_node = getattr(bvh, "wnode_q32", None)
        q32_perm = getattr(bvh, "q32_leaf_perm", None)
        too_deep32 = (row_expand * (int(getattr(bvh, "q32_depth", 0)) + 1)
                      + 2 > RC_SCAP)
        if (not wide or stats or meta32 is None or q32_node is None
                or q32_perm is None or too_deep32):
            q32 = False
            q32_perm = None
        else:
            meta = meta32
            node_table = q32_node
    if row_cursors and not q32:
        meta = getattr(bvh, "wnode_meta", None)
        too_big = bvh.wnode_packed.shape[0] + 1 > (1 << 16)
        # Conservative static bound on per-cursor stack need: each expand
        # slot can push one mask entry per wide-tree level. A tree deep
        # enough to breach RC_SCAP falls back rather than silently clamp.
        too_deep = row_expand * (int(bvh.wide_depth) + 1) + 2 > RC_SCAP
        if (not wide or meta is None or stats or too_big or too_deep):
            # Trees without collapse metadata (e.g. the MC dynamic tree),
            # >64k-node trees (entries pack ptr<<16), and the stats path
            # fall back to the steady-drain kernel. dma_leaf is supported:
            # the drain fetches rows by pipelined async copy.
            row_cursors = 0
            meta = None
    if row_cursors and meta is not None:
        # One all-dead row (tri ids -1) for empty-queue drain slots.
        # The concat runs in INT32 space: tri ids are int32 bit
        # patterns stored in f32 columns — denormals — and an f32
        # concatenate fusion FLUSHES them to zero on TPU (measured:
        # 346k -> 86k nonzero ids on the Sponza-scale table; every
        # hit then returned prim=0 while t stayed exact).
        lt_i = jax.lax.bitcast_convert_type(leaf_table, jnp.int32)
        dead_i = jnp.zeros((1, leaf_table.shape[1]), jnp.int32)
        dead_i = dead_i.at[0, 9 * ls:9 * ls + ls].set(-1)
        leaf_table = jax.lax.bitcast_convert_type(
            jnp.concatenate([lt_i, dead_i], axis=0), jnp.float32)
    row_active = bool(row_cursors) and meta is not None
    out = _run(
        node_table, leaf_table, o, d, tlim, ls, any_hit, ordered,
        stack_size=stack_size, wide=wide, multi=nb, dma_leaf=dma_leaf,
        dual=dual, stats=stats, leaf_queue=leaf_queue,
        mask_via_vmem=mask_via_vmem, steady_drain=steady_drain,
        drain_first=drain_first, row_cursors=row_cursors,
        row_expand=row_expand, meta=meta,
        overflow_stats=overflow_stats and row_active and not q32,
        q32=bool(q32) and row_active, q32_perm=q32_perm,
        cursor_kill=cursor_kill, skip_expand=skip_expand,
        skip_drain=skip_drain,
        phase_stats=phase_stats and row_active and not q32,
    )
    if stats:
        t, prim, u, v, st = out
        # per-block diagnostics: row 0 = pops, row 1 = leaf pops
        return unpack(t), unpack(prim), unpack(u), unpack(v), st
    if overflow_stats:
        # 5th value: (B, 8, 128) int32 — per block, row 0 lane 0 = clamped
        # stack pushes, row 1 lane 0 = clamped queue pushes; None when the
        # launch fell back to a non-row kernel (which has no fixed
        # per-cursor capacities to breach) or ran the q32 kernel (deep
        # trees fall back to steady-drain instead of clamping).
        if row_active and not q32:
            t, prim, u, v, ovf = out
            return unpack(t), unpack(prim), unpack(u), unpack(v), ovf
        t, prim, u, v = out
        return unpack(t), unpack(prim), unpack(u), unpack(v), None
    if phase_stats:
        # 5th value (row kernel only): (B, 8, 128) int32, lane 0 of rows
        # 0-4 = [iterations, live drain pops, live expand pops,
        # all-stacks-empty iters, all-queues-empty iters] per block.
        if row_active and not q32:
            t, prim, u, v, ph = out
            return unpack(t), unpack(prim), unpack(u), unpack(v), ph
        t, prim, u, v = out
        return unpack(t), unpack(prim), unpack(u), unpack(v), None
    t, prim, u, v = out
    return unpack(t), unpack(prim), unpack(u), unpack(v)
