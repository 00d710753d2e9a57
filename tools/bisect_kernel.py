"""Bisect the production wide-kernel's per-ITERATION cost on real data.

Each variant re-times the real walk on the atrium scene and divides by the
TOTAL iteration count (stats output), so variants remain comparable even when
they change the walk length. Variants strip one suspect at a time:

  prod        the production wide kernel (stats on)
  noleaf      leaf branch returns unchanged (no MT tests, no 80 extracts)
  nopush      children never pushed (walk dies after root — only measures
              fixed per-step cost; interpret with care)
  nocull      tnear <= best_t culling removed (longer walk, same body)
  noextract   bitmask never extracted; mask = constant 255 & empty
              (pushes everything — different walk, big; per-iter still valid)
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


def make_kernel(leaf_size, variant):
    fused = variant.endswith("_fused")

    def kernel(*refs):
        if fused:
            node_ref, leaf_ref, rays_ref, out_ref, stack_ref = refs
            ox = rays_ref[0, 0]
            oy = rays_ref[0, 1]
            oz = rays_ref[0, 2]
            dx = rays_ref[0, 3]
            dy = rays_ref[0, 4]
            dz = rays_ref[0, 5]
            t_min = rays_ref[0, 6]
            t_max = rays_ref[0, 7]
        else:
            (node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
             t_out, prim_out, u_out, v_out, stats_out, stack_ref) = refs
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
            best_t, best_prim, best_u, best_v, done = args
            lrow = leaf_ref[jnp.maximum(leaf, 0)]
            lrow_i = jax.lax.bitcast_convert_type(lrow, jnp.int32)
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
                    & (done == 0)
                )
                best_t = jnp.where(ok, t, best_t)
                best_prim = jnp.where(ok, tri_id, best_prim)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
            return best_t, best_prim, best_u, best_v, done

        stack_ref[0] = jnp.int32(0)
        zero_i = jnp.int32(0)

        if variant.startswith("statictrip"):
            # Timing-only: fixed trip count (results bogus past stack
            # exhaustion, pops clamped memory-safe). Isolates whether the
            # data-dependent while condition is what makes real iterations
            # ~30x costlier than the P12/P13 synthetic replicas.
            trips = 38 if "38" in variant else 441

            def cond(state):
                return state[6] < trips
        else:
            def cond(state):
                return state[0] > 0

        def body(state):
            sp, best_t, best_prim, best_u, best_v, done, iters = state
            ref = stack_ref[jnp.maximum(sp - 1, 0)]
            sp = jnp.maximum(sp - 1, 0)
            is_leaf = ref < 0
            iters = iters + 1

            def do_leaf(args):
                if variant.startswith("noleaf"):
                    out = args
                else:
                    out = leaf_tests(-2 - ref, args)
                return out + (zero_i,) * (W + 1)

            def do_internal(args):
                best_t, best_prim, best_u, best_v, done = args
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
                    if variant.startswith("nocull"):
                        hit = (tfar >= jnp.maximum(tnear, t_min)) & not_done
                    else:
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
                mask = packed[0, 0]
                empty_bits = jnp.int32(0)
                for c in range(W):
                    empty_bits = empty_bits | (
                        (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                    )
                mask = mask & ~empty_bits
                return (best_t, best_prim, best_u, best_v, done, mask, *children)

            if variant.startswith("nocond"):
                # Branchless: BOTH bodies run every iteration; results are
                # selected by is_leaf. Wastes vector work but removes the
                # lax.cond region (tests the branch-spill hypothesis).
                il = leaf_tests(
                    jnp.maximum(-2 - ref, 0),
                    (best_t, best_prim, best_u, best_v, done),
                )
                ii = do_internal((best_t, best_prim, best_u, best_v, done))
                leaf_v = is_leaf  # scalar bool
                sel = lambda a, b: jnp.where(leaf_v, a, b)
                res = (
                    sel(il[0], ii[0]), sel(il[1], ii[1]), sel(il[2], ii[2]),
                    sel(il[3], ii[3]), sel(il[4], ii[4]),
                    jnp.where(leaf_v, zero_i, ii[5]),
                ) + ii[6:]
            else:
                res = jax.lax.cond(
                    is_leaf, do_leaf, do_internal,
                    (best_t, best_prim, best_u, best_v, done),
                )
            best_t, best_prim, best_u, best_v, done, mask = res[:6]
            children = list(res[6:6 + W])
            bits = [(mask >> c) & 1 for c in range(W)]

            if not variant.startswith("nopush"):
                for c in range(W):
                    at = jnp.minimum(sp, 120)

                    @pl.when(bits[c] == 1)
                    def _(child=children[c], at=at):
                        stack_ref[at] = child

                    sp = jnp.minimum(sp + bits[c], 120)

            return sp, best_t, best_prim, best_u, best_v, done, iters

        init = (
            jnp.int32(1),
            jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            degenerate,
            jnp.int32(0),
        )
        sp, best_t, best_prim, best_u, best_v, done, iters = jax.lax.while_loop(
            cond, body, init
        )
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        stats = jnp.where(rid == 0, iters, 0)
        if fused:
            out_ref[0, 0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
            out_ref[0, 1] = jax.lax.bitcast_convert_type(best_prim, jnp.float32)
            out_ref[0, 2] = best_u
            out_ref[0, 3] = best_v
            out_ref[0, 4] = jax.lax.bitcast_convert_type(stats, jnp.float32)
        else:
            t_out[0] = jnp.where(best_prim >= 0, best_t, 3.0e38)
            prim_out[0] = best_prim
            u_out[0] = best_u
            v_out[0] = best_v
            stats_out[0] = stats

    return kernel


@functools.partial(jax.jit, static_argnames=("leaf_size", "variant", "stack_size"))
def run_variant(node, leaf, o, d, tlim, leaf_size, variant, stack_size):
    b = o.shape[0]
    in_block = lambda n: pl.BlockSpec(
        (1, n, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_block = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if variant.endswith("_fused"):
        rays = jnp.concatenate([o, d, tlim], axis=1)  # (B, 8, 8, 128)
        out_shape = jax.ShapeDtypeStruct((b, 5, 8, 128), jnp.float32)
        grid_spec = pl.GridSpec(
            grid=(b,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                in_block(8),
            ],
            out_specs=[in_block(5)],
            scratch_shapes=[pltpu.SMEM((stack_size,), jnp.int32)],
        )
        out = pl.pallas_call(
            make_kernel(leaf_size, variant), out_shape=[out_shape],
            grid_spec=grid_spec,
        )(node, leaf, rays)[0]
        return (out[:, 0],
                jax.lax.bitcast_convert_type(out[:, 1], jnp.int32),
                out[:, 2], out[:, 3],
                jax.lax.bitcast_convert_type(out[:, 4], jnp.int32))
    out_shape = [
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
    ]
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            in_block(3), in_block(3), in_block(2),
        ],
        out_specs=[out_block] * 5,
        scratch_shapes=[pltpu.SMEM((stack_size,), jnp.int32)],
    )
    return pl.pallas_call(
        make_kernel(leaf_size, variant), out_shape=out_shape, grid_spec=grid_spec
    )(node, leaf, o, d, tlim)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--variants", default="prod,noleaf,nocull,nopush")
    ap.add_argument("--leafpad", type=int, default=0,
                    help="pad leaf_packed rows to this width (stride test)")
    args = ap.parse_args()
    n = args.size

    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    ls = bvh.leaf_tris.shape[1]
    view = RenderSettings.default().with_camera(cam, n, n)
    py = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5
    o3, d3 = rayops.generate_camera_rays(
        view.inverse_view, view.inverse_projection, px, py, n, n)
    rng = np.random.default_rng(0)
    dd = rng.normal(size=(n, n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    dd = jnp.asarray(dd)

    tile = 32

    def pack(x):
        h = w = n
        x = x.reshape(h // tile, tile, w // tile, tile)
        x = x.transpose(0, 2, 1, 3).reshape(-1, tile * tile)
        return x.reshape(-1, 8, 128)

    o = jnp.stack([pack(o3[..., k]) for k in range(3)], axis=1)
    d_prim = jnp.stack([pack(d3[..., k]) for k in range(3)], axis=1)
    d_div = jnp.stack([pack(dd[..., k]) for k in range(3)], axis=1)
    ones = jnp.ones((n, n), jnp.float32)
    tlim = jnp.stack([pack(ones * 1e-3), pack(ones * 1e4)], axis=1)
    stack_size = max((W - 1) * int(bvh.wide_depth) + 2 * W, 128)

    leaf_table = bvh.leaf_packed
    print(f"leaf row width {leaf_table.shape[1]} "
          f"(stride {leaf_table.shape[1] * 4} B)")
    if args.leafpad:
        pad = args.leafpad - leaf_table.shape[1]
        assert pad >= 0
        leaf_table = jnp.pad(leaf_table, ((0, 0), (0, pad)))
        print(f"padded leaf rows to {args.leafpad} (stride {args.leafpad * 4} B)")

    for variant in args.variants.split(","):
        for name, dv in (("primary", d_prim), ("divergent", d_div)):
            if variant == "mega":
                f = functools.partial(
                    jax.jit(run_mega, static_argnames=("leaf_size",
                                                       "stack_size")),
                    bvh.wnode_packed, leaf_table, o, dv, tlim,
                    leaf_size=ls, stack_size=stack_size)
            else:
                f = lambda: run_variant(
                    bvh.wnode_packed, leaf_table, o, dv, tlim,
                    ls, variant, stack_size)
            out = f()
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3):
                out = f()
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / 3 * 1000
            iters = int(jnp.sum(out[4][:, 0, 0]))
            print(f"{variant:10s} {name:10s} {ms:8.2f} ms  "
                  f"iters={iters:8d}  {ms * 1e6 / max(iters, 1):7.1f} ns/iter")




def run_mega(node, leaf, o, d, tlim, leaf_size, stack_size):
    """MEGA variant: grid=(1,) — every ray block processed by an outer
    fori_loop inside ONE grid step (dynamic-index block loads/stores from
    whole-array VMEM refs). Tests whether the ~1 us/iter cost is tied to the
    grid machinery (the identical body ungridded ran at 23 ns/iter)."""
    from rust_renderer_tpu.ops.bvh import WIDE_EMPTY, WIDE_WIDTH as W

    B = o.shape[0]

    def kernel(node_ref, leaf_ref, o_ref, d_ref, tlim_ref,
               t_out, prim_out, u_out, v_out, stats_out, stack_ref):
        def block_body(blk, acc):
            ox = o_ref[blk, 0]
            oy = o_ref[blk, 1]
            oz = o_ref[blk, 2]
            dx = d_ref[blk, 0]
            dy = d_ref[blk, 1]
            dz = d_ref[blk, 2]
            t_min = tlim_ref[blk, 0]
            t_max = tlim_ref[blk, 1]

            def safe(a):
                return jnp.where(
                    jnp.abs(a) < 1e-12, jnp.where(a < 0, -1e-12, 1e-12), a
                )

            ix = 1.0 / safe(dx)
            iy = 1.0 / safe(dy)
            iz = 1.0 / safe(dz)
            degenerate = (
                (dx * dx + dy * dy + dz * dz) < 1e-12
            ).astype(jnp.int32)

            def leaf_tests(leaf, args):
                best_t, best_prim, best_u, best_v, done = args
                lrow = leaf_ref[jnp.maximum(leaf, 0)]
                lrow_i = jax.lax.bitcast_convert_type(lrow, jnp.int32)
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
                    ok = ((tri_id >= 0) & (jnp.abs(det) > 1e-12)
                          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                          & (t > t_min) & (t < best_t) & (done == 0))
                    best_t = jnp.where(ok, t, best_t)
                    best_prim = jnp.where(ok, tri_id, best_prim)
                    best_u = jnp.where(ok, u, best_u)
                    best_v = jnp.where(ok, v, best_v)
                return best_t, best_prim, best_u, best_v, done

            stack_ref[0] = jnp.int32(0)
            zero_i = jnp.int32(0)

            def cond(state):
                return state[0] > 0

            def body(state):
                sp, best_t, best_prim, best_u, best_v, done, iters = state
                ref = stack_ref[jnp.maximum(sp - 1, 0)]
                sp = jnp.maximum(sp - 1, 0)
                is_leaf = ref < 0
                iters = iters + 1

                def do_leaf(args):
                    return leaf_tests(-2 - ref, args) + (zero_i,) * (W + 1)

                def do_internal(args):
                    best_t, best_prim, best_u, best_v, done = args
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
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        tfar = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
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
                    empty_bits = jnp.int32(0)
                    for c in range(W):
                        empty_bits = empty_bits | (
                            (children[c] == WIDE_EMPTY).astype(jnp.int32) << c
                        )
                    return (best_t, best_prim, best_u, best_v, done,
                            mask & ~empty_bits, *children)

                res = jax.lax.cond(
                    is_leaf, do_leaf, do_internal,
                    (best_t, best_prim, best_u, best_v, done))
                best_t, best_prim, best_u, best_v, done, mask = res[:6]
                children = list(res[6:6 + W])
                for c in range(W):
                    bit = (mask >> c) & 1
                    at = jnp.minimum(sp, stack_size - 1)

                    @pl.when(bit == 1)
                    def _(child=children[c], at=at):
                        stack_ref[at] = child

                    sp = jnp.minimum(sp + bit, stack_size - 1)
                return sp, best_t, best_prim, best_u, best_v, done, iters

            init = (jnp.int32(1),
                    jnp.minimum(jnp.full((8, 128), 3.0e38, jnp.float32), t_max),
                    jnp.full((8, 128), -1, jnp.int32),
                    jnp.zeros((8, 128), jnp.float32),
                    jnp.zeros((8, 128), jnp.float32),
                    degenerate, jnp.int32(0))
            sp, best_t, best_prim, best_u, best_v, done, iters = (
                jax.lax.while_loop(cond, body, init))
            t_out[blk] = jnp.where(best_prim >= 0, best_t, 3.0e38)
            prim_out[blk] = best_prim
            u_out[blk] = best_u
            v_out[blk] = best_v
            rid = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_out[blk] = jnp.where(rid == 0, iters, 0)
            return acc + iters

        jax.lax.fori_loop(0, B, block_body, jnp.int32(0))

    out_shape = [
        jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
    ]
    return pl.pallas_call(
        make_mega := kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        scratch_shapes=[pltpu.SMEM((stack_size,), jnp.int32)],
    )(node, leaf, o, d, tlim)


if __name__ == "__main__":
    main()
