"""Windowed active-lane compaction for traversal fronts.

Late bounce fronts keep every 1024-lane packet block walking while ANY lane
is live (~16% live lanes at bounce 5 still cost MORE than bounce 1 —
PERFORMANCE.md round 3). GLOBAL active-first compaction was measured a
wash there, but the loss was the data movement (scatter-built inverse
permutation + per-channel gathers), not union widening: a STABLE live-first
partition preserves image order among survivors (tools/eval_compaction.py:
0.58-0.80x total pops at 10-40% live). Windowed compaction additionally
bounds the worst-case scramble: lanes move only within a window of
`window_blocks` ADJACENT packet blocks, so surviving blocks keep spatially
local origins while fully-dead blocks exit their walk after one root pop.

Layout: windows are formed in the SAME tile-major lane order the Pallas
launcher packs 2D fronts into (32x32 image tiles -> one (8,128) block
each — traverse_packet_pallas's `pack`), so "window_blocks adjacent
blocks" means horizontally-adjacent image tiles, and the compacted front
is handed to the kernel pre-flattened in exactly that block order.

Data movement is two in-window `lax.sort`s (bitonic, ~91 fully-vectorized
compare stages for an 8-block window — no scatter/gather lowering risk) or,
with method="scatter", one packed-row scatter in + one row gather back (the
round-1 packed-row lesson).

Reference role: scheduling for the traversal dispatches of
utopian/src/raytracing.rs; the reference's GPU gets the same effect for
free from hardware warp scheduling over terminated threads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas

BLOCK = 1024  # lanes per packet block (8 x 128)
TILE = 32     # image tile side the Pallas launcher packs 2D fronts into


def _spread10(x):
    """Interleave-ready bit spread of a 10-bit int32 (Morton helper)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton30(ox, oy, oz, live):
    """30-bit Morton code of each lane's ORIGIN, quantized over the live
    lanes' bounding box. Union walks are origin-driven (PERFORMANCE.md
    round 3: direction sorts all measured worse) — clustering origins
    within a compaction window narrows each surviving block's walk.
    CPU pop replay (tools/eval_compaction.py --morton): win16+morton
    0.73x/0.69x total pops at 20%/10% live vs 0.78x/0.74x live-first
    alone."""
    big = jnp.float32(3e38)
    los, his = [], []
    for c in (ox, oy, oz):
        los.append(jnp.min(jnp.where(live, c, big)))
        his.append(jnp.max(jnp.where(live, c, -big)))
    code = jnp.zeros_like(ox, dtype=jnp.int32)
    for k, (c, lo, hi) in enumerate(zip((ox, oy, oz), los, his)):
        span = jnp.maximum(hi - lo, 1e-12)
        q = jnp.clip(((c - lo) / span * 1024.0).astype(jnp.int32), 0, 1023)
        code = code | (_spread10(q) << k)
    return code


def _lane_maps(shape):
    """(pack, unpack) between the logical front shape and the flat
    tile-major lane order used by the Pallas launcher for 2D fronts."""
    if (len(shape) == 2 and shape[0] % TILE == 0 and shape[1] % TILE == 0):
        h, w = shape

        def pack(x):
            x = x.reshape(h // TILE, TILE, w // TILE, TILE)
            return x.transpose(0, 2, 1, 3).reshape(-1)

        def unpack(x):
            x = x.reshape(h // TILE, w // TILE, TILE, TILE)
            return x.transpose(0, 2, 1, 3).reshape(h, w)

        return pack, unpack
    n = 1
    for s in shape:
        n *= s

    def pack(x):
        return x.reshape(n)

    def unpack(x):
        return x.reshape(shape)

    return pack, unpack


def window_forward_map(live_flat, window_lanes: int):
    """src->dst map of the stable live-first partition within each window.

    live_flat: (N,) bool, N a multiple of window_lanes.
    """
    lw = live_flat.reshape(-1, window_lanes)
    li = lw.astype(jnp.int32)
    nl = jnp.cumsum(li, axis=1)
    nd = jnp.cumsum(1 - li, axis=1)
    nlive = nl[:, -1:]
    pos = jnp.where(lw, nl - 1, nlive + nd - 1)
    base = window_lanes * jnp.arange(lw.shape[0], dtype=jnp.int32)[:, None]
    return (pos + base).reshape(-1)


def traverse_compacted(bvh, origin, direction, t_min=1e-3, t_max=1e4,
                       window_blocks: int = 8, trav=None, method="sort",
                       order: str = "live", **kw):
    """Packet traversal with windowed live-lane compaction.

    Same signature/results as the underlying traversal `trav` (default
    traverse_packet_pallas; dead lanes keep prim=-1); lanes are permuted
    into live-first order within windows of `window_blocks` adjacent blocks
    for the walk and restored after. Scheduling only — results are exact.

    order="morton" additionally sorts the LIVE lanes of each window by the
    Morton code of their origin (dead lanes still sink to the window tail).
    The code packs into the same int32 sort key as the dead bit, so the
    bitonic sort costs nothing extra — only the ~20-op code computation.
    """
    if trav is None:
        trav = traverse_packet_pallas
    shape = origin.shape[:-1]
    n = 1
    for s in shape:
        n *= s
    n_blocks = n // BLOCK
    # Snap the window to the largest divisor of the block count <= the
    # request (1080p is 2025 blocks: request 8 -> 5, 16 -> 15). All static.
    wb = 1
    for cand in range(min(window_blocks, n_blocks), 1, -1):
        if n_blocks % cand == 0:
            wb = cand
            break
    window = wb * BLOCK
    if n % BLOCK or wb < 2:
        # sub-block fronts or no usable window: compaction cannot help
        return trav(bvh, origin, direction, t_min, t_max, **kw)

    pack, unpack = _lane_maps(shape)
    ox, oy, oz = (pack(origin[..., k]) for k in range(3))
    dx, dy, dz = (pack(direction[..., k]) for k in range(3))
    # A scalar t_max (the closest-hit case) needs no per-lane channel — one
    # fewer operand through both sorts.
    tmax_scalar = jnp.ndim(t_max) == 0
    tmx = (None if tmax_scalar
           else pack(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)))
    live = (dx * dx + dy * dy + dz * dz) > 0.0

    if method == "sort":
        dead_i = jnp.logical_not(live).astype(jnp.int32)
        if order == "morton":
            dead_key = ((dead_i << 30)
                        | _morton30(ox, oy, oz, live)).reshape(-1, window)
        else:
            dead_key = dead_i.reshape(-1, window)
        src_idx = jax.lax.broadcasted_iota(jnp.int32, (n // window, window), 1)
        chans = (ox, oy, oz, dx, dy, dz) + (() if tmax_scalar else (tmx,))
        ins = tuple(a.reshape(-1, window) for a in chans)
        sorted_all = jax.lax.sort(
            (dead_key, src_idx) + ins, dimension=1, num_keys=2,
            is_stable=False)  # (dead, src_idx) is already a total order
        src_c = sorted_all[1]
        o_c = jnp.stack([a.reshape(n) for a in sorted_all[2:5]], -1)
        d_c = jnp.stack([a.reshape(n) for a in sorted_all[5:8]], -1)
        tmax_c = t_max if tmax_scalar else sorted_all[8].reshape(n)

        t, prim, u, v = trav(bvh, o_c, d_c, t_min, tmax_c, **kw)
        if kw.get("any_hit", False):
            # Occlusion queries consume only `prim >= 0` (make_any_hit) —
            # restore one channel instead of four; t/u/v are returned as
            # zeros (documented garbage, same as dead lanes).
            restored = jax.lax.sort(
                (src_c, prim.reshape(-1, window)), dimension=1, num_keys=1,
                is_stable=False)
            prim_o = restored[1].reshape(n)
            zero = jnp.zeros(shape, jnp.float32)
            return (zero, unpack(prim_o), zero, zero)
        outs = tuple(a.reshape(-1, window) for a in
                     (t.reshape(n), prim.reshape(n), u.reshape(n),
                      v.reshape(n)))
        restored = jax.lax.sort((src_c,) + outs, dimension=1, num_keys=1,
                                is_stable=False)  # src_c is a permutation
        t_o, prim_o, u_o, v_o = (a.reshape(n) for a in restored[1:])
        return (unpack(t_o), unpack(prim_o), unpack(u_o), unpack(v_o))

    fwd = window_forward_map(live, window)
    zero = jnp.zeros((n,), jnp.float32)
    rows = jnp.stack(
        [ox, oy, oz, dx, dy, dz, zero if tmax_scalar else tmx, zero],
        axis=1,
    )
    rows_c = jnp.zeros_like(rows).at[fwd].set(rows, unique_indices=True)
    o_c = rows_c[:, 0:3]
    d_c = rows_c[:, 3:6]
    tmax_c = t_max if tmax_scalar else rows_c[:, 6]

    t, prim, u, v = trav(bvh, o_c, d_c, t_min, tmax_c, **kw)
    out = jnp.stack(
        [t.reshape(n),
         jax.lax.bitcast_convert_type(prim.reshape(n), jnp.float32),
         u.reshape(n), v.reshape(n)],
        axis=1,
    )
    back = out[fwd]
    t_o = back[:, 0]
    prim_o = jax.lax.bitcast_convert_type(back[:, 1], jnp.int32)
    u_o = back[:, 2]
    v_o = back[:, 3]
    return unpack(t_o), unpack(prim_o), unpack(u_o), unpack(v_o)
