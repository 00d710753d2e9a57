"""Windowed active-lane compaction for traversal fronts.

Late bounce fronts keep every 1024-lane packet block walking while ANY lane
is live (~16% live lanes at bounce 5 still cost MORE than bounce 1 —
PERFORMANCE.md round 3). GLOBAL active-first compaction was measured a
wash: ~6x fewer live blocks, but origins scrambled scene-wide widen each
surviving block's union walk by about the same factor (unions are
origin-driven; bench_fronts round 3). Windowed compaction bounds the
scramble: lanes move only within a window of `window_blocks` ADJACENT
blocks (adjacent image rows), so surviving blocks keep spatially local
origins while fully-dead blocks exit their walk after one root pop.

Data movement is two packed-row moves (the round-1 lesson: many small
gathers lower to table scans, one row fetch per lane does not):
  - inputs  (o, d, t_max) ride ONE (N, 8) row SCATTER to compacted order;
  - outputs (t, prim, u, v) ride ONE (N, 4) row GATHER back.
The forward map (src lane -> compacted slot) is two in-window cumsums.

Reference role: this is scheduling for the traversal of
utopian/src/raytracing.rs dispatches; the reference's GPU gets the same
effect for free from hardware warp scheduling over terminated threads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas

BLOCK = 1024  # lanes per packet block (8 x 128)


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
                       **kw):
    """Packet traversal with windowed live-lane compaction.

    Same signature/results as the underlying traversal `trav` (default
    traverse_packet_pallas; dead lanes keep prim=-1); lanes are permuted
    into live-first order within windows of `window_blocks` adjacent blocks
    for the walk and restored after.

    method="sort": both moves are stable in-window lax.sorts (bitonic —
    ~91 fully-vectorized stages for an 8-block window, no scatter/gather
    lowering risk). method="scatter": one (N,8) row scatter in + one (N,4)
    row gather back via the cumsum forward map.
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
    o = origin.reshape(n, 3)
    d = direction.reshape(n, 3)
    live = jnp.sum(d * d, axis=-1) > 0.0

    tmax_lane = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), shape).reshape(n)

    if method == "sort":
        dead_key = jnp.logical_not(live).astype(jnp.int32).reshape(-1, window)
        src_idx = jax.lax.broadcasted_iota(jnp.int32, (n // window, window), 1)
        ins = tuple(a.reshape(-1, window) for a in (
            o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmax_lane))
        sorted_all = jax.lax.sort(
            (dead_key, src_idx) + ins, dimension=1, num_keys=2,
            is_stable=False)  # (dead, src_idx) is already a total order
        src_c = sorted_all[1]
        ox, oy, oz, dx, dy, dz, tmx = sorted_all[2:]
        o_c = jnp.stack([ox, oy, oz], -1).reshape(shape + (3,))
        d_c = jnp.stack([dx, dy, dz], -1).reshape(shape + (3,))
        tmax_c = tmx.reshape(shape)

        t, prim, u, v = trav(bvh, o_c, d_c, t_min, tmax_c, **kw)
        outs = tuple(a.reshape(-1, window) for a in (
            t.reshape(n), prim.reshape(n), u.reshape(n), v.reshape(n)))
        restored = jax.lax.sort((src_c,) + outs, dimension=1, num_keys=1,
                                is_stable=False)  # src_c is a permutation
        t_o, prim_o, u_o, v_o = restored[1:]
        return (t_o.reshape(shape), prim_o.reshape(shape),
                u_o.reshape(shape), v_o.reshape(shape))

    fwd = window_forward_map(live, window)
    rows = jnp.concatenate(
        [o, d, tmax_lane.reshape(n, 1), jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )
    rows_c = jnp.zeros_like(rows).at[fwd].set(rows, unique_indices=True)
    o_c = rows_c[:, 0:3].reshape(shape + (3,))
    d_c = rows_c[:, 3:6].reshape(shape + (3,))
    tmax_c = rows_c[:, 6].reshape(shape)

    t, prim, u, v = trav(bvh, o_c, d_c, t_min, tmax_c, **kw)
    out = jnp.stack(
        [t.reshape(n),
         jax.lax.bitcast_convert_type(prim.reshape(n), jnp.float32),
         u.reshape(n), v.reshape(n)],
        axis=1,
    )
    back = out[fwd]
    t_o = back[:, 0].reshape(shape)
    prim_o = jax.lax.bitcast_convert_type(back[:, 1], jnp.int32).reshape(shape)
    u_o = back[:, 2].reshape(shape)
    v_o = back[:, 3].reshape(shape)
    return t_o, prim_o, u_o, v_o
