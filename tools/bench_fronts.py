"""Capture REAL per-bounce ray fronts from the PT loop and bench traversal
variants on them.

The frame profile at 1920x1080 (round 3) shows closest-hit bounce fronts
cost 64 -> 691 ms GROWING with bounce depth, and NEE any-hit 170 -> 588 ms —
together 86% of the frame. This tool reproduces the exact fronts (same RNG,
same scatter) with a python-level bounce loop, then times kernel variants
per front:

  prod            wide kernel as the frame runs it (closest multi=1, anyhit 4)
  multiK          multi-block interleaving at K
  ordered         near-first child ordering (sorting network)
  compact         stable active-first partition before the kernel + scatter
                  back (dead lanes leave as zero-direction blocks that retire
                  in one step; live blocks shrink to the active fraction)

Usage: python tools/bench_fronts.py [size] [--variants ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.models import create_scene
from rust_renderer_tpu.ops import bvh as bvhmod
from rust_renderer_tpu.ops import intersect, materials
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops import restir as restirops
from rust_renderer_tpu.ops import rng as rngmod
from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas
from rust_renderer_tpu.settings import RenderSettings, StaticConfig


def capture_fronts(n, bounces=5):
    """Replicates path_trace's bounce loop, returning per-bounce
    (origin, direction) closest fronts and the doubled NEE fronts."""
    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    view = RenderSettings.default(num_lights=r.get_num_lights()).with_camera(cam, n, n)

    closest = bvhmod.make_closest_hit(bvh)
    py = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    state = rngmod.init_rng(px, py, n, jnp.int32(7))

    @jax.jit
    def start(state):
        state, jx = rngmod.random_float(state)
        state, jy = rngmod.random_float(state)
        o, d = rayops.generate_camera_rays(
            view.inverse_view, view.inverse_projection,
            px.astype(jnp.float32) + jx, py.astype(jnp.float32) + jy, n, n)
        return state, o, d

    state, origin, direction = start(state)
    active = jnp.ones((n, n), bool)

    @jax.jit
    def step(state, origin, direction, active, hit):
        surf = intersect.surface_at_hit(scene, hit, origin, direction)
        state, sc = materials.scatter(
            scene, surf.material, direction, surf.normal, surf.uv, state)
        missed = jnp.logical_not(hit.is_hit)
        terminated = jnp.logical_and(
            active, jnp.logical_or(missed, jnp.logical_not(sc.is_scattered)))
        active = jnp.logical_and(active, jnp.logical_not(terminated))
        new_origin = rayops.offset_ray(surf.position, surf.normal)
        origin = jnp.where(active[..., None], new_origin, origin)
        direction = jnp.where(active[..., None], sc.direction, 0.0)
        # NEE front (sun + uniform light pick, as _nee does)
        sun = rayops.normalize(view.sun_dir)
        state, uni_idx, _ = restirops.sample_light_uniform(
            state, view.num_lights, view.max_num_lights_used)
        lrows = restirops.select_light_rows(
            scene, jnp.clip(uni_idx, 0, scene.light_pos.shape[0] - 1).reshape(-1)
        ).reshape(active.shape + (6,))
        to_light = lrows[..., :3] - origin
        dist = jnp.linalg.norm(to_light, axis=-1)
        ldir = to_light / jnp.maximum(dist, 1e-12)[..., None]
        am = active[..., None]
        o2 = jnp.concatenate([origin, origin], axis=0)
        d2 = jnp.concatenate([
            jnp.where(am, jnp.broadcast_to(sun, origin.shape), 0.0),
            jnp.where(am, ldir, 0.0)], axis=0)
        tmax2 = jnp.concatenate(
            [jnp.full(active.shape, 1e4), dist * (1.0 - 1e-4)], axis=0)
        return state, origin, direction, active, o2, d2, tmax2

    closest_fronts = []
    nee_fronts = []
    for b in range(bounces):
        closest_fronts.append((origin, direction, float(jnp.mean(
            (jnp.sum(direction * direction, -1) > 0).astype(jnp.float32)))))
        hit = closest(scene, origin, direction)
        state, origin, direction, active, o2, d2, tmax2 = step(
            state, origin, direction, active, hit)
        nee_fronts.append((o2, d2, tmax2, float(jnp.mean(
            (jnp.sum(d2 * d2, -1) > 0).astype(jnp.float32)))))
    for f in closest_fronts:
        jax.block_until_ready(f[0])
    return bvh, closest_fronts, nee_fronts, scene


def compact_order(direction):
    """Stable active-first permutation (flat raster order preserved)."""
    live = (jnp.sum(direction * direction, axis=-1) > 0.0).reshape(-1)
    na = jnp.cumsum(live.astype(jnp.int32))
    total = na[-1]
    rank_live = na - 1
    rank_dead = total + jnp.cumsum((~live).astype(jnp.int32)) - 1
    perm_pos = jnp.where(live, rank_live, rank_dead)  # old -> new
    inv = jnp.zeros_like(perm_pos).at[perm_pos].set(
        jnp.arange(perm_pos.shape[0], dtype=jnp.int32))
    return inv  # new -> old gather index


def octsort_order(direction, group=4096):
    """Direction-octant sort WITHIN fixed groups of `group` consecutive rays
    (4 packet blocks): preserves origin locality (the round-1 global-sort
    killer) while giving each 1024-ray block a narrower direction union.
    Dead lanes (octant forced to 8) compact to the group tail."""
    d = direction.reshape(-1, 3)
    live = jnp.sum(d * d, axis=-1) > 0.0
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        | ((d[:, 1] < 0).astype(jnp.int32) << 1)
        | ((d[:, 2] < 0).astype(jnp.int32) << 2)
    )
    octant = jnp.where(live, octant, 8)
    n = d.shape[0]
    g = octant.reshape(-1, group)
    order = jnp.argsort(g, axis=1, stable=True).astype(jnp.int32)
    base = jnp.arange(0, n, group, dtype=jnp.int32)[:, None]
    return (order + base).reshape(-1)  # new -> old gather index


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=512)
    ap.add_argument("--variants", default="prod,multi4,multi8,ordered,compact")
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--stats", action="store_true",
                    help="report per-block pop / leaf-pop counts instead of "
                         "timings (single-pop wide vs dual-pop)")
    ap.add_argument("--phase", action="store_true",
                    help="row-cursor phase diagnostics on the production "
                         "composition (morton win64 + wrc e2 d3): iteration "
                         "counts, drain/expand slot utilization, and "
                         "all-empty phase fractions per front (VERDICT r4 "
                         "#3 — where is the leaf-term waste?)")
    args = ap.parse_args()
    n = args.size

    bvh, closest_fronts, nee_fronts, scene = capture_fronts(n, args.bounces)
    variants = args.variants.split(",")
    # leafN variants trade deeper walks for fatter leaf rows (a 24-slot row
    # is 240 cols = two VMEM lane tiles; the kernels are width-generic).
    # lsdN = leafN tree + the sdd3 steady-drain kernel; wlsdN = that plus
    # 16-block windowed compaction (the full round-3 production composition
    # on a fatter-leaf tree).
    def _leaf_n(v):
        for p in ("wlsd", "wlrc", "lsd", "leaf"):
            if v.startswith(p):
                return int(v[len(p):].rstrip("kxy"))
        return None

    alt_trees = {
        ln: bvhmod.build_bvh(
            np.asarray(scene.positions), np.asarray(scene.indices),
            leaf_size=ln,
        )
        for ln in {_leaf_n(v) for v in variants} - {None}
    }

    if args.phase:
        from rust_renderer_tpu.ops import compaction

        def phase(o, d, tmin, tmax, any_hit):
            captured = {}

            def trav(bvh_, oc, dc, tmn, tmx, **kw):
                t, p, u, v, ph = traverse_packet_pallas(
                    bvh_, oc, dc, tmn, tmx, row_cursors=8, row_expand=2,
                    steady_drain=3, phase_stats=True, **kw)
                captured["ph"] = np.asarray(ph)
                return t, p, u, v

            compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=64, method="sort",
                order="morton", any_hit=any_hit, trav=trav)
            ph = captured["ph"]
            iters = ph[:, 0, 0].astype(np.float64)
            ld = ph[:, 1, 0].astype(np.float64)
            le = ph[:, 2, 0].astype(np.float64)
            se = ph[:, 3, 0].astype(np.float64)
            qe = ph[:, 4, 0].astype(np.float64)
            tot = np.maximum(iters, 1)
            return dict(
                it_mean=iters.mean(), it_p90=np.percentile(iters, 90),
                it_max=iters.max(),
                drain_util=(ld.sum() / max((iters * 8 * 3).sum(), 1)),
                exp_util=(le.sum() / max((iters * 8 * 2).sum(), 1)),
                se_frac=(se / tot).mean(), qe_frac=(qe / tot).mean(),
            )

        print(f"== row-cursor phase stats (morton win64 wrc e2 d3, {n}x{n}) ==")
        print("front  active%  iters(mean/p90/max)  drain-util exp-util "
              "stack-empty queue-empty")
        for b, (o, d, frac) in enumerate(closest_fronts):
            s = phase(o, d, 1e-3, 1e4, False)
            print(f"closest b{b} {frac*100:5.1f}% {s['it_mean']:7.1f}/"
                  f"{s['it_p90']:6.0f}/{s['it_max']:6.0f} "
                  f"{s['drain_util']*100:8.1f}% {s['exp_util']*100:7.1f}% "
                  f"{s['se_frac']*100:8.1f}% {s['qe_frac']*100:8.1f}%",
                  flush=True)
        for b, (o2, d2, tmax2, frac) in enumerate(nee_fronts):
            s = phase(o2, d2, 1e-3, tmax2, True)
            print(f"anyhit  b{b} {frac*100:5.1f}% {s['it_mean']:7.1f}/"
                  f"{s['it_p90']:6.0f}/{s['it_max']:6.0f} "
                  f"{s['drain_util']*100:8.1f}% {s['exp_util']*100:7.1f}% "
                  f"{s['se_frac']*100:8.1f}% {s['qe_frac']*100:8.1f}%",
                  flush=True)
        return

    if args.stats:
        def pops(o, d, tmin, tmax, any_hit, dual):
            out = traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                         any_hit=any_hit, dual=dual,
                                         stats=True)
            st = np.asarray(out[4])
            return float(st[:, 0, 0].mean()), float(st[:, 1, 0].mean())

        print(f"== per-block pops (mean over blocks, {n}x{n}) ==")
        print("front        single(pops/leaf)      dual(pops/leaf)")
        for b, (o, d, frac) in enumerate(closest_fronts):
            s = pops(o, d, 1e-3, 1e4, False, False)
            du = pops(o, d, 1e-3, 1e4, False, True)
            print(f"closest b{b} {frac*100:5.1f}% {s[0]:8.1f}/{s[1]:7.1f} "
                  f"{du[0]:8.1f}/{du[1]:7.1f}", flush=True)
        for b, (o2, d2, tmax2, frac) in enumerate(nee_fronts):
            s = pops(o2, d2, 1e-3, tmax2, True, False)
            du = pops(o2, d2, 1e-3, tmax2, True, True)
            print(f"anyhit  b{b} {frac*100:5.1f}% {s[0]:8.1f}/{s[1]:7.1f} "
                  f"{du[0]:8.1f}/{du[1]:7.1f}", flush=True)
        return

    def run_variant(v, o, d, tmin, tmax, any_hit):
        if v == "prod":
            # mirror make_any_hit / make_closest_hit production settings
            kw = dict(dual=True) if any_hit else {}
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit, **kw)
        if v.startswith("multi"):
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit,
                                          multi=int(v[5:]))
        if v == "dual":
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit, dual=True)
        if v.startswith("lq"):
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit,
                                          leaf_queue=int(v[2:]))
        if v.startswith("sddf"):
            # drain-FIRST dual-expand steady drain: leaf rows drained before
            # the expand (freshest best_t for culling; extract overlaps the
            # next iteration's leaf vector work)
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit, dual=True,
                                          steady_drain=int(v[4:]),
                                          drain_first=True)
        if v.startswith("sdd"):
            # dual-expand steady drain: 2 expands + D rows per extract
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit, dual=True,
                                          steady_drain=int(v[3:]))
        if v.startswith("sd"):
            # steady drain: branch-free body, D leaf rows tested per
            # iteration (tools/eval_lq.py for the CPU economics)
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit,
                                          steady_drain=int(v[2:]))
        if v.startswith("wsdf"):
            # windowed compaction + drain-first sdd3
            from rust_renderer_tpu.ops import compaction
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(v[4:]),
                method="sort", any_hit=any_hit, dual=True, steady_drain=3,
                drain_first=True)
        if v.startswith("wsd"):
            # windowed compaction ON TOP of the dual-expand steady-drain
            # kernel — the composition candidate if both win alone
            from rust_renderer_tpu.ops import compaction
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(v[3:]),
                method="sort", any_hit=any_hit, dual=True, steady_drain=3)
        if v.startswith("wq") and "e" in v[2:]:
            # wq<W>e<E>[d<D>]: morton windowed compaction + QUANTIZED
            # width-32 row-cursor kernel (bvh.wnode_q32: 16-bit child
            # boxes, 32 children per 512 B row — one fetch tests 2x the
            # tree of the f32 w16 row).
            from rust_renderer_tpu.ops import compaction
            wb, rest = v[2:].split("e")
            ex, _, dr = rest.partition("d")
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(wb),
                method="sort", order="morton", any_hit=any_hit,
                row_cursors=8, row_expand=int(ex),
                steady_drain=int(dr or 3), q32=True)
        if v.startswith("wrc") and "e" in v[3:]:
            # wrc<W>e<E>[d<D>][k][x][y]: morton windowed compaction +
            # ROW-CURSOR kernel (8 per-sublane cursors, mask-entry stacks),
            # expand E, drain D (default 3). Suffix k = any-hit cursor
            # kill (all-done sublanes drop their stack/queue); suffix x =
            # expand-skip (leaf-tail iterations branch around the node
            # fetch + slab work); suffix y = drain-skip (all-queues-empty
            # iterations branch around the 3x12-slot MT passes — phase
            # stats measured drain-util 23-54% on real fronts). VERDICT r4
            # #3 leaf-term levers.
            from rust_renderer_tpu.ops import compaction
            wb, rest = v[3:].split("e")
            ex, _, dr = rest.partition("d")
            flags = ""
            while dr and dr[-1] in "kxy":
                flags += dr[-1]
                dr = dr[:-1]
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(wb),
                method="sort", order="morton", any_hit=any_hit,
                row_cursors=8, row_expand=int(ex),
                steady_drain=int(dr or 3),
                cursor_kill="k" in flags, skip_expand="x" in flags,
                skip_drain="y" in flags)
        if v.startswith("rc"):
            # rc<E>: plain row-cursor kernel, no compaction
            return traverse_packet_pallas(
                bvh, o, d, tmin, tmax, any_hit=any_hit, row_cursors=8,
                row_expand=int(v[2:] or 2), steady_drain=3)
        if v.startswith("wsn") and "d" in v[3:]:
            # wsn<W>d<D>: morton windowed compaction + SINGLE-expand steady
            # drain (16 boxes + D rows/iter ~= 2.8k vec ops vs dual's 3.3k).
            # If late walks are drain-bound (iters = rows/D), dropping the
            # second expand is a pure op-count cut.
            from rust_renderer_tpu.ops import compaction
            wb, dr = v[3:].split("d")
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(wb),
                method="sort", order="morton", any_hit=any_hit, dual=False,
                steady_drain=int(dr))
        if v.startswith("wsm") and "d" in v[3:]:
            # wsm<W>d<D>: morton windowed compaction, window W, drain D —
            # the drain-depth sweep (are late walks drain-bound?)
            from rust_renderer_tpu.ops import compaction
            wb, dr = v[3:].split("d")
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(wb),
                method="sort", order="morton", any_hit=any_hit, dual=True,
                steady_drain=int(dr), drain_first=any_hit)
        if v.startswith("wsmf"):
            # morton-ordered windowed compaction + drain-first sdd3
            from rust_renderer_tpu.ops import compaction
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(v[4:]),
                method="sort", order="morton", any_hit=any_hit, dual=True,
                steady_drain=3, drain_first=True)
        if v.startswith("wsm"):
            # windowed compaction with origin-Morton live-lane ordering
            # (dead bit + 30-bit code share one sort key — free vs wsd)
            from rust_renderer_tpu.ops import compaction
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=int(v[3:]),
                method="sort", order="morton", any_hit=any_hit, dual=True,
                steady_drain=3)
        if v.startswith("sk"):
            # occluder-seed kill (K top-area rows tested pre-walk; occluded
            # lanes zeroed) + the full production composition. Closest-hit
            # columns run WITHOUT seeding (occlusion-only mechanism) so
            # they double as a wsm16/wsmf16 control.
            from rust_renderer_tpu.ops import compaction
            if any_hit:
                seed = bvhmod.make_seed_test(bvh, int(v[2:]))
                occ = seed(o, d, tmin, tmax)
                d = jnp.where(occ[..., None], 0.0, d)
            out = compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=16, method="sort",
                order="morton", any_hit=any_hit, dual=True, steady_drain=3,
                drain_first=any_hit)
            if any_hit:
                t_, p_, u_, v_ = out
                p_ = jnp.where(occ, jnp.maximum(p_, 0), p_)
                return t_, p_, u_, v_
            return out
        if v.startswith("wc"):
            # windowed live-lane compaction (wc8 = 8-block windows, sort
            # moves; wcg8 = scatter/gather moves); the in-graph permutation
            # cost is part of the measurement
            from rust_renderer_tpu.ops import compaction
            kw = dict(dual=True) if any_hit else {}
            method = "scatter" if v.startswith("wcg") else "sort"
            wb = int(v[3:] if v.startswith("wcg") else v[2:])
            return compaction.traverse_compacted(
                bvh, o, d, tmin, tmax, window_blocks=wb, method=method,
                any_hit=any_hit, **kw)
        if v == "mvm":
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit,
                                          mask_via_vmem=True)
        if v.startswith("wlrc"):
            # wlrc<N>[k][x][y]: leafN tree + morton win64 compaction +
            # row-cursor e2 d3 (+ the skip-flag suffixes of wrc). leaf8
            # rows pad to the same 128-col fetch as leaf12 but run 8 MT
            # slots per drain instead of 12 — fetch count up ~30%, drain
            # vector cost down 33%.
            from rust_renderer_tpu.ops import compaction
            spec = v[4:]
            flags = ""
            while spec and spec[-1] in "kxy":
                flags += spec[-1]
                spec = spec[:-1]
            return compaction.traverse_compacted(
                alt_trees[int(spec)], o, d, tmin, tmax, window_blocks=64,
                method="sort", order="morton", any_hit=any_hit,
                row_cursors=8, row_expand=2, steady_drain=3,
                cursor_kill="k" in flags, skip_expand="x" in flags,
                skip_drain="y" in flags)
        if v.startswith("wlsd"):
            # leafN tree + sdd3 + 16-block windowed compaction — the full
            # production composition with a fatter leaf row
            from rust_renderer_tpu.ops import compaction
            return compaction.traverse_compacted(
                alt_trees[int(v[4:])], o, d, tmin, tmax, window_blocks=16,
                method="sort", any_hit=any_hit, dual=True, steady_drain=3)
        if v.startswith("lsd"):
            # leafN tree + the sdd3 steady-drain kernel (no compaction)
            return traverse_packet_pallas(alt_trees[int(v[3:])], o, d,
                                          tmin, tmax, any_hit=any_hit,
                                          dual=True, steady_drain=3)
        if v.startswith("leaf"):
            # round-2 production kernel settings per mode (anyhit = dual-pop)
            return traverse_packet_pallas(alt_trees[int(v[4:])], o, d,
                                          tmin, tmax, any_hit=any_hit,
                                          dual=any_hit)
        if v == "ordered":
            return traverse_packet_pallas(bvh, o, d, tmin, tmax,
                                          any_hit=any_hit, ordered=True)
        if v in ("compact", "octsort"):
            shape = o.shape[:-1]
            inv = compact_order(d) if v == "compact" else octsort_order(d)
            of = o.reshape(-1, 3)[inv]
            df = d.reshape(-1, 3)[inv]
            if isinstance(tmax, jnp.ndarray) and tmax.ndim:
                tmaxf = tmax.reshape(-1)[inv].reshape(shape)
            else:
                tmaxf = tmax
            kw = dict(multi=4) if any_hit else {}
            t, p, u, vv = traverse_packet_pallas(
                bvh, of.reshape(shape + (3,)), df.reshape(shape + (3,)),
                tmin, tmaxf, any_hit=any_hit, **kw)
            perm = jnp.zeros_like(inv).at[inv].set(
                jnp.arange(inv.shape[0], dtype=jnp.int32))
            back = lambda x: x.reshape(-1)[perm].reshape(shape)
            return back(t), back(p), back(u), back(vv)
        raise ValueError(v)

    closest_fns = {
        v: jax.jit(lambda o, d, v=v: run_variant(v, o, d, 1e-3, 1e4, False))
        for v in variants
    }
    nee_fns = {
        v: jax.jit(lambda o, d, tm, v=v: run_variant(v, o, d, 1e-3, tm, True))
        for v in variants
    }

    print(f"== closest-hit fronts ({n}x{n}) ==")
    header = "bounce active% " + " ".join(f"{v:>10s}" for v in variants)
    print(header)
    for b, (o, d, frac) in enumerate(closest_fronts):
        row = f"{b:6d} {frac*100:6.1f}% "
        for v in variants:
            ms = bench(closest_fns[v], o, d)
            row += f"{ms:9.2f}m "
        print(row, flush=True)

    print(f"== NEE any-hit doubled fronts ==")
    print(header)
    for b, (o2, d2, tmax2, frac) in enumerate(nee_fronts):
        row = f"{b:6d} {frac*100:6.1f}% "
        for v in variants:
            ms = bench(nee_fns[v], o2, d2, tmax2)
            row += f"{ms:9.2f}m "
        print(row, flush=True)


if __name__ == "__main__":
    main()
