"""Microbench: Pallas traversal variants on the real TPU (atrium scene).

Times primary rays and a synthetic divergent bounce front for the binary
skip-walk vs the BVH8 stack kernel (ordered / unordered). Usage:
    python tools/bench_traversal.py [--size 512]
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
from rust_renderer_tpu.ops import rays as rayops
from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas
from rust_renderer_tpu.settings import RenderSettings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", choices=["default", "sponza"], default="default")
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()
    n = args.size

    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    if args.scene == "sponza":
        from rust_renderer_tpu.models import create_sponza_scale_scene
        create_sponza_scale_scene(r, cam)
    else:
        create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    print(f"tris={scene.indices.shape[0]} binary_nodes={bvh.num_nodes} "
          f"wide_nodes={bvh.wnode_packed.shape[0]} "
          f"depths bin={bvh.max_depth} wide={bvh.wide_depth}")
    print(f"tables: node {bvh.node_packed.size*4/1e6:.2f} MB, "
          f"wnode {bvh.wnode_packed.size*4/1e6:.2f} MB, "
          f"leaf {bvh.leaf_packed.size*4/1e6:.2f} MB")

    view = RenderSettings.default().with_camera(cam, n, n)
    py = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5
    o, d = rayops.generate_camera_rays(
        view.inverse_view, view.inverse_projection, px, py, n, n)

    # Divergent front: random directions from primary hit points.
    rng = np.random.default_rng(0)
    dd = rng.normal(size=(n, n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    dd = jnp.asarray(dd)

    variants = {
        "binary": dict(wide=False),
        "wide": dict(wide=True, ordered=False, multi=1),
        "wide_ordered": dict(wide=True, ordered=True),
        "wide_multi2": dict(wide=True, multi=2),
        "wide_multi4": dict(wide=True, multi=4),
        "wide_multi8": dict(wide=True, multi=8),
        "anyhit": dict(wide=True, multi=1, any_hit=True),
        "anyhit_multi4": dict(wide=True, multi=4, any_hit=True),
        "anyhit_multi8": dict(wide=True, multi=8, any_hit=True),
        # Production defaults (bvh.make_closest_hit / make_any_hit).
        "rowcursor": dict(wide=True, multi=1, steady_drain=3,
                          row_cursors=8, row_expand=2),
        "rowcursor_any": dict(wide=True, multi=1, any_hit=True,
                              steady_drain=3, row_cursors=8, row_expand=2),
    }
    if args.variants:
        variants = {k: variants[k] for k in args.variants.split(",")}
    mode = bvhmod._pallas_mode(bvh)
    print(f"pallas mode: {mode}")
    results = {}
    for name, kw in variants.items():
        if kw.get("wide", False) and mode == "dma":
            kw = dict(kw, dma_leaf=True)
        f = jax.jit(lambda o, d, kw=kw: traverse_packet_pallas(bvh, o, d, **kw))
        out = f(o, d)  # compile + run
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(o, d)
        jax.block_until_ready(out)
        tp = (time.perf_counter() - t0) / args.reps * 1000
        results[name] = (out, tp)
        # divergent
        out2 = f(o, dd)
        jax.block_until_ready(out2)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out2 = f(o, dd)
        jax.block_until_ready(out2)
        td = (time.perf_counter() - t0) / args.reps * 1000
        print(f"{name:14s} primary {tp:8.2f} ms   divergent {td:8.2f} ms")

    p_ref = np.asarray(results[list(results)[0]][0][1])
    for name in list(results)[1:]:
        p = np.asarray(results[name][0][1])
        print(f"{name}: prim match vs binary = {np.array_equal(p, p_ref)} "
              f"(hits {np.sum(p>=0)}/{p.size})")


if __name__ == "__main__":
    main()
