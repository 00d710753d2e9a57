"""Bench: brute-force vs tile-binned rasterizer on the real TPU.

Depth-only shadow-cascade workload (renderers/shadow.rs:111-131): the scene
rasterized with an ortho light matrix at --size². The binned path must win
big at Sponza scale (VERDICT round-1 #6: 4 cascades x 4096² on >=250k tris
in < 200 ms).
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
from rust_renderer_tpu.models import create_scene, create_sponza_scale_scene
from rust_renderer_tpu.ops import raster as raster_ops
from rust_renderer_tpu.ops import shadow as shadow_ops
from rust_renderer_tpu.ops.raster_binned import rasterize_depth_binned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scene", choices=["default", "sponza"], default="default")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-brute", action="store_true")
    args = ap.parse_args()
    n = args.size

    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    builder = create_sponza_scale_scene if args.scene == "sponza" else create_scene
    builder(r, cam)
    scene = r.pack()
    print(f"tris={scene.indices.shape[0]}")

    # Scene-AABB-fit light ortho: every triangle lands on the map (the
    # frustum-fit cascades cover km of empty air at the default z_far and
    # leave the scene a speck — useless as a raster workload).
    sun = np.asarray([0.3, 0.90631, 0.42262], np.float32)
    sun /= np.linalg.norm(sun)
    used = np.unique(np.asarray(scene.indices).reshape(-1))
    pos = np.asarray(scene.positions)[used]
    # Capacity-pattern slots park vertices at FLT_MAX; ignore them.
    pos = pos[np.abs(pos).max(axis=1) < 1e9]
    center = 0.5 * (pos.min(0) + pos.max(0))
    radius = float(np.linalg.norm(pos - center, axis=1).max())
    up = np.asarray([0.0, 1.0, 0.0], np.float32)
    zax = sun  # camera looks along -z = toward the scene
    xax = np.cross(up, zax); xax /= np.linalg.norm(xax)
    yax = np.cross(zax, xax)
    eye = center + sun * radius * 1.5
    view = np.eye(4, dtype=np.float32)
    view[0, :3], view[1, :3], view[2, :3] = xax, yax, zax
    view[:3, 3] = -view[:3, :3] @ eye
    r_ = radius * 1.05
    ortho = np.diag([1.0 / r_, 1.0 / r_, -1.0 / (3.0 * radius), 1.0]).astype(np.float32)
    ortho[2, 3] = 0.0
    mat0 = jnp.asarray((ortho @ view).astype(np.float32))

    def run(f, name):
        out = f(scene.positions, scene.indices)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(scene.positions, scene.indices)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.reps * 1000
        cov = float(jnp.mean((out < 1.0).astype(jnp.float32)))
        print(f"{name:8s} {ms:9.2f} ms/cascade   coverage {cov:.3f}")
        return out, ms

    def binned(pos, idx):
        clip = raster_ops.transform_vertices(pos, mat0)
        return rasterize_depth_binned(clip, idx, n, n)

    def brute(pos, idx):
        clip = raster_ops.transform_vertices(pos, mat0)
        return raster_ops.rasterize_depth(clip, idx, n, n, method="brute")

    out_b, _ = run(jax.jit(binned), "binned")
    if not args.skip_brute:
        out_r, _ = run(jax.jit(brute), "brute")
        both = (np.asarray(out_b) < 1.0) & (np.asarray(out_r) < 1.0)
        dis = float(((np.asarray(out_b) < 1.0) != (np.asarray(out_r) < 1.0)).mean())
        err = float(np.abs(np.asarray(out_b)[both] - np.asarray(out_r)[both]).max()) if both.any() else 0.0
        print(f"coverage disagreement {dis:.5f}, max depth err {err:.2e}")


if __name__ == "__main__":
    main()
