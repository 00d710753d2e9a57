#!/usr/bin/env python
"""Benchmark: path-traced frame rate at 1080p, 1 spp, on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 30 fps at 1080p 1 spp on one v5e chip.

The benchmarked workload is the flagship path: the reference path tracer
(ops/pathtrace.py — jittered primary rays, bounce loop, sun + light NEE,
atmosphere sky, progressive accumulation) on the RTIOW sphere scene at
1920x1080, the scene family the reference's PT mode is built around.
Ray count per frame = W*H*bounces*3 trace calls actually executed
(closest-hit + sun any-hit + light closest-hit per bounce).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    import rust_renderer_tpu as rt
    from rust_renderer_tpu.models import create_rtiow_scene
    from rust_renderer_tpu.ops import pathtrace
    from rust_renderer_tpu.settings import RenderSettings, StaticConfig

    width, height = 1920, 1080
    bounces = 5

    renderer = rt.Renderer()
    camera = rt.Camera(
        [0, 1, 4], [0, 0.5, -1], fov_degrees=60.0, aspect_ratio=width / height
    )
    create_rtiow_scene(renderer, camera)
    scene = renderer.pack()
    cfg = StaticConfig(width=width, height=height, samples_per_frame=1, num_bounces=bounces)
    base_view = RenderSettings.default(num_lights=0).with_camera(camera, width, height)
    base_view = base_view.replace(lights_enabled=jnp.int32(0))

    @jax.jit
    def frame(scene, view, accum):
        return pathtrace.path_trace(scene, view, cfg, accum)

    accum = jnp.zeros((height, width, 3), jnp.float32)

    # Warmup / compile.
    view = base_view.replace(total_samples=jnp.uint32(1))
    res = frame(scene, view, accum)
    res.output.block_until_ready()

    n_frames = 20
    t0 = time.perf_counter()
    for f in range(2, 2 + n_frames):
        view = base_view.replace(total_samples=jnp.uint32(f))
        res = frame(scene, view, res.accumulation)
    res.output.block_until_ready()
    dt = (time.perf_counter() - t0) / n_frames

    fps = 1.0 / dt
    rays_per_frame = width * height * bounces * 3
    mrays = rays_per_frame / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "pathtrace_1080p_1spp_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
                "detail": {
                    "frame_ms": round(dt * 1000, 3),
                    "mrays_per_sec": round(mrays, 1),
                    "bounces": bounces,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
