"""Isolate the per-grid-step fixed cost of the traversal kernel.

Zero-direction rays retire at the degenerate guard: every block does ONE
pop. Timing the wide kernel across multi widths on such rays measures the
pure per-step overhead F(k) — if total time ~ number of steps, the ~45 us
mystery cost is a per-step pipeline effect and larger steps amortize it.
"""
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
from rust_renderer_tpu.ops.pallas.traversal import traverse_packet_pallas


def main():
    n = 512
    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)

    o = jnp.zeros((n, n, 3), jnp.float32)
    d = jnp.zeros((n, n, 3), jnp.float32)  # all degenerate: 1 pop per block

    for multi in (1, 2, 4, 8, 16):
        f = jax.jit(lambda o, d, m=multi: traverse_packet_pallas(
            bvh, o, d, multi=m))
        out = f(o, d)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(o, d)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 10 * 1000
        steps = (n * n // 1024) // multi
        print(f"multi={multi:2d} steps={steps:4d}  {ms:7.3f} ms  "
              f"{ms * 1000 / steps:7.2f} us/step")


if __name__ == "__main__":
    main()
