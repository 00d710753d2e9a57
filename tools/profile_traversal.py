"""Profile the real wide-kernel traversal and print per-op device times.

Answers: of the ~11 ms primary traversal at 512², how much is the Mosaic
kernel itself vs the XLA pack/unpack around it?
"""
import glob
import gzip
import json
import os
import sys

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
    n = 512
    multi = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    r = rt.Renderer()
    cam = rt.Camera([-10.28, 2.10, -0.18], [0.0, 0.5, 0.0], aspect_ratio=1.0)
    create_scene(r, cam)
    scene = r.pack()
    bvh = bvhmod.build_scene_bvh(scene)
    view = RenderSettings.default().with_camera(cam, n, n)
    py = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1) + 0.5
    o, d = rayops.generate_camera_rays(
        view.inverse_view, view.inverse_projection, px, py, n, n)

    rng = np.random.default_rng(0)
    dd = rng.normal(size=(n, n, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=-1, keepdims=True)
    dd = jnp.asarray(dd)

    f = jax.jit(lambda o, d: traverse_packet_pallas(bvh, o, d, multi=multi))
    jax.block_until_ready(f(o, d))
    jax.block_until_ready(f(o, dd))

    trace_dir = "/tmp/trav_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            jax.block_until_ready(f(o, d))
        for _ in range(3):
            jax.block_until_ready(f(o, dd))

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    durs: dict[str, float] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid_name = ev.get("pid")
            durs[name] = durs.get(name, 0.0) + ev["dur"]
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:18]
    for name, us in top:
        print(f"{us/1000:10.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
