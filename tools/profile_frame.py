"""Profile one full PT-graph frame on the TPU; print per-op device times.

Targets the remaining frame time data-driven: which of the ~11 traversal
kernels + ReSTIR/scatter fusions actually dominate.
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rust_renderer_tpu.app.main import Application
from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "512"
    mode = sys.argv[2] if len(sys.argv) > 2 else "pt"
    if "x" in size:
        w, h = (int(v) for v in size.split("x"))
    else:
        w = h = int(size)
    cfg = StaticConfig(
        width=w, height=h, samples_per_frame=1, num_bounces=5,
        sky_mode="cubemap", cubemap_size=256, cubemap_mips=8,
        irradiance_size=32, brdf_lut_size=128,
    )
    gmode = (RenderGraphMode.RASTERIZED if mode == "raster"
             else RenderGraphMode.PATH_TRACED)
    app = Application(w, h, gmode, cfg)
    scene_name = sys.argv[3] if len(sys.argv) > 3 else "default"
    if scene_name == "default":
        app.create_scene()
    else:
        from rust_renderer_tpu.models import scenes as scenes_mod
        app.create_scene(getattr(scenes_mod, f"create_{scene_name}_scene"))
    app.run(num_frames=2)  # compile + steady

    trace_dir = "/tmp/frame_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        img = app.run(num_frames=2, present_every=0)
        for v in app.graph.state.values():
            jax.block_until_ready(v)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as fh:
        trace = json.load(fh)
    durs: dict[str, float] = {}
    events: dict[str, list[float]] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev and not ev.get(
            "name", ""
        ).startswith("$"):
            name = ev["name"]
            durs[name] = durs.get(name, 0.0) + ev["dur"]
            events.setdefault(name, []).append(ev["dur"])
    print(f"-- top ops over 2 frames (us) --")
    for name, us in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
        evs = sorted(events[name], reverse=True)
        per = " ".join(f"{e/1000:.1f}" for e in evs[:14])
        print(f"{us/1000:9.2f} ms  n={len(evs):3d}  {name[:80]}")
        print(f"             [{per}]")


if __name__ == "__main__":
    main()
