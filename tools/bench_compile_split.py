"""Measure the PT frame-program split (StaticConfig.split_pt_program).

VERDICT r2 #6: every graph structure pays one monolithic remote compile
(83 s at 1080p). Splitting the frame at the reference_pt boundary
(gbuffer+ReSTIR | bounce loop | present) should shrink per-structure
compile superlinearly at the cost of ~2 extra program launches per frame
(~7-12 ms each over the axon tunnel — PERFORMANCE.md round-3 launch
latency).

Reports, for fused vs split, at the given resolution:
  - steady-structure compile time (frame 2: first frame after the env
    capture frame, i.e. the structure every mode/resolution change pays)
  - steady-state frame time (mean over N frames)

Usage: python tools/bench_compile_split.py [--size 1920x1080] [--frames 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(split: bool, width: int, height: int, frames: int) -> dict:
    import jax

    from rust_renderer_tpu.app.main import Application
    from rust_renderer_tpu.models.scenes import create_scene
    from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig

    cfg = StaticConfig(
        width=width, height=height, samples_per_frame=1, num_bounces=5,
        sky_mode="cubemap", cubemap_size=256, cubemap_mips=8,
        irradiance_size=32, brdf_lut_size=128, split_pt_program=split,
    )
    app = Application(width, height, RenderGraphMode.PATH_TRACED, cfg)
    app.create_scene(create_scene)

    t0 = time.perf_counter()
    app.run(num_frames=1)  # env capture + its frame structure
    jax.block_until_ready(app.graph.state["accumulation_image"])
    t_frame1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    app.run(num_frames=1)  # steady structure: compile + execute
    jax.block_until_ready(app.graph.state["accumulation_image"])
    t_frame2 = time.perf_counter() - t0

    t0 = time.perf_counter()
    app.run(num_frames=frames, present_every=0)
    jax.block_until_ready(app.graph.state["accumulation_image"])
    dt = (time.perf_counter() - t0) / frames

    return {
        "split": split,
        "frame1_env_s": round(t_frame1, 1),
        "steady_compile_plus_exec_s": round(t_frame2, 1),
        "steady_compile_s": round(t_frame2 - dt, 1),
        "steady_frame_ms": round(dt * 1000, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--modes", default="fused,split")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    for mode in args.modes.split(","):
        r = measure(mode == "split", w, h, args.frames)
        print(r, flush=True)


if __name__ == "__main__":
    main()
