"""Where do the ~70 s of per-structure compile go?

Builds the PT graph at a given size, then times the FIRST render (compile)
of: the full pass list, and each contiguous sub-group of passes compiled
alone. Also times a trivial one-pass graph as the remote-compile RPC floor.
Run on the TPU (fresh process per measurement would be ideal; within one
process each jit is a distinct cache entry so timings are honest compiles,
though the tunnel session is warm after the first).

Usage: python tools/profile_compile.py [size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rust_renderer_tpu.app.main import Application
from rust_renderer_tpu.settings import RenderGraphMode, StaticConfig


def time_compile(graph, scene, view, label, keep=None):
    """Compile+run the graph with only the passes named in `keep` (None =
    all). Restores the full pass list afterwards."""
    all_passes = list(graph.passes)
    if keep is not None:
        graph.passes = [p for p in all_passes if p.name in keep]
    names = [p.name for p in graph.passes]
    graph._compiled.clear()
    t0 = time.perf_counter()
    try:
        out = graph.render(scene, view)
        for v in out.values():
            jax.block_until_ready(v)
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt:7.1f} s   passes={names}", flush=True)
    except Exception as e:  # a sub-group may lack produced inputs
        print(f"{label:28s} FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        graph.passes = all_passes


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = StaticConfig(
        width=n, height=n, samples_per_frame=1, num_bounces=5,
        sky_mode="cubemap", cubemap_size=256, cubemap_mips=8,
        irradiance_size=32, brdf_lut_size=128,
    )
    app = Application(n, n, RenderGraphMode.PATH_TRACED, cfg)
    app.create_scene()

    # Warm the tunnel + env pipeline with frame 1 (its own compiles).
    t0 = time.perf_counter()
    app.run(num_frames=1)
    print(f"frame 1 (env capture + first graph) {time.perf_counter()-t0:.1f} s",
          flush=True)

    scene, view = app.scene, app.view
    graph = app.graph
    names = [p.name for p in graph.passes]
    print("passes:", names, flush=True)

    time_compile(graph, scene, view, "full graph (recompile)")
    time_compile(graph, scene, view, "gbuffer only", keep={"gbuffer"})
    time_compile(graph, scene, view, "restir chain",
                 keep={"reset_reservoirs", "initial_ris", "temporal_reuse",
                       "spatial_reuse"})
    time_compile(graph, scene, view, "reference_pt only",
                 keep={"reference_pt"})
    time_compile(graph, scene, view, "present only",
                 keep={"reference_pt_present"})


if __name__ == "__main__":
    main()
