"""Application: scene setup, frame loop, mode switching.

Rebuild of prototype/src/main.rs: owns the Renderer + Graph + Camera + Input
+ settings, rebuilds the render graph every frame for the active mode
(main.rs:487-517), maintains the progressive-accumulation protocol
(total_samples grows each frame, reset by camera/setting changes,
main.rs:400-469), handles mode hotkeys 1/2/3/4 (main.rs:415-428), Q for the
profiler (main.rs:450-453), and kernel hot reload through the directory
watcher (main.rs:430-448). Headless: frames render offscreen; `present`
yields the final image (numpy) to a callback / disk.

Usage:
    app = Application(width=512, height=512)
    app.create_scene()
    app.run(num_frames=16, on_frame=lambda i, img: ...)
"""

from __future__ import annotations

import os

import numpy as np

import rust_renderer_tpu as rt
from rust_renderer_tpu.app.ui import Ui
from rust_renderer_tpu.input import Input
from rust_renderer_tpu.models import create_scene
from rust_renderer_tpu.ops import bvh as bvh_ops
from rust_renderer_tpu.renderers import (
    build_hybrid_render_graph,
    build_minimal_forward_render_graph,
    build_path_tracing_render_graph,
    build_render_graph,
)
from rust_renderer_tpu.settings import RenderGraphMode, RenderSettings, StaticConfig
from rust_renderer_tpu.utils import FpsTimer
from rust_renderer_tpu.utils.image_io import save_png
from rust_renderer_tpu.utils.profiler import PROFILER
from rust_renderer_tpu.utils.watcher import DirectoryWatcher


def _loop_view_update(view, k, aux):
    """Traced per-frame view evolution for Graph.render_loop (frame k of the
    scan): advances the progressive-accumulation counter and clock, and hands
    frames k>0 the CURRENT projection*view as their prev-frame matrices —
    the camera is static inside a device loop, so this matches the host
    loop's one-frame-delayed handoff exactly (main.rs:545-546 semantics)."""
    import jax.numpy as jnp

    pv = (view.projection @ view.view).astype(jnp.float32)
    prev = jnp.where(k == 0, view.prev_frame_projection_view, pv)
    return view.replace(
        total_samples=view.total_samples + k.astype(jnp.uint32) * aux["spf"],
        time=view.time + k.astype(jnp.float32) * aux["tstep"],
        prev_frame_projection_view=prev,
    )


class Application:
    def __init__(
        self,
        width: int = 2000,
        height: int = 1100,
        mode: RenderGraphMode = RenderGraphMode.PATH_TRACED,
        cfg: StaticConfig | None = None,
        sanitize: bool = False,
    ):
        # Repeated graph structures (mode switches, restarts, bench runs)
        # compile once ever — utils/compile_cache.py for the measurements.
        from rust_renderer_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = (cfg or StaticConfig()).replace(width=width, height=height)
        self.renderer = rt.Renderer()
        self.camera = rt.Camera(
            [-10.28, 2.10, -0.18], [0.0, 0.5, 0.0],
            fov_degrees=60.0, aspect_ratio=width / height,
            z_near=0.01, z_far=1000.0, speed=0.2,
        )
        self.graph = rt.Graph(sanitize=sanitize)
        self.input = Input()
        self.ui = Ui()
        self.fps_timer = FpsTimer()
        self.render_graph_mode = mode
        self.total_samples = 0
        self.scene = None
        self.scene_bvh = None
        self.sun_dir = np.array([0.0, 0.90631, 0.42262], np.float32)
        self.view = RenderSettings.default(sun_dir=self.sun_dir)
        self.watcher = DirectoryWatcher(os.path.dirname(os.path.dirname(__file__)))

    # -- scene (main.rs:168-176) --------------------------------------------

    def create_scene(self, builder=create_scene) -> None:
        with PROFILER.scope("create_scene"):
            builder(self.renderer, self.camera)
            self._repack()

    def _repack(self) -> None:
        """Pack scene arrays + (re)build the BVH — the BLAS/TLAS build
        analog (raytracing.rs:89-111)."""
        # Registered up front so the PT graph's animated marching-cubes
        # surface (BASELINE config 5) has a material id in the packed tables.
        self.renderer.ensure_mc_material()
        with PROFILER.scope("pack_scene"):
            self.scene = self.renderer.pack()
        with PROFILER.scope("build_bvh"):
            self.scene_bvh = bvh_ops.build_scene_bvh(self.scene)

    def set_instance_transform(self, instance: int, transform) -> None:
        """Gizmo-move analog: transform edit + TLAS rebuild + accumulation
        reset (main.rs:344-359)."""
        self.renderer.set_instance_transform(instance, transform)
        self._repack()
        self.reset_accumulation()

    def reset_accumulation(self) -> None:
        self.total_samples = 0

    # -- frame loop (main.rs:362-552) ----------------------------------------

    def _handle_hotkeys(self) -> None:
        mapping = {
            "1": RenderGraphMode.PATH_TRACED,
            "2": RenderGraphMode.HYBRID,
            "3": RenderGraphMode.RASTERIZED,
            "4": RenderGraphMode.MINIMAL,
        }
        for key, mode in mapping.items():
            if self.input.key_pressed(key):
                if self.render_graph_mode != mode:
                    self.render_graph_mode = mode
                    self.reset_accumulation()
        if self.input.key_pressed("q"):
            PROFILER.toggle()

    def _check_hot_reload(self) -> None:
        path = self.watcher.check_if_modification()
        if path is None:
            return
        self.reset_accumulation()
        mod = DirectoryWatcher.module_name_for(path)
        if mod:
            self.graph.recompile_shader(mod)

    def _refresh_view(self) -> None:
        """main.rs:459-471."""
        w, h = self.cfg.width, self.cfg.height
        self.total_samples += self.cfg.samples_per_frame
        self.view = self.view.with_camera(self.camera, w, h).replace(
            total_samples=np.uint32(self.total_samples),
            time=np.float32(self.fps_timer.elapsed_seconds()),
            num_lights=np.int32(self.renderer.get_num_lights()),
            sun_dir=np.asarray(self.sun_dir, np.float32),
        )
        # Saved for ReSTIR temporal backprojection: THIS frame's matrices,
        # applied after render, so the next frame backprojects with matrices
        # exactly one frame old (main.rs:545-546 assigns projection*view after
        # recording the frame).
        self._pending_prev_pv = (
            np.asarray(self.view.projection) @ np.asarray(self.view.view)
        ).astype(np.float32)

    def _ensure_environment(self) -> None:
        mode = self.render_graph_mode
        needs_env = mode == RenderGraphMode.RASTERIZED or (
            mode == RenderGraphMode.PATH_TRACED and self.cfg.sky_mode == "cubemap"
        )
        if needs_env and self.renderer.need_environment_map_update:
            # Environment pipeline as separate setup jits (small compiles),
            # seeded into the graph's persistent resources — the analog of
            # the reference's lazily-updated env maps (ibl.rs:63-66).
            from rust_renderer_tpu.ops.ibl import compute_environment

            with PROFILER.scope("environment_update"):
                self.graph.state.update(
                    compute_environment(self.cfg, self.sun_dir)
                )
            self.renderer.need_environment_map_update = False

    def _build_graph(self) -> None:
        mode = self.render_graph_mode
        with PROFILER.scope("build_graph"):
            self.graph.new_frame()
            self.graph.clear()
            if mode == RenderGraphMode.PATH_TRACED:
                build_path_tracing_render_graph(
                    self.graph, self.cfg, self.camera, self.scene_bvh,
                    self.sun_dir,
                    marching_cubes_enabled=bool(
                        int(self.view.marching_cubes_enabled)
                    ),
                    mc_material=self.renderer.ensure_mc_material(),
                    num_lights=self.renderer.get_num_lights(),
                )
            elif mode == RenderGraphMode.RASTERIZED:
                build_render_graph(
                    self.graph, self.cfg, self.camera, self.scene_bvh,
                    self.sun_dir,
                    shadows_enabled=bool(int(self.view.shadows_enabled)),
                    marching_cubes_enabled=bool(int(self.view.marching_cubes_enabled)),
                    raytracing_supported=bool(int(self.view.raytracing_supported)),
                )
            elif mode == RenderGraphMode.MINIMAL:
                build_minimal_forward_render_graph(
                    self.graph, self.cfg, self.camera, self.scene_bvh, self.sun_dir
                )
            else:
                build_hybrid_render_graph(self.graph)

    def render_frame(self):
        """One full frame; returns the resource dict."""
        PROFILER.new_frame()
        with PROFILER.scope("frame"):
            self._handle_hotkeys()
            self._check_hot_reload()

            if self.camera.update(self.input):
                self.reset_accumulation()

            if self.ui.settings_changed(self.view, self.cfg):
                self.reset_accumulation()

            self._refresh_view()
            self._ensure_environment()
            self._build_graph()

            with PROFILER.scope("render"):
                resources = self.graph.render(self.scene, self.view)

            # prev-frame matrix handoff for the next frame's temporal pass.
            self.view = self.view.replace(
                prev_frame_projection_view=self._pending_prev_pv
            )
        self.fps_timer.calculate()
        return resources

    def run_on_device(self, num_frames: int = 1, tstep: float = 1.0 / 60.0):
        """Render `num_frames` frames in ONE device dispatch (the swapchain
        steady-state analog — see Graph.render_loop).

        Per-frame view evolution (accumulation counter, clock, prev-frame
        matrices for ReSTIR temporal reuse) happens on-device via
        `_loop_view_update`; the host-side counters are advanced to match so
        interleaving run() and run_on_device() stays consistent. Returns the
        last frame's present_output (device array; caller np.asarray()s to
        present)."""
        assert num_frames >= 1
        PROFILER.new_frame()
        with PROFILER.scope("frame_loop"):
            self._refresh_view()
            self._ensure_environment()
            self._build_graph()
            reason = self.graph.device_loop_unsupported_reason()
            if reason is not None:
                # A LEADING run of isolated passes is supported by
                # render_loop (batched over frames in its own program —
                # the marching-cubes extract/refit chain rides this); the
                # unsupported shapes (sandwiched isolated passes,
                # all-isolated graphs, prefix passes chaining per-frame
                # persistent state) fall back to the host frame loop.
                # Graph.device_loop_unsupported_reason is the single
                # source of truth shared with render_loop's ValueError.
                import logging

                logging.getLogger(__name__).info(
                    "run_on_device: %s; falling back to the host frame "
                    "loop", reason)
                # _refresh_view already advanced the counters for frame 1;
                # render_frame will do it again, so rewind.
                self.total_samples -= self.cfg.samples_per_frame
                img = None
                for _ in range(num_frames):
                    resources = self.render_frame()
                    img = resources.get("present_output")
                self.fps_timer.calculate()
                return img
            aux = {
                "spf": np.uint32(self.cfg.samples_per_frame),
                "tstep": np.float32(tstep),
            }
            with PROFILER.scope("render_loop"):
                img = self.graph.render_loop(
                    self.scene, self.view, num_frames,
                    view_update=_loop_view_update, aux=aux,
                )
            # Frames 2..N advanced the accumulation protocol on-device;
            # mirror them host-side (frame 1 was counted by _refresh_view).
            self.total_samples += self.cfg.samples_per_frame * (num_frames - 1)
            self.view = self.view.replace(
                total_samples=np.uint32(self.total_samples),
                prev_frame_projection_view=self._pending_prev_pv,
            )
        self.fps_timer.calculate()
        return img

    def run(self, num_frames: int = 1, on_frame=None, save_to: str | None = None,
            present_every: int = 1):
        """Pump `num_frames` frames (the winit loop analog,
        vulkan_base.rs:508-544).

        present_every is the frames-in-flight analog (vulkan_base.rs:389-424
        pipelines 1-3 frames): the host only BLOCKS on a device->numpy
        readback every Nth frame, so jit dispatch runs ahead of the device
        and frame N+1's graph records while frame N renders. present_every=1
        presents every frame (the reference's default); larger values trade
        presentation latency for throughput. The final frame is always read.
        """
        last = None
        last_dev = None

        def present(arr):
            # HUD compositing happens at PRESENT time on the host copy —
            # the analog of the reference recording the egui pass into the
            # swapchain image after the scene passes (ui.rs:56-75).
            return self.ui.compose(arr, self.view, self.cfg,
                                   self.render_graph_mode,
                                   self.fps_timer.fps, self.total_samples)

        for i in range(num_frames):
            self.input.begin_frame()
            resources = self.render_frame()
            if "present_output" in resources:
                last_dev = resources["present_output"]
                if present_every > 0 and (i + 1) % present_every == 0:
                    last = present(np.asarray(last_dev))  # blocks: 'present'
                    if on_frame is not None:
                        on_frame(i, last)
        if last_dev is not None:
            last = present(np.asarray(last_dev))
        if save_to and last is not None:
            save_png(save_to, last)
        return last


def main() -> int:  # pragma: no cover — interactive entry point
    import argparse

    p = argparse.ArgumentParser(description="rust_renderer_tpu offscreen app")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--mode", choices=["pt", "hybrid", "raster", "minimal"], default="pt")
    p.add_argument("--out", default="frame.png")
    p.add_argument("--scene", choices=["default", "rtiow", "cornell", "cubes"],
                   default="default")
    p.add_argument(
        "--small", action="store_true",
        help="shrink offscreen buffers (shadow/cubemap/LUT) for quick runs",
    )
    p.add_argument(
        "--sanitize", action="store_true",
        help="NaN/Inf-check every pass output (the validation-layer analog)",
    )
    p.add_argument(
        "--interactive", action="store_true",
        help="live terminal viewer with keyboard camera/mode controls",
    )
    args = p.parse_args()

    mode = {
        "pt": RenderGraphMode.PATH_TRACED,
        "hybrid": RenderGraphMode.HYBRID,
        "raster": RenderGraphMode.RASTERIZED,
        "minimal": RenderGraphMode.MINIMAL,
    }[args.mode]
    cfg = None
    if args.small:
        cfg = StaticConfig(
            shadow_map_size=256, cubemap_size=64, cubemap_mips=4,
            irradiance_size=16, brdf_lut_size=64, num_bounces=3,
        )
    app = Application(args.width, args.height, mode, cfg, sanitize=args.sanitize)
    from rust_renderer_tpu import models as scene_models

    builder = {
        "default": scene_models.create_scene,
        "rtiow": scene_models.create_rtiow_scene,
        "cornell": scene_models.create_cornell_box_scene,
        "cubes": scene_models.create_cube_scene,
    }[args.scene]
    app.create_scene(builder)
    if args.interactive:
        from rust_renderer_tpu.app.viewer import run_interactive

        run_interactive(app, max_frames=args.frames if args.frames > 0 else None)
    else:
        app.run(args.frames, save_to=args.out)
    print(PROFILER.report())
    print(f"fps={app.fps_timer.fps:.2f} saved={args.out}")
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
