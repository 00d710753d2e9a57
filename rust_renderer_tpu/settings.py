"""Render settings and per-frame view uniforms.

Mirrors the reference's ``ViewUniformData`` (utopian/src/renderer.rs:84-120):
five matrices, eye/sun, sampling parameters, and 16 u32 feature toggles that
every shader reads through the view UBO (utopian/shaders/include/view.glsl).

TPU-native split (SURVEY.md §5.6): values that change per frame or toggle
frequently are *traced* pytree leaves (`RenderSettings`) so flipping them does
not recompile the frame function — mirroring the reference's
single-pipeline-many-flags design. Values that change the *shape or structure*
of the computation (resolution, bounce count, samples per frame, graph mode)
are static and hashable (`StaticConfig`); changing them re-traces, exactly like
the reference's pipeline permutations would.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import numpy as np


class RenderGraphMode(enum.Enum):
    """Render graph modes (reference: prototype/src/main.rs:5-11)."""

    PATH_TRACED = 0
    HYBRID = 1
    RASTERIZED = 2
    MINIMAL = 3


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Compile-time configuration: anything that changes traced shapes.

    Reference analogs: window size (prototype/src/main.rs:39), shadow map size
    (renderers/mod.rs:47-59), cubemap size (ibl.rs:18), marching-cubes grid
    (marching_cubes.rs:17), RIS candidate count (restir_sampling.glsl:49).
    """

    width: int = 2000
    height: int = 1100
    samples_per_frame: int = 1
    num_bounces: int = 5
    shadow_map_size: int = 4096
    shadow_cascade_count: int = 4
    cubemap_size: int = 512
    cubemap_mips: int = 8
    irradiance_size: int = 64
    brdf_lut_size: int = 512
    mc_grid: int = 32
    ris_candidates: int = 32
    spatial_neighbors: int = 5
    spatial_radius: int = 30
    max_num_lights: int = 1024
    # Path-tracer miss shading: "exact" integrates the atmosphere per miss
    # ray (reference.rmiss behavior); "cubemap" samples the captured
    # environment map (the reference's own TODO, ~100x cheaper).
    sky_mode: str = "exact"
    # FURNACE_TEST (reference.rmiss:13-28): compile-time define that replaces
    # the sky with constant white — an energy-conservation diagnostic (a
    # furnace-lit lambertian scene must converge to its albedo). Static, like
    # the reference's #ifdef.
    furnace_test: bool = False
    # Windowed live-lane compaction for the PT bounce traversals
    # (ops/compaction.py): lanes sort live-first within windows of N
    # adjacent packet blocks, so late bounce fronts skip dead blocks.
    # 0 = off. Scheduling-only: results are bit-identical. Default 64
    # (snaps to 45 at 1080p's 2025 blocks): with Morton ordering the
    # window sweep is monotonic up to 64 then REVERSES — wsm64 beats
    # wsm16 by 7-18% on b2-b4 fronts, wsm128 is a wash, and global
    # (wsm256 at 512²) loses everywhere (sort cost + frame-wide origin
    # scramble). Round-3 history: 16 was the wsd16 (live-first) optimum
    # before Morton ordering existed.
    compact_window: int = 64
    # Occlusion (any-hit) queries compact over WIDER windows: under the
    # round-5 skip branches the drain phase only runs while some queue is
    # live, so the larger window's better Morton locality wins on every
    # NEE front (-3..-7%, tools/bench_fronts.py wrc128e2d3y vs 64) while
    # closest stays mixed at 128 (camera front +21%).
    compact_window_any: int = 128
    # Ordering of live lanes within each compaction window: "morton" sorts
    # by origin Morton code (unions are origin-driven — clustering origins
    # narrows each surviving block's walk), "live" keeps stable image
    # order. Morton shares the dead-bit sort key so it costs nothing
    # extra; TPU-measured round 3 (tools/bench_fronts.py wsm16/wsmf16,
    # two runs): closest b2-b4 -10..-17%, NEE any-hit b1-b4 -13..-30%,
    # camera front a wash. Results stay exact (scheduling only).
    compact_order: str = "morton"
    # Occlusion-query seeding: test every NEE/shadow ray against the K
    # largest-total-area leaf rows BEFORE traversal (ops/bvh.py
    # make_seed_test); already-occluded lanes get zero directions and
    # retire at the degenerate-ray guard, so compaction drops them from
    # the walk. Exact (occlusion is boolean). 0 = off. Default 4:
    # TPU-measured on real NEE fronts (tools/bench_fronts.py sk4 vs
    # wsmf16) -11/-7/-5% on anyhit b1-b3, flat b4, ~free elsewhere
    # (48 static-constant triangle tests, no gathers). The CPU replay's
    # bigger win (0.37x) only applies to full-length occlusion queries —
    # real light rays are distance-limited and already cheap.
    seed_rows: int = 4
    # Split the PT frame into separate XLA programs at the reference_pt
    # boundary (gbuffer+ReSTIR | bounce loop | present) via
    # PassBuilder.isolate. MEASURED AND REJECTED as a compile-latency fix
    # (tools/bench_compile_split.py, 1080p): total compile 81 -> 105 s and
    # steady frame 3.54 -> 8.64 s — the boundary materializes every
    # intermediate and kills cross-pass fusion. Kept for experiments; the
    # shipped fix is the persistent compilation cache
    # (utils/compile_cache.py: repeated structures are ~free across
    # processes).
    split_pt_program: bool = False

    def replace(self, **kw: Any) -> "StaticConfig":
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderSettings:
    """Traced per-frame view data + runtime feature toggles.

    Field-for-field analog of ``ViewUniformData``
    (utopian/src/renderer.rs:84-120). Toggles are int32 scalars (not Python
    bools) so flipping them in the UI does not trigger a jit re-trace; shaders
    branch with `jnp.where`, mirroring the reference's uniform-flag reads.
    """

    # Matrices (world <-> clip). Stored row-convention: `m @ v` column vectors.
    view: jax.Array
    projection: jax.Array
    inverse_view: jax.Array
    inverse_projection: jax.Array
    prev_frame_projection_view: jax.Array

    eye_pos: jax.Array  # (3,)
    sun_dir: jax.Array  # (3,)
    total_samples: jax.Array  # u32 scalar: progressive accumulation counter
    time: jax.Array  # f32 scalar
    num_lights: jax.Array  # i32 scalar

    # Runtime feature toggles (u32/i32 scalars).
    shadows_enabled: jax.Array
    ssao_enabled: jax.Array
    fxaa_enabled: jax.Array
    cubemap_enabled: jax.Array
    ibl_enabled: jax.Array
    sky_enabled: jax.Array
    sun_shadow_enabled: jax.Array
    lights_enabled: jax.Array
    max_num_lights_used: jax.Array
    marching_cubes_enabled: jax.Array
    temporal_reuse_enabled: jax.Array
    spatial_reuse_enabled: jax.Array
    rebuild_tlas: jax.Array
    accumulation_limit: jax.Array
    use_ris_light_sampling: jax.Array
    raytracing_supported: jax.Array
    # Debug visualizations (traced, so toggling never recompiles):
    # fxaa_debug paints AA'd pixels red/green by edge direction
    # (fxaa.glsl:247-258); cascade_debug tints by CSM cascade
    # (deferred.frag:104-107 CASCADE_DEBUG + shadow_mapping.glsl:56-68).
    fxaa_debug: jax.Array = np.int32(0)
    cascade_debug: jax.Array = np.int32(0)

    @staticmethod
    def default(
        view: np.ndarray | None = None,
        projection: np.ndarray | None = None,
        eye_pos=(0.0, 0.0, 0.0),
        sun_dir=(0.0, 0.90631, 0.42262),
        num_lights: int = 0,
    ) -> "RenderSettings":
        """Defaults mirroring prototype/src/main.rs:55-86 (samples_per_frame=1,
        num_bounces=5, accumulation_limit=999999 live in StaticConfig/here)."""
        eye4 = np.eye(4, dtype=np.float32)
        view = np.asarray(view, np.float32) if view is not None else eye4
        projection = (
            np.asarray(projection, np.float32) if projection is not None else eye4
        )
        # Host (numpy) leaves: jit transfers them per call; keeping settings
        # host-side means UI change-tracking never blocks on device readback.
        f = np.float32
        i = np.int32

        def flag(v: int):
            return np.int32(v)

        return RenderSettings(
            view=view,
            projection=projection,
            inverse_view=np.linalg.inv(view).astype(np.float32),
            inverse_projection=np.linalg.inv(projection).astype(np.float32),
            prev_frame_projection_view=(projection @ view).astype(np.float32),
            eye_pos=np.asarray(eye_pos, f),
            sun_dir=np.asarray(sun_dir, f),
            total_samples=np.uint32(0),
            time=np.float32(0.0),
            num_lights=np.int32(num_lights),
            shadows_enabled=flag(1),
            ssao_enabled=flag(1),
            fxaa_enabled=flag(1),
            cubemap_enabled=flag(1),
            ibl_enabled=flag(1),
            sky_enabled=flag(1),
            sun_shadow_enabled=flag(1),
            lights_enabled=flag(1),
            max_num_lights_used=np.int32(1024),
            marching_cubes_enabled=flag(0),
            temporal_reuse_enabled=flag(1),
            spatial_reuse_enabled=flag(1),
            rebuild_tlas=flag(0),
            accumulation_limit=np.int32(999999),
            use_ris_light_sampling=flag(0),
            raytracing_supported=flag(1),
        )

    def with_camera(self, camera, width: int, height: int) -> "RenderSettings":
        """Refresh view matrices from a Camera (mirrors main.rs:459-471)."""
        view = camera.get_view()
        proj = camera.get_projection()
        return dataclasses.replace(
            self,
            view=view,
            projection=proj,
            inverse_view=np.linalg.inv(view).astype(np.float32),
            inverse_projection=np.linalg.inv(proj).astype(np.float32),
            eye_pos=np.asarray(camera.get_position(), np.float32),
        )

    def replace(self, **kw: Any) -> "RenderSettings":
        return dataclasses.replace(self, **kw)


# -- packed view transfer ----------------------------------------------------
#
# RenderSettings keeps ~30 small numpy leaves host-side (UI change tracking
# reads them without device syncs), but handing the pytree straight to the
# frame jit makes EVERY leaf its own host->device transfer each call — and
# under the axon tunnel each transfer pays multi-ms latency (measured:
# ~0.6 s/frame of host dispatch at 1080p vs 1.8 s device, PERFORMANCE.md
# round 3). pack_view folds the whole struct into ONE f32 buffer (ints
# bitcast), so a frame pays ONE transfer; unpack_view rebuilds the pytree
# inside the jit with static slices + bitcasts (free under XLA).
# The reference's analog is the single ViewUniformData UBO write per frame
# (utopian/src/renderer.rs:84-120) — same idea: one packed upload.

_VIEW_SPEC: tuple[list[tuple[str, tuple, Any, int, int]], int] | None = None


def _view_spec():
    """(name, shape, dtype, offset, size) per field, from the canonical
    default() instance; field order is the dataclass declaration order."""
    global _VIEW_SPEC
    if _VIEW_SPEC is None:
        d = RenderSettings.default()
        spec = []
        off = 0
        for f in dataclasses.fields(RenderSettings):
            v = np.asarray(getattr(d, f.name))
            n = int(v.size)
            spec.append((f.name, v.shape, v.dtype, off, n))
            off += n
        _VIEW_SPEC = (spec, off)
    return _VIEW_SPEC


@jax.tree_util.register_pytree_node_class
class PackedView:
    """Explicit tag for a packed RenderSettings buffer.

    unpack_view used to duck-type on shape==(total,) f32, which would
    silently reinterpret any coincidentally-shaped plain array handed to
    Graph.render as a RenderSettings (ADVICE r3). The tag makes the packed
    form unambiguous while staying a one-leaf pytree (still ONE
    host->device transfer per frame)."""

    def __init__(self, buf):
        self.buf = buf

    def tree_flatten(self):
        return (self.buf,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def pack_view(v):
    """Fold a RenderSettings into one flat float32 buffer (host side).
    Non-RenderSettings views (tests hand the graph plain dicts) pass
    through unchanged; unpack_view mirrors the choice."""
    if not isinstance(v, RenderSettings):
        return v
    spec, total = _view_spec()
    buf = np.empty((total,), np.float32)
    for name, shape, dtype, off, n in spec:
        a = np.asarray(getattr(v, name), dtype).reshape(-1)
        buf[off:off + n] = a.view(np.float32)
    return PackedView(buf)


def unpack_view(buf):
    """Traced inverse of pack_view: static slices + bitcasts, no data motion
    on device (XLA folds them into the consumers). Anything that is not a
    PackedView passes through unchanged."""
    spec, total = _view_spec()
    if not isinstance(buf, PackedView):
        return buf
    buf = buf.buf
    kw = {}
    for name, shape, dtype, off, n in spec:
        sl = buf[off:off + n]
        if dtype != np.float32:
            sl = jax.lax.bitcast_convert_type(sl, dtype)
        kw[name] = sl.reshape(shape)
    return RenderSettings(**kw)
