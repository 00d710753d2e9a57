"""Frame-graph runtime: passes as functions, frames as jitted dataflow.

Rebuild of the reference's core (utopian/src/graph.rs + pass.rs), redesigned
for XLA (SURVEY.md §7.1):

- The reference rebuilds its render graph every frame over name-cached
  resources (graph.rs:36-44, prototype/src/main.rs:487-517). Here the graph is
  likewise rebuilt per frame in cheap Python; execution compiles the whole
  pass list into ONE jitted XLA computation, cached by the graph's structural
  signature — re-recording is free after the first frame, exactly like the
  reference's desc-equality caches make pipeline creation free.
- Vulkan barriers (graph.rs:743-856) vanish: pass reads/writes become SSA
  dataflow through a resource dict threaded pass to pass.
- Persistent resources (accumulation image, ReSTIR reservoirs — the
  reference's never-freed GraphResources) live in `Graph.state` and are
  carried across frames; written names listed in `persist` update it.
- Shader hot reload (graph.rs:673-701, pipeline.rs:109-121): `recompile()`
  bumps a generation counter so the next render re-traces with the swapped
  kernel functions; a failed trace/compile logs and KEEPS the previous
  executable, mirroring the reference's compile-failure tolerance.

Pass API parity: `PassBuilder` mirrors graph.rs:120-416 (`read`, `write`,
`uniforms`, `render`, `dispatch`...); pass functions receive a resource dict
plus (scene, view, uniforms) and return their writes.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable

import jax
import jax.numpy as jnp

from rust_renderer_tpu.settings import pack_view, unpack_view

log = logging.getLogger(__name__)

TextureId = str
BufferId = str


@dataclasses.dataclass
class ResourceDesc:
    """Named resource descriptor (graph.rs:563-619 texture/buffer descs).
    Cached by (name, shape, dtype) equality; `clear` is the initial value.
    sanitize=False exempts the resource from the NaN/Inf sanitizer — for
    float tables whose columns carry BITCAST int32 payloads (tri ids /
    child refs), where -1 and small negative ids alias NaN bit patterns
    and would swamp the report with false positives."""

    name: str
    shape: tuple[int, ...]
    dtype: Any
    clear: float | int = 0.0
    sanitize: bool = True

    def allocate(self) -> jax.Array:
        return jnp.full(self.shape, self.clear, self.dtype)


@dataclasses.dataclass
class RenderPass:
    """One recorded pass (pass.rs:14-30): reads/writes by name + kernel fn."""

    name: str
    reads: list[str]
    writes: list[str]
    uniforms: dict[str, Any]
    fn: Callable  # fn(resources: dict, scene, view, uniforms) -> dict of writes
    fn_key: Any  # structural identity for the jit cache
    isolated: bool = False  # compiled as its OWN XLA program (see isolate())


class PassBuilder:
    """Fluent pass construction (graph.rs:120-416)."""

    def __init__(self, graph: "Graph", name: str):
        self._graph = graph
        self._name = name
        self._reads: list[str] = []
        self._writes: list[str] = []
        self._uniforms: dict[str, Any] = {}
        self._fn: Callable | None = None
        self._isolated = False

    def isolate(self) -> "PassBuilder":
        """Compile this pass as its OWN XLA program instead of fusing it
        into the frame program. Use for passes whose bodies are large
        elementwise graphs (e.g. the 32^3 marching-cubes extract): one
        giant fused frame program is a known TPU-worker crash mode, and
        splitting also keeps the per-structure compile cost of the main
        frame program down (the reference's per-pipeline compile economics,
        graph.rs:637-671)."""
        self._isolated = True
        return self

    def read(self, resource: str) -> "PassBuilder":
        self._reads.append(resource)
        return self

    def write(self, resource: str) -> "PassBuilder":
        self._writes.append(resource)
        return self

    # Aliases mirroring the reference's specialized write kinds
    # (graph.rs:146-208); dataflow makes them equivalent here.
    image_write = write
    write_buffer = write
    load_write = write

    def read_buffer(self, resource: str) -> "PassBuilder":
        return self.read(resource)

    def uniforms(self, name: str, value: Any) -> "PassBuilder":
        """Per-pass uniform data (graph.rs:307-340); becomes a traced pytree
        argument of the frame function."""
        self._uniforms[name] = value
        return self

    def render(self, fn: Callable) -> "PassBuilder":
        """The pass body (graph.rs:213-221). fn(resources, scene, view,
        uniforms) -> dict {written_name: array}."""
        self._fn = fn
        return self

    dispatch = render
    trace_rays = render

    def presentation_pass(self, *_args, **_kw) -> "PassBuilder":
        return self

    def build(self) -> None:
        """Record into the graph (graph.rs:342-415)."""
        assert self._fn is not None, f"pass '{self._name}' has no render fn"
        fn = self._fn
        self._graph.passes.append(
            RenderPass(
                name=self._name,
                reads=self._reads,
                writes=self._writes,
                uniforms=self._uniforms,
                fn=fn,
                fn_key=(getattr(fn, "__module__", "?"), getattr(fn, "__qualname__", repr(fn))),
                isolated=self._isolated,
            )
        )


class Graph:
    """The frame graph (graph.rs:99-106 + 440-1065)."""

    def __init__(self, sanitize: bool = False,
                 suppress: tuple[str, ...] = ()) -> None:
        """sanitize=True is the validation-layer analog (SURVEY.md §5.2; the
        reference enables the Vulkan validation layer unconditionally,
        vulkan_base.rs:170): every pass output is NaN/Inf-checked inside the
        jit and nonzero counts are logged per (pass, resource) after the
        frame. `suppress` names passes whose findings are muted — the analog
        of the reference's suppressed false-positive id (vulkan_base.rs:55-58).
        """
        self.passes: list[RenderPass] = []
        self.descs: dict[str, ResourceDesc] = {}
        self.persist: set[str] = set()
        self.state: dict[str, jax.Array] = {}
        self._compiled: dict[Any, Callable] = {}
        # Per program-group: (last successfully executed fn, its generation)
        # — the keep-old-executable hot-reload fallback.
        self._last_good: dict[int, tuple[Callable, int]] = {}
        self._generation = 0
        self.current_frame = 0
        self.sanitize = bool(sanitize)
        self.suppress = tuple(suppress)
        self.last_sanitizer_report: dict[str, int] = {}
        self._row_mesh = None
        self._row_height = 0
        self._row_width = None
        self._row_axis = "rows"

    def shard_image_rows(self, mesh, height: int, width: int | None = None,
                         axis: str = "rows") -> None:
        """Shard every image-space resource over `mesh` by row bands.

        Multi-device analog of SURVEY §5.7 for the RASTERIZED/MINIMAL graphs
        (the PT chain shards via parallel/tiles.py shard_map): each pass
        output whose leading dim equals the frame height gets a
        `with_sharding_constraint(P(axis, None, ...))`, and XLA's SPMD
        partitioner propagates the layout through the whole frame program.

        Halo choice (VERDICT r3 #5b): SSAO and FXAA sample neighbors via
        STATIC shifts (pad+slice — ops/ssao.py ssao_stencil, ops/fxaa.py), so
        we let GSPMD insert the halo exchanges for the band edges instead of
        hand-rolling ppermute strips: the shift offsets are compile-time
        constants, exactly the pattern the partitioner handles with minimal
        collective-permutes. Light-space resources (cascade shadow maps,
        cubemaps, BRDF LUT) keep their replicated layout — every band reads
        all of them, like every GPU in a multi-GPU split-frame renderer
        holds the full shadow atlas.
        """
        self._row_mesh = mesh
        self._row_height = int(height)
        # When the frame width is known, the image-space predicate requires
        # shape[:2] == (H, W) so a non-image resource whose leading dim
        # happens to equal H (square LUT, H-sized atlas) is never
        # force-sharded (advisor r4).
        self._row_width = None if width is None else int(width)
        self._row_axis = axis

    # -- per-frame recording (graph.rs:459-484) -----------------------------

    def new_frame(self) -> None:
        self.current_frame += 1

    def clear(self) -> None:
        self.passes = []

    # -- resources (graph.rs:563-635) ---------------------------------------

    def create_texture(
        self, name: str, width: int, height: int, channels: int = 4,
        dtype=jnp.float32, clear: float = 0.0, persistent: bool = False,
        sanitize: bool = True,
    ) -> TextureId:
        """Name-keyed texture cache (graph.rs:563-587). (H, W, C) layout."""
        shape = (height, width, channels) if channels > 1 else (height, width)
        return self._declare(name, shape, dtype, clear, persistent, sanitize)

    def create_buffer(
        self, name: str, shape: tuple[int, ...], dtype=jnp.float32,
        clear: float = 0.0, persistent: bool = False, sanitize: bool = True,
    ) -> BufferId:
        """graph.rs:593-619."""
        return self._declare(name, tuple(shape), dtype, clear, persistent,
                             sanitize)

    def _declare(self, name, shape, dtype, clear, persistent,
                 sanitize: bool = True) -> str:
        desc = ResourceDesc(name, tuple(shape), dtype, clear, sanitize)
        old = self.descs.get(name)
        if old is not None and (old.shape != desc.shape or old.dtype != desc.dtype):
            # Resolution change etc.: drop the cached resource (the reference
            # never frees, but it also never resizes; we handle it).
            self.state.pop(name, None)
        self.descs[name] = desc
        if persistent:
            self.persist.add(name)
            if name not in self.state:
                self.state[name] = desc.allocate()
        return name

    def add_pass(self, name: str) -> PassBuilder:
        """graph.rs:534-557 (add_pass_from_desc); pipeline descs are implicit
        in the pass fn (kernels are code, not SPIR-V)."""
        return PassBuilder(self, name)

    # -- hot reload (graph.rs:673-701) --------------------------------------

    def recompile(self) -> None:
        """Invalidate compiled frames; next render re-traces with whatever
        kernel functions the builders now reference. The previous executable
        is kept as fallback (pipeline.rs:109-121 semantics)."""
        self._generation += 1

    def recompile_shader(self, module_name: str) -> bool:
        """Reload one kernel module by name and invalidate (the analog of
        per-path shader recompile, graph.rs:683-701). Returns success."""
        import importlib
        import sys

        mod = sys.modules.get(module_name)
        if mod is None:
            log.warning("recompile_shader: module %s not loaded", module_name)
            return False
        try:
            importlib.reload(mod)
        except Exception:  # keep old module on failure
            log.exception("recompile_shader: reload of %s failed; keeping old", module_name)
            return False
        self.recompile()
        return True

    def recompile_all_shaders(self) -> None:
        import importlib
        import sys

        for name, mod in list(sys.modules.items()):
            if name.startswith("rust_renderer_tpu.ops") or name.startswith(
                "rust_renderer_tpu.renderers"
            ):
                try:
                    importlib.reload(mod)
                except Exception:
                    log.exception("reload of %s failed; keeping old", name)
        self.recompile()

    # -- execution (graph.rs:637-671 prepare + 703-1065 render) -------------

    def _signature(self) -> Any:
        """Structural cache key: pass list + resource descs + generation.
        The analog of the reference's desc-equality pipeline cache."""
        return (
            self._generation,
            self.sanitize,
            None if self._row_mesh is None else (
                self._row_axis, tuple(self._row_mesh.shape.items()),
                self._row_height, self._row_width,
                # Two meshes with equal axis shapes but different devices (or
                # device order) must not share cached group fns (advisor r4).
                tuple(d.id for d in self._row_mesh.devices.flat),
            ),
            tuple(
                (p.name, p.fn_key, tuple(p.reads), tuple(p.writes),
                 tuple(p.uniforms), p.isolated)
                for p in self.passes
            ),
            tuple(sorted((d.name, d.shape, str(d.dtype), d.sanitize)
                         for d in self.descs.values())),
            tuple(sorted(self.persist)),
        )

    @staticmethod
    def _group_passes(passes: list[RenderPass]) -> list[list[RenderPass]]:
        """Consecutive non-isolated passes form one XLA program; each
        isolated pass is its own program (PassBuilder.isolate)."""
        groups: list[list[RenderPass]] = []
        for p in passes:
            if p.isolated or not groups or groups[-1][-1].isolated:
                groups.append([p])
            else:
                groups[-1].append(p)
        return groups

    def prepare(self) -> None:
        """Allocate any missing persistent resources (the lazy part of
        graph.rs:637-671; transient resources materialize inside the jit)."""
        for name in self.persist:
            if name not in self.state:
                self.state[name] = self.descs[name].allocate()

    def device_loop_unsupported_reason(self) -> str | None:
        """Why `render_loop` cannot faithfully run the CURRENT pass list
        (None = supported). The single source of truth for both
        render_loop's ValueError and Application.run_on_device's host-loop
        fallback — keeping the two in sync by construction."""
        passes = self.passes
        n_prefix = 0
        while n_prefix < len(passes) and passes[n_prefix].isolated:
            n_prefix += 1
        prefix, main = passes[:n_prefix], passes[n_prefix:]
        if any(p.isolated for p in main):
            return ("isolated pass after a non-isolated pass — only a "
                    "leading isolated prefix is supported")
        if prefix and not main:
            return ("every pass is isolated — the scan body would render "
                    "nothing")
        if prefix:
            frame_written = set()
            for p in passes:
                frame_written.update(p.writes)
            for p in prefix:
                # A prefix pass reading per-frame-updated PERSISTENT state
                # would see the pre-dispatch value for every batched frame
                # (lax.map has no carry) — silently diverging from the
                # host loop's frame-to-frame chaining.
                bad = set(p.reads) & self.persist & frame_written
                if bad:
                    return ("isolated prefix pass "
                            f"'{p.name}' reads per-frame persistent state "
                            f"{sorted(bad)} — the batched prefix cannot "
                            "chain it across frames")
        return None

    def render(self, scene, view) -> dict[str, jax.Array]:
        """Execute the frame: one jitted computation over all passes.

        Returns the full resource dict after the frame (read e.g.
        'present_output'); persistent resources in `Graph.state` are updated
        in place for the next frame.
        """
        self.prepare()
        sig = self._signature()
        descs = dict(self.descs)
        persist = set(self.persist)
        groups = self._group_passes(list(self.passes))
        sanitize = self.sanitize
        row_mesh, row_h, row_w, row_axis = (
            self._row_mesh, self._row_height, self._row_width, self._row_axis)

        def constrain_rows(arr):
            """Row-band layout for image-space arrays (shard_image_rows)."""
            if (row_mesh is not None and hasattr(arr, "ndim")
                    and arr.ndim >= 2 and arr.shape[0] == row_h
                    and (row_w is None or arr.shape[1] == row_w)):
                from jax.sharding import NamedSharding, PartitionSpec
                spec = PartitionSpec(row_axis, *([None] * (arr.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    arr, NamedSharding(row_mesh, spec))
            return arr

        def make_group_fn(passes: list[RenderPass]):
            def group_fn(resources: dict, scene, view_buf, uniforms: list[dict]):
                # One packed f32 buffer = one host->device transfer per call
                # (vs ~30 leaf transfers, each paying tunnel latency — the
                # ViewUniformData single-UBO-write analog, renderer.rs:84-120).
                view = unpack_view(view_buf)
                resources = dict(resources)
                checks: dict[str, jax.Array] = {}
                # Transient resources materialize on first use; declared
                # clears behave like the reference's attachment clears.
                for name, desc in descs.items():
                    if name not in resources:
                        resources[name] = desc.allocate()
                for p, u in zip(passes, uniforms):
                    outs = p.fn(resources, scene, view, u)
                    if outs:
                        for wname, arr in outs.items():
                            arr = constrain_rows(arr)
                            resources[wname] = arr
                            d = descs.get(wname)
                            if (sanitize
                                    and jnp.issubdtype(arr.dtype,
                                                       jnp.floating)
                                    and (d is None or d.sanitize)):
                                checks[f"{p.name}/{wname}"] = jnp.sum(
                                    (~jnp.isfinite(arr)).astype(jnp.int32)
                                )
                return resources, checks

            return group_fn

        resources: dict[str, jax.Array] = dict(self.state)
        checks: dict[str, jax.Array] = {}
        view_buf = pack_view(view)
        for gi, group in enumerate(groups):
            key = (sig, gi)
            if key not in self._compiled:
                log.info(
                    "compiling frame program %d/%d: %d passes (%s)",
                    gi + 1, len(groups), len(group),
                    ", ".join(p.name for p in group),
                )
                self._compiled[key] = jax.jit(make_group_fn(group))
            uniforms = [p.uniforms for p in group]
            fn = self._compiled[key]
            try:
                resources, group_checks = fn(
                    resources, scene, view_buf, uniforms)
                self._last_good[gi] = (fn, self._generation)
            except Exception:
                # Keep-old-executable is ONLY for hot-reload-induced
                # failures (pipeline.rs:109-121 recompiles a shader and
                # keeps the old pipeline on error). A failure with no
                # reload since the last good frame is a genuine runtime
                # fault (OOM, device fault) and must surface, not silently
                # re-render stale output.
                old = self._last_good.get(gi)
                reloaded = old is not None and self._generation != old[1]
                if not reloaded:
                    raise
                log.exception(
                    "hot-reloaded frame program %d failed to compile/execute;"
                    " keeping previous pipeline", gi,
                )
                self._compiled[key] = old[0]
                resources, group_checks = old[0](
                    resources, scene, view_buf, uniforms
                )
            checks.update(group_checks)
        new_state = {n: resources[n] for n in persist if n in resources}
        self.state.update(new_state)
        if checks:
            # Debug mode: forcing the counts to host each frame is the point.
            report = {k: int(v) for k, v in checks.items() if int(v) > 0}
            self.last_sanitizer_report = report
            for k, count in report.items():
                pass_name = k.split("/", 1)[0]
                if pass_name not in self.suppress:
                    log.error("sanitizer: %s produced %d non-finite values", k, count)
        return resources

    # -- steady-state device loop -------------------------------------------

    def render_loop(self, scene, view, n_frames: int, view_update=None,
                    aux=None):
        """Run `n_frames` full frames inside ONE jitted `lax.scan`.

        The per-frame host loop (`render`) pays graph-rebuild Python, pytree
        flattening, and one remote-launch latency (~7-12 ms over the axon
        tunnel) PER FRAME — at 256² that overhead exceeds the compute
        several-fold (VERDICT r3 #2). The reference never pays it: its
        swapchain loop submits command buffers without blocking on readback
        (utopian/src/vulkan_base.rs:389-424). This is the XLA analog: the
        steady-state frame becomes the body of a `lax.scan`, persistent
        resources are the carry (donated, so accumulation/reservoir buffers
        update in place), and the host pays ONE dispatch per n_frames.

        `view_update(view, k, aux)` (a module-level function — its
        module/qualname is the cache key) derives frame k's RenderSettings
        from the base view on-device (accumulation counter, clock, prev-frame
        matrices). `aux` is a traced pytree of per-call constants for it.

        Semantics notes vs `render`:
        - a PREFIX of isolated passes (recorded before any non-isolated
          pass) runs batched over all n_frames in its OWN program first —
          `lax.map` over the frame index, outputs stacked with a leading
          time axis — and the main scan body indexes the stacks at frame k.
          This keeps crash-prone / compile-heavy bodies (the 164k-slot
          marching-cubes extract, PassBuilder.isolate) OUT of the scan
          program while still removing the per-frame host round-trip
          (VERDICT r4 #2). The prefix must not read main-pass outputs, and
          main passes must DECLARE their reads of prefix outputs (only
          declared reads are stacked into the scan); an isolated pass
          after a non-isolated one is unsupported (ValueError — callers
          fall back to the host loop);
        - sanitize IS supported (VERDICT r4 #7): per-(pass, resource)
          non-finite counts ride the scan carry, summed across the N
          frames, and land in `last_sanitizer_report` after the dispatch —
          the production perf path stays debuggable (the reference keeps
          its validation layer on unconditionally, vulkan_base.rs:170).
          Hot-reload-fallback is still unsupported here;
        - a carried checksum folds each frame's `present_output` so XLA
          cannot elide iterations of graphs with no cross-frame state
          (RASTERIZED mode's frames are independent).

        Returns the LAST frame's `present_output`; `Graph.state` is updated
        with the final persistent resources.
        """
        reason = self.device_loop_unsupported_reason()
        if reason is not None:
            raise ValueError(f"render_loop: {reason}")
        self.prepare()
        passes = list(self.passes)
        descs = dict(self.descs)
        n_prefix = 0
        while n_prefix < len(passes) and passes[n_prefix].isolated:
            n_prefix += 1
        prefix, main = passes[:n_prefix], passes[n_prefix:]
        main_reads = set()
        for p in main:
            main_reads.update(p.reads)
        written = set()
        for p in main:
            written.update(p.writes)
        prefix_writes: list[str] = []
        for p in prefix:
            for wname in p.writes:
                if wname not in prefix_writes:
                    prefix_writes.append(wname)
        # Stack only what the scan needs: declared main reads + persistents.
        stacked_names = tuple(
            n for n in prefix_writes if n in main_reads or n in self.persist)
        # Carry only persistent resources some main pass writes; invariant
        # persistents (e.g. the prefiltered environment mips) ride as plain
        # traced args so the scan carry stays lean.
        carry_names = tuple(sorted(
            n for n in self.persist if n in self.state and n in written))
        inv_names = tuple(sorted(
            n for n in self.state if n not in carry_names))
        present_name = "present_output" if "present_output" in descs else None
        vu_key = (getattr(view_update, "__module__", None),
                  getattr(view_update, "__qualname__", None))
        sig = self._signature()
        sanitize = self.sanitize

        def _float_write_keys(pass_list):
            keys = []
            for p in pass_list:
                for w in p.writes:
                    d = descs.get(w)
                    if (d is not None and d.sanitize and jnp.issubdtype(
                            jnp.dtype(d.dtype), jnp.floating)):
                        keys.append((p.name, w))
            return keys

        def _count_checks(pass_list, outs_by_pass):
            """Non-finite counts for each declared float write (the
            sanitize analog of `render`'s per-pass checks)."""
            checks = {}
            for p, outs in zip(pass_list, outs_by_pass):
                for w in p.writes:
                    if (p.name, w) in _san_keys and w in (outs or {}):
                        checks[f"{p.name}/{w}"] = jnp.sum(
                            (~jnp.isfinite(outs[w])).astype(jnp.int32))
            return checks

        _san_keys = set(_float_write_keys(prefix) + _float_write_keys(main)
                        ) if sanitize else set()

        stacked = {}
        prefix_checks = {}
        if prefix:
            pkey = (sig, "loop_prefix", n_frames, inv_names, vu_key,
                    stacked_names)
            if pkey not in self._compiled:
                log.info(
                    "compiling %d-frame batched prefix program: %d isolated "
                    "passes (%s)", n_frames, len(prefix),
                    ", ".join(p.name for p in prefix))

                def prefix_fn(inv_state, scene, view_buf, aux, uniforms):
                    def per_frame(k):
                        view = unpack_view(view_buf)
                        if view_update is not None:
                            view = view_update(view, k, aux)
                        resources = dict(inv_state)
                        for name, desc in descs.items():
                            if name not in resources:
                                resources[name] = desc.allocate()
                        outs_by_pass = []
                        for p, u in zip(prefix, uniforms):
                            outs = p.fn(resources, scene, view, u)
                            outs_by_pass.append(outs)
                            if outs:
                                resources.update(outs)
                        return ({n: resources[n] for n in stacked_names},
                                _count_checks(prefix, outs_by_pass))

                    # lax.map (not vmap): compiles the prefix body ONCE and
                    # loops serially — no vectorization blow-up of the
                    # already-huge extract body; outputs gain a leading
                    # n_frames axis.
                    return jax.lax.map(
                        per_frame, jnp.arange(n_frames, dtype=jnp.int32))

                self._compiled[pkey] = jax.jit(prefix_fn)
            inv_state0 = {n: self.state[n] for n in inv_names}
            stacked, prefix_checks = self._compiled[pkey](
                inv_state0, scene, pack_view(view),
                {} if aux is None else aux, [p.uniforms for p in prefix])

        key = (sig, "loop", n_frames, carry_names, inv_names,
               vu_key, present_name, stacked_names)
        if key not in self._compiled:
            log.info("compiling %d-frame loop program: %d passes",
                     n_frames, len(main))

            def loop_fn(carry_state, inv_state, stacked, scene, view_buf,
                        aux, uniforms):
                def body(carry, k):
                    st, csum, last_img, san = carry
                    view = unpack_view(view_buf)
                    if view_update is not None:
                        view = view_update(view, k, aux)
                    resources = dict(inv_state)
                    resources.update(st)
                    for name, arr in stacked.items():
                        resources[name] = jax.lax.dynamic_index_in_dim(
                            arr, k, axis=0, keepdims=False)
                    for name, desc in descs.items():
                        if name not in resources:
                            # A prefix-written name that was NOT stacked
                            # (because no main pass DECLARED reading it) is
                            # deliberately left out: touching it from a
                            # main-pass body would otherwise silently read
                            # desc-allocated zeros here while the host loop
                            # reads the real prefix output. The KeyError at
                            # trace time points at the missing .read().
                            if name in prefix_writes and name not in stacked:
                                continue
                            resources[name] = desc.allocate()
                    outs_by_pass = []
                    for p, u in zip(main, uniforms):
                        outs = p.fn(resources, scene, view, u)
                        outs_by_pass.append(outs)
                        if outs:
                            resources.update(outs)
                    if sanitize:
                        # .get: a declared write the fn didn't emit this
                        # frame contributes nothing.
                        frame_checks = _count_checks(main, outs_by_pass)
                        san = {n: san[n] + frame_checks.get(n, 0)
                               for n in san}
                    new_st = {n: resources[n] for n in carry_names}
                    img = last_img
                    if present_name is not None:
                        img = resources[present_name]
                        csum = csum + jnp.sum(img.astype(jnp.float32))
                    return (new_st, csum, img, san), None

                init_img = (descs[present_name].allocate()
                            if present_name is not None
                            else jnp.zeros((), jnp.float32))
                san0 = ({f"{pn}/{w}": jnp.int32(0)
                         for pn, w in _float_write_keys(main)}
                        if sanitize else {})
                (st, csum, img, san), _ = jax.lax.scan(
                    body, (carry_state, jnp.float32(0.0), init_img, san0),
                    jnp.arange(n_frames, dtype=jnp.int32))
                return st, csum, img, san

            self._compiled[key] = jax.jit(loop_fn, donate_argnums=(0,))
        fn = self._compiled[key]
        carry_state = {n: self.state[n] for n in carry_names}
        inv_state = {n: self.state[n] for n in inv_names}
        uniforms = [p.uniforms for p in main]
        st, _csum, img, san = fn(carry_state, inv_state, stacked, scene,
                                 pack_view(view), {} if aux is None else aux,
                                 uniforms)
        self.state.update(st)
        if sanitize:
            # Counts are summed over the n_frames of the dispatch (prefix
            # passes contribute their per-frame stacks' totals).
            checks = {kname: int(jnp.sum(v))
                      for kname, v in prefix_checks.items()}
            checks.update({kname: int(v) for kname, v in san.items()})
            report = {kname: c for kname, c in checks.items() if c > 0}
            self.last_sanitizer_report = report
            for kname, count in report.items():
                if kname.split("/", 1)[0] not in self.suppress:
                    log.error("sanitizer: %s produced %d non-finite values "
                              "across the %d-frame loop", kname, count,
                              n_frames)
        # A persistent resource written ONLY by the prefix ends the loop at
        # its last frame's value.
        for n in stacked_names:
            if n in self.persist and n not in written:
                self.state[n] = stacked[n][-1]
        self.current_frame += n_frames
        return img
