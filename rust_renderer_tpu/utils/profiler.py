"""Profiling: per-pass named scopes + host frame timers + device traces.

The TPU analog of the reference's two-level profiler (SURVEY.md §5.1):
- puffin CPU scopes -> `scope()` host timers aggregated per name,
- gpu-profiler timestamp queries -> `jax.named_scope` markers (visible in
  XLA/TPU traces) + wall-clock around `block_until_ready`,
- puffin_egui window -> `report()` text table; `trace()` wraps
  jax.profiler.trace for TensorBoard-compatible device timelines.

Toggled at runtime like the reference's Q key (main.rs:450-453).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Profiler:
    def __init__(self) -> None:
        self.enabled = True
        self.paused = False
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)
        self._frame_started = 0.0
        self.last_frame_ms = 0.0

    def toggle(self) -> None:
        self.enabled = not self.enabled

    @contextlib.contextmanager
    def scope(self, name: str):
        """Host timing + XLA named scope (shows up in device traces)."""
        if not self.enabled or self.paused:
            with jax.named_scope(name):
                yield
            return
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        dt = time.perf_counter() - t0
        self._totals[name] += dt
        self._counts[name] += 1

    def new_frame(self) -> None:
        now = time.perf_counter()
        if self._frame_started:
            self.last_frame_ms = (now - self._frame_started) * 1000.0
        self._frame_started = now

    def report(self) -> str:
        lines = [f"{'scope':<32}{'calls':>8}{'total ms':>12}{'avg ms':>10}"]
        for name in sorted(self._totals, key=self._totals.get, reverse=True):
            total = self._totals[name] * 1000.0
            count = self._counts[name]
            lines.append(f"{name:<32}{count:>8}{total:>12.2f}{total / count:>10.2f}")
        return "\n".join(lines)

    @contextlib.contextmanager
    def trace(self, log_dir: str = "/tmp/rust_renderer_tpu_trace"):
        """Device-level trace (TensorBoard 'profile' plugin format)."""
        with jax.profiler.trace(log_dir):
            yield


PROFILER = Profiler()
