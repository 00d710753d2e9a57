"""Kernel-module hot-reload watcher (rebuild of utopian/src/directory_watcher.rs).

The reference watches `utopian/shaders/` with a 100ms debounce and recompiles
the touched GLSL (main.rs:430-448). Here the 'shaders' are Python kernel
modules (rust_renderer_tpu/ops, renderers); the watcher polls mtimes and
reports changed module names for `Graph.recompile_shader`.
"""

from __future__ import annotations

import os
import time


class DirectoryWatcher:
    def __init__(self, root: str, debounce_seconds: float = 0.1):
        self.root = root
        self.debounce = debounce_seconds
        self._mtimes: dict[str, float] = {}
        self._last_event: dict[str, float] = {}
        self._scan(initial=True)

    def _scan(self, initial: bool = False) -> list[str]:
        changed = []
        now = time.time()
        for dirpath, _dirs, files in os.walk(self.root):
            for f in files:
                if not f.endswith(".py"):
                    continue
                path = os.path.join(dirpath, f)
                try:
                    m = os.path.getmtime(path)
                except OSError:
                    continue
                old = self._mtimes.get(path)
                self._mtimes[path] = m
                if initial or old is None or m <= old:
                    continue
                # Debounce (directory_watcher.rs:26-40).
                if now - self._last_event.get(path, 0.0) < self.debounce:
                    continue
                self._last_event[path] = now
                changed.append(path)
        return changed

    def check_if_modification(self) -> str | None:
        """Returns one modified file path, or None."""
        changed = self._scan()
        return changed[0] if changed else None

    @staticmethod
    def module_name_for(path: str) -> str | None:
        """Map a file path inside the package to its dotted module name."""
        path = os.path.abspath(path)
        marker = "rust_renderer_tpu" + os.sep
        idx = path.find(marker)
        if idx < 0:
            return None
        rel = path[idx:].removesuffix(".py")
        return rel.replace(os.sep, ".").removesuffix(".__init__")
