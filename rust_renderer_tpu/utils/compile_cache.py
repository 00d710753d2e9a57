"""Persistent XLA compilation cache.

The reference pays shader/pipeline compiles once and reuses cached
pipelines across runs via its desc-equality caches (utopian/src/
graph.rs:637-671); our analog of that cost is the remote jit compile —
~80 s for the 1080p PT frame program PER PROCESS, the dominant
interactive stall (VERDICT r2 #6). jax's persistent compilation cache
makes repeated structures free ACROSS processes; measured over the axon
TPU tunnel: a 23.8 s compile replays in 0.5 s from a warm cache.

Program-splitting was measured as the WRONG fix (tools/
bench_compile_split.py): isolating reference_pt into its own XLA program
raised total compile 81 -> 105 s and the steady frame 3.54 -> 8.64 s
(the boundary materializes every intermediate and kills cross-pass
fusion). StaticConfig.split_pt_program stays available but off.

Disable with RR_NO_COMPILE_CACHE=1; relocate with RR_COMPILE_CACHE=path.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_enabled = False


def enable_persistent_cache() -> bool:
    """Turn on jax's persistent compilation cache (idempotent). Must run
    before the first compilation; safe to call multiple times. Returns
    whether the cache is active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("RR_NO_COMPILE_CACHE") == "1":
        return False
    path = os.environ.get(
        "RR_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "rust_renderer_tpu", "xla"
        ),
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Remote compiles are worth caching even when short; the default
        # 1 MiB entry-size floor would skip small setup jits.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
        log.info("persistent compilation cache at %s", path)
    except Exception:  # pragma: no cover - config names vary across jax
        log.exception("persistent compilation cache unavailable; continuing")
        return False
    return True
