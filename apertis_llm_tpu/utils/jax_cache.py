"""Opt-in persistent XLA compilation cache.

Serving bring-up on the measurement TPU pays minutes of first-process
compilation (BENCH_r02: 192 s for the b256 TTFT program). JAX's persistent
compilation cache amortises that across processes — but round 2 observed a
TPU backend abort when a cached executable was deserialised through this
environment's remote-compile backend (commit 66e3cb9), so the cache is
opt-in via ``APERTIS_JAX_CACHE_DIR`` rather than default-on. Set the env
var to enable it; bring-up measurements live in docs/README.md's
serving-bring-up section.
"""

from __future__ import annotations

import os


def maybe_enable_cache() -> str | None:
    """Enable the persistent compilation cache if APERTIS_JAX_CACHE_DIR is
    set. Must run before the first jit compilation. Returns the dir or None."""
    cache_dir = os.environ.get("APERTIS_JAX_CACHE_DIR")
    if not cache_dir:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
