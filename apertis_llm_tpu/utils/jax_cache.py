"""Opt-in persistent XLA compilation cache.

Serving bring-up on the measurement TPU pays minutes of first-process
compilation (BENCH_r02: 192 s for the b256 TTFT program; ~28 s in round 3
after the fused-scan rework). JAX's persistent compilation cache amortises
that across processes. Round-3 diagnosis of round 2's revert (66e3cb9), by
a two-process probe with cache-module DEBUG logging:

  * cache KEYS are fully stable across processes (every program, Pallas
    included, hit on the second process; engine HLO hashes also verified
    byte-identical cross-process on CPU);
  * plain-XLA executables deserialise fast (hit 0.23 s vs 1.42 s compile
    — this is why cached model init drops 52 s -> 14.2 s);
  * but deserialising a PALLAS-containing executable through THIS
    environment's remote-compile backend took 345 s against a 5.2 s
    recompile — a backend pathology, not a key/serialisation bug.

Every serving hot program contains Pallas kernels, so the cache stays
opt-in via ``APERTIS_JAX_CACHE_DIR`` rather than default-on here. On a
standard local TPU runtime (no remote-compile tunnel) deserialisation is a
local protobuf load and the same cache delivers warm bring-up in seconds.
Measurements live in docs/README.md's serving-bring-up section.
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
