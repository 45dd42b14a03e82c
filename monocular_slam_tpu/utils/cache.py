"""Persistent XLA compilation cache management.

The reference is an ahead-of-time-compiled C++ binary with zero startup
cost; our per-program XLA compiles are the analogous cost and they dominate
time-to-first-frame (measured: ~16 min cold warmup for the tracker + BA
programs on TPU v5e behind a remote-compile tunnel, BENCH_r01.json). Every
entry point (CLI, bench, tests) calls `enable_compilation_cache()` so each
program is compiled once per machine, not once per process.
"""

from __future__ import annotations

import os

_ENABLED = False


def default_cache_dir() -> str:
    return os.environ.get(
        "MSLAM_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "monocular_slam_tpu", "xla"),
    )


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Returns the cache dir, or None if it could not be enabled (e.g. a
    read-only filesystem — caching is an optimization, never a requirement).
    """
    global _ENABLED
    import jax

    path = path or default_cache_dir()
    if _ENABLED:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: small programs are numerous here (per-stage jits)
        # and the default min-size/min-time gates would skip most of them.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        return None
    _ENABLED = True
    return path
