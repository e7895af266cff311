"""Persistent XLA compilation cache setup (shared by CLI, API, and bench).

Without it every process pays full (possibly remote) compilation latency for
each jitted shape — measured 30-200 s per new shape on the bench host's
relay, vs seconds from the cache."""

from __future__ import annotations

import os


def cache_dir() -> str:
    """The persistent cache directory (also holds the one-shot dispatch
    calibration, engine._dispatch_rates).  Created on first use."""
    path = os.environ.get(
        "PARFASTAAI_JIT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "parfastaai_tpu_jit"),
    )
    os.makedirs(path, exist_ok=True)
    return path


def enable_compilation_cache() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # the cache is an optimization; never fail the run over it
