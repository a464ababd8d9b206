"""Persistent XLA compile cache helper.

One call makes repeat CLI/bench invocations skip their multi-minute
compiles. Cache directories are per-backend — artifacts compiled for one
backend (or by a remote compile service) are not safe to execute on
another.
"""

from __future__ import annotations

import os

import jax


def enable_persistent_cache(base_dir: str | None = None):
    base = base_dir or os.environ.get("VTACO_CACHE_DIR", "/tmp/vtaco_jax_cache")
    backend = jax.default_backend()
    path = f"{base}_{backend}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return path
