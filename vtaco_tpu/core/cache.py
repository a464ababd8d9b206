"""Persistent XLA compile cache helper.

One call makes repeat CLI/bench invocations skip their multi-minute
compiles. Cache directories are per-backend — artifacts compiled for one
backend (or by a remote compile service) are not safe to execute on
another — and, for the CPU backend, per host-CPU fingerprint: XLA:CPU
stores AOT machine code keyed only by the program, so artifacts written
on one machine can SIGILL on another (observed when this VM migrated to
a host with a different avx512/amx feature set).
"""

from __future__ import annotations

import hashlib
import os

import jax


def _host_cpu_tag() -> str:
    """Short fingerprint of the host CPU's ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return platform.machine()


def enable_persistent_cache(base_dir: str | None = None):
    base = base_dir or os.environ.get("VTACO_CACHE_DIR", "/tmp/vtaco_jax_cache")
    try:
        backend = jax.default_backend()
    except RuntimeError:
        # backend init failed (e.g. remote TPU worker recovering); the
        # caller will surface that at first device use — don't fail here
        return None
    path = f"{base}_{backend}"
    if backend == "cpu":
        path = f"{path}_{_host_cpu_tag()}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return path
