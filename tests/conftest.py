"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend, so this lives at the
top of conftest (pytest imports it before any test module).
"""

import os
import sys

# Force the CPU backend: the ambient environment points JAX at a tunneled
# TPU (and a sitecustomize hook re-registers it regardless of the env var),
# which tests must never grab. The jax.config update below is the override
# that actually sticks.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

# Persistent XLA compilation cache: compiles dominate test wall-clock on the
# CPU backend, and the shapes are stable across runs.
import jax

jax.config.update("jax_platforms", "cpu")
# NB: cache dir is backend- AND host-CPU-specific — entries written by a
# different machine (remote TPU host, or this VM before a live migration
# to different hardware) can SIGILL here (machine-feature mismatch); the
# helper fingerprints /proc/cpuinfo into the path.
from vtaco_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
