"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/collective tests
run against XLA's host platform with 8 virtual devices. This must happen
before JAX initialises its backends, hence the env vars are set at import time.
"""

import os

# Force CPU: the ambient environment may preset JAX_PLATFORMS to a real
# accelerator (e.g. a tunnelled TPU), which tests must never depend on.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: model/kernel compiles dominate CI time on the
# single-core CPU runner; cache them across processes.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The environment's sitecustomize registers a remote accelerator backend and
# overrides JAX_PLATFORMS; the config flag is the only reliable off switch.
import jax

jax.config.update("jax_platforms", "cpu")

# GOTCHA: this jax version ignores the JAX_COMPILATION_CACHE_DIR env var
# (the config stays None and the cache silently stays disabled) — the suite
# ran ~uncached for two rounds because of it. The config flag works.
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(seed=42)
