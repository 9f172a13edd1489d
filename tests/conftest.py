"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md section 4, multi-node
testing note).  Must run before jax is imported anywhere.

NOTE: this environment's axon plugin force-registers itself via
``jax.config.update("jax_platforms", "axon,cpu")`` at import, so the
JAX_PLATFORMS env var alone is NOT enough -- we must override the config
after import (and before any backend is created)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite jit-compiles many (width, shape)
# variants; caching keeps reruns fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/minnow_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
