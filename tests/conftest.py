"""Test config: force CPU with a virtual 8-device mesh.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
(the JAX idiom for testing distributed code without real chips — SURVEY.md §4).
Must run before jax initialises, hence module-level in conftest.

This machine has ONE CPU core: compiles are expensive, so the persistent
compilation cache is enabled — a graph compiles once across the whole suite
and across reruns.
"""
import os
import sys

# The axon TPU-relay plugin proxies even the "cpu" platform through the
# shared TPU tunnel (bf16 matmuls, cross-process deadlocks). Strip it from
# the import path BEFORE jax loads so tests run on the genuine local CPU.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if ".axon_site" not in p
)
os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax._src at interpreter start (before this
# conftest runs), so jax's config has already captured JAX_PLATFORMS=axon
# from the session env — the os.environ write above is too late for it.
# Update the live config value directly.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
