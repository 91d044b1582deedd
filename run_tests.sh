#!/bin/bash
# Test runner: genuine local-CPU JAX (the axon relay plugin must not load —
# it proxies even the "cpu" platform through the shared TPU tunnel; see
# tests/conftest.py). Run from the repo root.
cd "$(dirname "$0")"
exec env PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
