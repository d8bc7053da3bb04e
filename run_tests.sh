#!/bin/bash
# Test runner with the right environment:
#  - strips the axon TPU sitecustomize from PYTHONPATH (it imports jax at
#    interpreter startup, pinning the CPU backend to 1 device — the sharding
#    tests need 8 virtual devices via xla_force_host_platform_device_count)
#  - forces the CPU backend (tests never need the real chip)
cd "$(dirname "$0")"
export PYTHONPATH="$(pwd)"
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS}"
exec python -m pytest tests/ -q "$@"
