"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` (standard JAX practice,
SURVEY.md §4). Must be set before jax initializes.
"""

import os

# NOTE: the heavy lifting (escaping the axon TPU sitecustomize environment)
# happens in rtvqa_test_env.py, loaded via addopts `-p rtvqa_test_env` before
# pytest's capture plugin starts — see that module.

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA cache: recompiling the fused metric programs dominates test
# wall-clock on this 1-core host; cache across test sessions.
import jax  # noqa: E402

_cache_dir = os.path.expanduser("~/.cache/rtvqa_jax_test")
os.makedirs(_cache_dir, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


@pytest.fixture(autouse=True, scope="module")
def _release_executable_mappings():
    """Free each module's compiled executables when the module finishes.

    Every XLA:CPU executable holds tens-to-hundreds of anonymous mappings
    for its JIT code/data. A full single-process ``pytest tests/`` run
    accumulates past ``vm.max_map_count`` (65530 here): measured 65,062
    maps right before a deterministic SIGSEGV inside
    ``backend_compile_and_load`` (or, with the persistent cache on, inside
    the cache's zstd (de)serialization — whichever allocation crossed the
    limit first) around test ~196 of 260; every module passes in
    isolation. ``jax.clear_caches()`` provably returns the mappings
    (1188 -> 464 in a 60-program probe). Per-module clearing bounds the
    peak at one module's working set; the on-disk persistent cache keeps
    the recompiles cheap.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
