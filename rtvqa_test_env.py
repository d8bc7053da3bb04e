"""Early pytest plugin (loaded via addopts `-p rtvqa_test_env`) that fixes the
test environment BEFORE pytest's capture plugin takes over the fds.

The axon TPU sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at
interpreter startup with JAX_PLATFORMS=axon, which pins the backend to the
remote TPU (tests would crawl through remote compiles) and blocks the
8-virtual-device CPU flag — environment changes after interpreter start are
ineffective. When that situation is detected, re-exec pytest once in a
corrected environment. `-p` plugins import during option preparsing, before
capture replaces stdout/stderr, so the re-exec'd process inherits the real
terminal/pipe fds.
"""

import os
import sys

if os.environ.get("RTVQA_TEST_REEXEC") != "1" and (
    os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"
    or "axon" in os.environ.get("PYTHONPATH", "")
):
    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["RTVQA_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["PYTHONPATH"] = repo
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
