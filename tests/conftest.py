"""Test configuration: force a virtual 8-device CPU platform.

Must run before any jax import so the flags take effect. Tests exercise
the same code that runs on TPU (pure JAX; pallas kernels run in
interpret mode under CPU — see tests/test_pallas.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent kernel-mode-gate verdict cache: several tests
# monkeypatch the gate with fakes (test_bench.py), and a fake verdict
# must never be written to — or read from — the real user cache
# (~/.cache/raintpu_mode_gate.json); a concurrent production CLI once
# picked up a test's fake 'diverged' verdict and silently downgraded.
os.environ["RAINTPU_GATE_CACHE"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pre-pins jax_platforms (axon TPU tunnel); override so
# tests run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
