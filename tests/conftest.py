"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The session environment pins JAX_PLATFORMS=axon (a TPU tunnel) and an axon
sitecustomize imports jax at interpreter startup, so plain env-var overrides
come too late. `jax.config.update("jax_platforms", ...)` still works before
backend initialization, and XLA_FLAGS is read at backend-creation time.

Sharding-equivalence tests use the 8 virtual CPU devices; numerics tests use
float64 to reproduce the reference's r8 semantics (SURVEY §7.1.5).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (may already be imported by sitecustomize — that's fine)

if os.environ.get("CAM_TPU_TESTS") == "1":
    # opt-in hardware run (tests/test_pallas_kernels.py): keep the real TPU
    # backend and f32 (no x64 on TPU)
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
