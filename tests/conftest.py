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

if os.environ.get("CAM_TPU_TESTS") != "1":
    # Keep the axon TPU plugin OUT of xdist worker processes: the
    # sitecustomize registers a PJRT tunnel session in EVERY interpreter
    # whose env carries PALLAS_AXON_POOL_IPS — including CPU-only test
    # workers that never touch the device. When the tunnel is wedged
    # (round-3/4 incidents) those sessions abort/hang worker processes
    # mid-test ('Fatal Python error: Aborted' inside XLA compile, '[gwN]
    # node down'). This process already started (its registration, if
    # any, is done); clearing the env here means workers SPAWNED by
    # xdist/execnet inherit a clean env and start as pure-CPU pythons.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (may already be imported by sitecustomize — that's fine)

if os.environ.get("CAM_TPU_TESTS") == "1":
    # opt-in hardware run (tests/test_pallas_kernels.py): keep the real TPU
    # backend and f32 (no x64 on TPU)
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache shared by all test runs/workers (safe for
# concurrent access — entries land via atomic rename). Two reasons beyond
# speed: (1) this host has 4 CPUs and XLA's CPU compile of the big coupled
# graphs occasionally dies under load (LLVM segfault/abort — see
# repo memory notes); a warm cache removes almost every compile from a
# rerun, which both shrinks wall time ~5x and removes the crash surface.
# (2) xdist workers duplicate every compile 3x without it.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")   # quiet the loader's
# pseudo-feature warnings (+prefer-no-scatter etc. — set by this host's
# own compile, so the AOT results are ISA-compatible)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def run_test_in_subprocess(request, timeout=1200):
    """Re-run the current test node in a fresh interpreter and report its
    verdict; in the child, return False so the caller executes the body.

    Workaround for a deterministic XLA:CPU/LLVM process-state bug (round-4
    VERDICT weak #1): compiling certain large eager `lax.scan` programs in
    zm_convr segfaults ('Fatal Python error: Segmentation fault' inside
    backend_compile_and_load) once the process has a particular prior
    compile history — e.g. tests/test_zm_conv.py's equivalence classes after
    the 14 earlier module tests. Every affected test passes in a fresh
    process (verified 5/5 in isolation), so the affected tests call this at
    the top: the parent spawns `pytest <nodeid>` in a clean child where the
    compile succeeds (warm persistent cache keeps it fast), and the child —
    marked by CAM_SUBPROC_TEST=1 — runs the real body.

    Usage::

        def test_foo(self, request):
            if run_test_in_subprocess(request):
                return   # parent: child already ran and passed the body
            ...real test body...
    """
    import subprocess
    import sys

    if os.environ.get("CAM_SUBPROC_TEST") == "1":
        return False  # we are the child: run the real body
    env = dict(os.environ, CAM_SUBPROC_TEST="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-n", "0",
         "-p", "no:cacheprovider", request.node.nodeid],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"subprocess-isolated test failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}")
    return True
