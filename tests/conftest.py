"""Test harness configuration (SURVEY §4).

Tests run on the host CPU with an 8-device virtual mesh
(``--xla_force_host_platform_device_count=8``) so every ``shard_map`` code
path exercised here is the same one that runs over real ICI on a pod slice.
f64 is enabled so analytic-vs-numeric Jacobian checks and oracle-parity
assertions can use tight (1e-9-ish) tolerances.

This file must set the environment BEFORE jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# FORCE cpu (not setdefault): the container exports JAX_PLATFORMS=axon (the
# tunneled TPU chip), and running the f64 test suite there is both slow
# (every jit is a remote TPU compile) and unsupported (no f64 eigh/svd on
# TPU).  Set PYSFM_TEST_PLATFORM to override deliberately.
_plat = os.environ.get("PYSFM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat

import jax  # noqa: E402

# The axon boot shim (sitecustomize via PYTHONPATH=/root/.axon_site) runs at
# interpreter start — BEFORE this conftest — and pins the jax_platforms
# CONFIG (not just the env var) to the tunneled TPU.  An explicit config
# value beats JAX_PLATFORMS, so re-pin it here; without this the "cpu"
# suite silently dispatches every jit to the TPU (slow, and f64
# LU/eigh/svd are unsupported there).
jax.config.update("jax_platforms", _plat)

# x64 everywhere EXCEPT the on-hardware tier: f64 temporaries (and i64
# iota/index types) inside the Pallas kernels fail Mosaic legalization on
# the TPU, and the TPU tier deliberately tests the f32 production path.
jax.config.update("jax_enable_x64", "axon" not in _plat)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles hundreds of XLA CPU executables in one
    process; with all of them held live, the LAST test's compile
    (test_tracks.py::test_images_to_reconstruction, a full-pipeline BA
    graph) segfaults inside XLA's backend_compile_and_load — reproduced
    in suite order in r3 and r4, never standalone.  Bounding the live
    executable count keeps the native compiler healthy; per-module
    recompiles cost little because shapes rarely repeat across modules.
    """
    yield
    jax.clear_caches()
