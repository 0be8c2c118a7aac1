"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Tests never require TPU hardware; sharding tests use
``xla_force_host_platform_device_count`` per the standard JAX recipe. This
must run before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the test host has a single CPU core, so
# recompiling the integrator on every run would dominate test time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force CPU via
# config, which wins over the plugin's registration.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir() -> str:
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference sources not mounted")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def models_dir(reference_dir) -> str:
    return os.path.join(reference_dir, "3Dmodels")


@pytest.fixture
def rtol():
    return 1e-5


def assert_allclose(a, b, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
