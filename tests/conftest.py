"""Test configuration: force an 8-virtual-device CPU backend.

Multi-chip sharding is validated on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) — the JAX-native fake backend
for data-parallel tests (SURVEY.md §4 test plan, item d).  These env vars
must be set before jax initializes its backends, hence module scope here.
"""

import os

# NOTE: this image force-registers a TPU PJRT plugin from sitecustomize and
# exports JAX_PLATFORMS in the ambient environment, which also means jax is
# already imported by interpreter startup.  Plain env-var setdefault is too
# late/too weak — overwrite the env AND update the live jax config before any
# backend is instantiated.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.devices()}")
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
