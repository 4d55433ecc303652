"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-standard substitute for a fake distributed backend (the
reference had neither tests nor multi-node support — SURVEY §4): all
multi-device sharding paths are exercised on 8 virtual CPU devices via
``--xla_force_host_platform_device_count=8``.

Env vars MUST be set before jax initializes its backends, hence module level.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the TPU tunnel sets its own platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize may have imported jax before this file ran, latching the env;
# jax.config.update overrides the latched value (backends are still lazy).
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
