"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: this image injects an `axon` TPU PJRT plugin via sitecustomize that
overrides the JAX_PLATFORMS env var, so we must force CPU through
jax.config *before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices("cpu")
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
