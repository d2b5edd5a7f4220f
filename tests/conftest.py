"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the JAX-native testing
strategy — the reference has no equivalent (see SURVEY.md section 4).

Note: the sandbox's sitecustomize pins JAX_PLATFORMS=axon (real TPU), so
env vars are not enough — we must override through jax.config before any
backend initializes.
"""
import os

os.environ["MIVOS_NO_CACHE"] = "1"  # don't persist CPU AOT artifacts

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="class")
def class_rng():
    return np.random.RandomState(0)
