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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU collectives default to a HARD 40 s rendezvous termination
# (xla::cpu::InProcessCommunicator SIGABRTs the whole process). With 8
# virtual devices timesharing this host's single core, a scheduling
# stall in any sharded-session scan can push one device thread past
# that budget under load, killing the suite mid-test. Raise warn to
# 120 s and terminate to 600 s so stragglers stall-and-recover instead
# of aborting (flags verified present in this jaxlib's libjax_common).
if "xla_cpu_collective_call" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = _flags

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
