"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware and must exercise multi-device sharding,
so we create 8 virtual CPU devices before JAX initializes (the fake-backend
capability the reference lacks, SURVEY.md §4).
"""
import os

# The session environment pins JAX_PLATFORMS to the real TPU backend;
# tests always run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Low-core hosts serialize the virtual devices' partitions, so early
# arrivals at a collective can wait minutes; don't let XLA abort them.
if "collective_call_warn_stuck" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU PJRT plugin and pins
# jax to it; env vars alone don't win, so force the CPU platform here.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
