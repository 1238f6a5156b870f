"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware
(SURVEY.md section 4: xla_force_host_platform_device_count)."""

import os

# Force CPU even when the session environment pins JAX_PLATFORMS to a TPU
# platform: unit tests must be hermetic and run the 8-virtual-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers a TPU PJRT plugin before conftest
# runs, so the env var alone is not enough; set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x48455643)  # "HEVC"
