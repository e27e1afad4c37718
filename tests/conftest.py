"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the XLA host-platform device-count trick — the
TPU-native analogue of a fake backend (SURVEY §4).  Must be set before jax
import, hence the env mutation at module import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
