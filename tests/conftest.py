"""Test config: force CPU with a virtual 8-device mesh.

SURVEY.md §4: the reference has no test suite; we test every op/loss against
golden values and every model forward at tiny shapes, and fake an 8-chip TPU
slice with XLA's host-platform device-count flag (the TPU analog of a fake
backend).
"""

import os

# The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter start; the
# jax.config update below (before first backend use) overrides it to CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
