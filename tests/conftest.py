"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference CI strategy of testing MPI layouts on a single
machine with oversubscription (`.gitlab-ci.yml:85-87`): multi-chip
sharding is validated on a virtual 8-device CPU mesh.  Must set the env
vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin and force
# jax_platforms via sitecustomize; tests must run on the virtual CPU mesh
# regardless (initializing the real backend is also very slow here).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
