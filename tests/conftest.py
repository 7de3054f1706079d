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


@pytest.fixture(scope="session")
def opp_small():
    """Small disk-cached LUT for solver-level tests (the `LUT_mockup`
    equivalent, reference `src/optprop_base.F90:453-486`)."""
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes

    lut = load_or_create_lut(
        "3_10", mockup_axes(True), mockup_axes(False), n_photons=2000,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )
    return OptProp(lut)


@pytest.fixture(scope="session")
def opp_best():
    """Best committed 3_10 table: the production LUT when present, else
    the largest committed table (mirrors bench.py's selection)."""
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import LUT

    repo = os.path.join(os.path.dirname(__file__), "..")
    cands = []
    for d in (os.path.join(repo, "data", "luts"),
              os.path.join(os.path.dirname(__file__), "data", "luts")):
        if os.path.isdir(d):
            for f in os.listdir(d):
                if f.startswith("LUT_3_10") and f.endswith(".npz"):
                    p = os.path.join(d, f)
                    rank = 2 if "production" in f else 1
                    cands.append((rank, os.path.getsize(p), p))
    if not cands:
        pytest.skip("no committed 3_10 LUT")
    return OptProp(LUT.load(sorted(cands)[-1][2]))
