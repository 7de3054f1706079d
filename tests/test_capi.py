"""C API build + run test (reference `c_wrapper/` parity)."""

import os
import shutil
import subprocess

import pytest

CAPI = os.path.join(os.path.dirname(__file__), "..", "capi")


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_c_demo_builds_and_runs():
    subprocess.run(["make", "-C", CAPI], check=True, capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [os.path.join(CAPI, "demo_pprts")],
        check=True, capture_output=True, text=True, env=env, timeout=300,
        cwd=CAPI,
    )
    assert "edir TOA" in out.stdout
    toa = float(out.stdout.split("edir TOA")[1].split()[0])
    import numpy as np

    assert abs(toa - 1364.0 * np.cos(np.deg2rad(40.0))) < 1.0


@pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")
def test_c_specint_demo_builds_and_runs():
    """Full-spectrum C entry (reference `f2c_pprts_rrtmg`,
    `c_wrapper/f2c_pprts_rrtm.F90`): host slab in, broadband LW+SW out
    on the merged grid."""
    subprocess.run(["make", "-C", CAPI], check=True, capture_output=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [os.path.join(CAPI, "demo_specint")],
        check=True, capture_output=True, text=True, env=env, timeout=500,
        cwd=CAPI,
    )
    assert "nz_merged=" in out.stdout
    nzm = int(out.stdout.split("nz_merged=")[1].split()[0])
    assert nzm > 10  # background layers were merged on top of the slab
