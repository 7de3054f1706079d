"""Precision-policy and input-validation tests.

Parity: the reference CI builds single AND double precision kinds to
flush mixed-kind bugs (`.gitlab-ci.yml:104-120`), and DEBUG builds
validate optical-property inputs (`src/pprts.F90:1831-1859`).
SURVEY §5.2 asks for an explicit f32-vs-f64 consistency check.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCENE = r"""
import os, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from tenstream_tpu.optprop.lut import LUT
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver

lut = LUT.load(os.path.join(%(repo)r, 'tests', 'data', 'luts',
                            'LUT_3_10_23fe78b9e1595d6e.npz'))
s = PprtsSolver(Grid.create(6, 6, 6, 100.0, 100.0, 60.0), OptProp(lut))
nz = 6
kabs = np.full((nz, 6, 6), 2e-4, np.float64)
ksca = np.full((nz, 6, 6), 2e-3, np.float64)
kabs[3, 2:4, 2:4] = 5e-3; ksca[3, 2:4, 2:4] = 5e-2
g = np.full((nz, 6, 6), 0.6, np.float64)
s.set_optical_properties(0.25, kabs, ksca, g)
th, ph = np.deg2rad(40.0), np.deg2rad(30.0)
s.set_angles(np.array([np.sin(th)*np.sin(ph), np.sin(th)*np.cos(ph), -np.cos(th)]))
s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
edir, edn, eup, abso = (np.asarray(x, np.float64) for x in s.get_result())
np.savez(sys.argv[1], edir=edir, edn=edn, eup=eup, abso=abso)
"""


def _run_scene(tmp_path, precision):
    out = os.path.join(str(tmp_path), f"res_{precision}.npz")
    env = dict(os.environ)
    env["TENSTREAM_TPU_PRECISION"] = precision
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/.axon_site:" + REPO
    subprocess.run(
        [sys.executable, "-c", _SCENE % {"repo": REPO}, out],
        check=True, env=env, timeout=600, cwd=REPO,
    )
    return np.load(out)


def test_f32_vs_f64_consistency(tmp_path):
    # the same scene in single and double precision must agree to f32
    # roundoff accumulated through the solve — gross disagreement means
    # a precision bug (e.g. catastrophic cancellation) somewhere
    r32 = _run_scene(tmp_path, "single")
    r64 = _run_scene(tmp_path, "double")
    assert r64["edir"].dtype == np.float64
    for name in ("edir", "edn", "eup"):
        scale = max(1.0, float(np.abs(r64[name]).max()))
        err = np.abs(r32[name] - r64[name]).max() / scale
        assert err < 2e-4, f"{name}: relative f32-vs-f64 deviation {err:.2e}"
    scale = float(np.abs(r64["abso"]).max())
    assert np.abs(r32["abso"] - r64["abso"]).max() / scale < 1e-3


def test_validation_rejects_bad_inputs(opp_small):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver

    s = PprtsSolver(Grid.create(4, 4, 4, 100.0, 100.0, 60.0), opp_small)
    ok = np.full((4, 4, 4), 1e-3, np.float32)
    bad_nan = ok.copy(); bad_nan[1, 1, 1] = np.nan
    bad_neg = ok.copy(); bad_neg[0, 0, 0] = -1e-3
    bad_g = np.full((4, 4, 4), 1.5, np.float32)

    with pytest.raises(ValueError, match="non-finite"):
        s.set_optical_properties(0.1, bad_nan, ok, ok * 0)
    with pytest.raises(ValueError, match="negative"):
        s.set_optical_properties(0.1, ok, bad_neg, ok * 0)
    with pytest.raises(ValueError, match="asymmetry"):
        s.set_optical_properties(0.1, ok, ok, bad_g)
    # valid inputs pass; validation can be disabled
    s.set_optical_properties(0.1, ok, ok, ok * 0)
    s.options.set("pprts_validate", False)
    s.set_optical_properties(0.1, bad_nan, ok, ok * 0)
