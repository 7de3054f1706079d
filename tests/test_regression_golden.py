"""Golden-result regression test.

Parity: reference `tests/test_pprts_specint` compares fluxes against
stored reference results with atol 0.1 W/m2.  Here a fixed cloud scene
solved with the committed test LUT is compared against a committed golden
archive; regenerate deliberately with
`REGEN_GOLDEN=1 python -m pytest tests/test_regression_golden.py`.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_3_10.npz")


def _solve(opp):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 8, 12, 12
    rng = np.random.default_rng(1234)
    ka = (5e-5 + 5e-4 * rng.random((nz, nx, ny))).astype(np.float32)
    ks = (5e-5 + 2e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    g = np.full((nz, nx, ny), 0.45, np.float32)
    ks[3:5, 4:8, 4:8] += 0.02  # cloud
    ka[3:5, 4:8, 4:8] += 0.003
    planck = np.linspace(2.0, 6.0, nz + 1)[:, None, None].astype(np.float32) * np.ones(
        (nx, ny), np.float32
    )
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), opp)
    solver.set_optical_properties(0.25, ka, ks, g, planck=planck)
    solver.set_angles(sundir_from_angles(140.0, 45.0))
    solver.solve(lthermal=True, lsolar=True, edirTOA=1200.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    return dict(edir=edir, edn=edn, eup=eup, abso=abso)


def test_golden_regression(opp_small):
    res = _solve(opp_small)
    if os.environ.get("REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        np.savez_compressed(GOLDEN, **res)
        pytest.skip("golden regenerated")
    gold = np.load(GOLDEN)
    # reference gate: atol 0.1 W/m2 on fluxes
    for k in ("edir", "edn", "eup"):
        np.testing.assert_allclose(res[k], gold[k], atol=0.1, err_msg=k)
    # abso is an iteratively converged quantity: gate at a level that
    # catches physics drift but not solver-iteration-path noise
    np.testing.assert_allclose(res["abso"], gold["abso"], atol=1e-4, err_msg="abso")
