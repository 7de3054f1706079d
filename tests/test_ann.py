"""ANN optprop backend tests (reference `test_ANN_3_10`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ann(opp_small):
    from tenstream_tpu.optprop.ann import AnnOptProp

    return AnnOptProp(opp_small.lut, epochs=600, seed=1)


def test_ann_matches_lut(ann, opp_small):
    rng = np.random.default_rng(0)
    n = 200
    tau = 10 ** rng.uniform(-4, 1, n).astype(np.float32)
    w0 = rng.uniform(0, 0.99, n).astype(np.float32)
    g = rng.uniform(0, 0.5, n).astype(np.float32)
    asp = rng.uniform(0.15, 1.8, n).astype(np.float32)
    c_lut = np.asarray(opp_small.diff_coeffs(tau, w0, g, asp))
    c_ann = np.asarray(ann.diff_coeffs(tau, w0, g, asp))
    err = np.abs(c_lut - c_ann).mean()
    assert err < 0.02, err  # mean absolute coefficient error


def test_solver_runs_with_ann(ann):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 5, 6, 6
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), ann)
    ka = np.full((nz, nx, ny), 2e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.2, ka, ks, g)
    solver.set_angles(sundir_from_angles(20.0, 30.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    assert np.isfinite(edir).all() and np.isfinite(abso).all()
    assert edir[0].mean() > edir[-1].mean() > 0
