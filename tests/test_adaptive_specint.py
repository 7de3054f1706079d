"""Adaptive spectral re-solve skipping (reference error-growth model)."""

import numpy as np

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.spectral import specint_pprts


def test_adaptive_chunk_skipping(opp_small):
    nlay, nx, ny = 10, 4, 4
    atm = setup_standard_atmosphere(nlay=nlay, ztop=25e3)
    grid = Grid.create(nlay, nx, ny, 500.0, 500.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, opp_small)
    solver.set_angles(sundir_from_angles(20.0, 30.0))

    kw = dict(albedo=0.2, lthermal=True, lsolar=True, specint="gray",
              max_solution_err=10.0, max_solution_time=3600.0)
    r1 = specint_pprts(solver, atm, time=0.0, **kw)
    r2 = specint_pprts(solver, atm, time=60.0, **kw)
    assert getattr(solver, "_spectral_skips", 0) == 0  # history too short
    r3 = specint_pprts(solver, atm, time=120.0, **kw)
    # identical scene -> zero error growth -> chunks skipped now
    assert getattr(solver, "_spectral_skips", 0) >= 2, solver._spectral_skips
    np.testing.assert_allclose(np.asarray(r3.abso), np.asarray(r2.abso), rtol=1e-5, atol=1e-7)
    # too old -> must resolve again
    solver._spectral_skips = 0
    r4 = specint_pprts(solver, atm, time=99999.0, **kw)
    assert solver._spectral_skips == 0
