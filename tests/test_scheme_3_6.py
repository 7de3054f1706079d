"""3_6 stream scheme end-to-end (second cube scheme family).

Parity: reference `t_solver_3_6` + `boxmc_3_6.inc`.
"""

import numpy as np
import pytest

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import LUTAxes, load_or_create_lut
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


@pytest.fixture(scope="module")
def opp_3_6():
    import os

    axes = LUTAxes(
        tau=np.array([1e-10, 0.1, 1.0, 10.0], np.float32),
        w0=np.array([0.0, 0.7, 0.99999], np.float32),
        aspect=np.array([0.5, 1.0, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.array([0.0, 45.0, 90.0], np.float32),
        theta=np.array([0.0, 40.0, 80.0], np.float32),
    )
    daxes = LUTAxes(axes.tau, axes.w0, axes.aspect, axes.g)
    lut = load_or_create_lut(
        "3_6", axes, daxes, n_photons=2000,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )
    return OptProp(lut)


def test_3_6_solve_and_conservation(opp_3_6):
    assert opp_3_6.scheme.ndiff == 6
    nz, nx, ny = 6, 8, 8
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, opp_3_6)
    ka = np.full((nz, nx, ny), 3e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.3, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean()
        + (abso * 100.0).sum(axis=0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.03, (balance, incoming)
    assert np.isfinite(abso).all()
