"""8_10 stream scheme tests (quadrant direct streams).

Parity: reference `t_solver_8_10` + `boxmc_8_10.inc`.
"""

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc


def test_8_10_direct_quadrants():
    # vertical sun through a transparent box: each top-quadrant source
    # exits straight down into the SAME quadrant
    for src in range(4):
        T, S = run_boxmc(
            jax.random.PRNGKey(src), "8_10", src, True, 1e-8, 0.0, 0.0, 1.0,
            0.0, 0.0, n_photons=4000,
        )
        T = np.asarray(T)
        assert T[src] > 0.999, (src, T)


def test_8_10_side_halves():
    # side sources at slant sun: energy leaves through the downwind faces
    T, S = run_boxmc(
        jax.random.PRNGKey(1), "8_10", 4, True, 1e-8, 0.0, 0.0, 1.0,
        45.0, 60.0, n_photons=4000,
    )
    T = np.asarray(T)
    np.testing.assert_allclose(T.sum(), 1.0, atol=1e-3)
    # photons from the lower x-face half travelling at 60 deg zenith exit
    # mostly through the bottom or the opposite side faces
    assert T[:4].sum() + T[4:6].sum() + T[6:8].sum() > 0.999


def test_8_10_energy_conservation_scattering():
    T, S = run_boxmc(
        jax.random.PRNGKey(2), "8_10", 0, True, 2.0, 1.0, 0.6, 1.0,
        30.0, 40.0, n_photons=20000,
    )
    total = float(np.asarray(T).sum() + np.asarray(S).sum())
    assert abs(total - 1.0) < 3e-3, total


def test_8_10_solver_end_to_end():
    import os

    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import LUTAxes, load_or_create_lut
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    axes = LUTAxes(
        tau=np.array([1e-10, 0.3, 3.0], np.float32),
        w0=np.array([0.0, 0.9], np.float32),
        aspect=np.array([0.5, 1.0, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.array([0.0, 45.0, 90.0], np.float32),
        theta=np.array([0.0, 40.0, 80.0], np.float32),
    )
    daxes = LUTAxes(axes.tau, axes.w0, axes.aspect, axes.g)
    lut = load_or_create_lut(
        "8_10", axes, daxes, n_photons=1500,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )
    solver = PprtsSolver(Grid.create(5, 6, 6, 100.0, 100.0, 100.0), OptProp(lut))
    ka = np.full((5, 6, 6), 3e-4, np.float32)
    ks = np.full((5, 6, 6), 1e-3, np.float32)
    g = np.full((5, 6, 6), 0.4, np.float32)
    solver.set_optical_properties(0.3, ka, ks, g)
    solver.set_angles(sundir_from_angles(210.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean() + (abso * 100.0).sum(0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.05, (balance, incoming)
    # octant switches must keep the solve finite and balanced
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir2, _, _, abso2 = map(np.asarray, solver.get_result())
    assert np.isfinite(edir2).all() and np.isfinite(abso2).all()
