"""3_16 sectored-top scheme tests (reference `boxmc_3_16.inc`)."""

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc


def test_3_16_sector_sources_and_bins():
    # transparent box: a +y-sector Edn source (dof 1) exits through the
    # bottom into the +y-sector Edn bin (dof 1) or side faces, never into
    # other sectors
    T, S = run_boxmc(
        jax.random.PRNGKey(0), "3_16", 1, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    np.testing.assert_allclose(S.sum(), 1.0, atol=1e-3)
    # top-face exits only land in the matching sector bin
    assert S[1] > 0.2
    for d in (3, 5, 7, 0, 2, 4, 6):
        assert S[d] < 1e-6, (d, S)
    # the +y sector source can exit via the +y side face (dof 12/13 group)
    assert S[12] + S[13] > 0.1, S


def test_3_16_energy_conservation_scattering():
    T, S = run_boxmc(
        jax.random.PRNGKey(1), "3_16", 0, False, 1.5, 1.0, 0.5, 1.0, n_photons=20000
    )
    total = float(np.asarray(S).sum())
    assert abs(total - 1.0) < 3e-3, total


def test_3_16_solver_end_to_end():
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
        "3_16", axes, daxes, n_photons=1200,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )
    solver = PprtsSolver(Grid.create(5, 6, 6, 100.0, 100.0, 100.0), OptProp(lut))
    ka = np.full((5, 6, 6), 3e-4, np.float32)
    ks = np.full((5, 6, 6), 1e-3, np.float32)
    g = np.full((5, 6, 6), 0.4, np.float32)
    solver.set_optical_properties(0.3, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean() + (abso * 100.0).sum(0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.05, (balance, incoming)
