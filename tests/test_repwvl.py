"""repwvl representative-wavelength backend + minimal HDF5 reader.

Oracle: cross-validation against the independent ecCKD model, analytic
Planck closure, and the published solar constant in the tables."""

import numpy as np
import pytest

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.spectral.repwvl import (
    RepwvlOptics,
    _planck_lambda,
    rayleigh_bodhaine,
)


@pytest.fixture(scope="module")
def atm():
    return setup_standard_atmosphere(nlay=40, ztop=60e3)


def test_hdf5_reader_roundtrip_values():
    """The extracted tables carry the documented physical invariants."""
    rw = RepwvlOptics(n_wvl=15)
    sw = rw._load("sw")
    np.testing.assert_allclose(sw["wgts"].sum(), 1368.56, atol=0.1)
    assert sw["xsec"].shape == (9, 10, 15, 41)
    assert (sw["p_ref"] > 0).all() and sw["p_ref"][0] == 110000.0
    # thermal weights integrate the Planck function to sigma*T^4
    lw = rw._load("lw")
    for T in (220.0, 288.0, 310.0):
        tot = np.pi * (lw["wgts"] * 1e-9
                       * _planck_lambda(lw["wvl"] * 1e-9, T)).sum()
        np.testing.assert_allclose(tot, 5.670374e-8 * T**4, rtol=5e-3)


def test_rayleigh_bodhaine():
    # sanity: ~1e-26 cm2 at 550 nm, steep lambda^-4 growth
    x550 = float(rayleigh_bodhaine(0.55, 400.0))
    x300 = float(rayleigh_bodhaine(0.30, 400.0))
    assert 3e-27 < x550 < 1e-26, x550
    assert 8 < x300 / x550 < 20  # ~(550/300)^4 = 11.3 with dispersion


def test_vs_ecckd_broadband(atm):
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    sp = RepwvlOptics(n_wvl=15).solar(atm)
    spe = EcckdGasOptics(n_gpt=32).solar(atm)
    mu0 = 0.8

    def direct(s):
        t, w = np.asarray(s.tau), np.asarray(s.weight)
        return (w * np.exp(-t.sum(1) / mu0)).sum() / w.sum()

    assert abs(direct(sp) - direct(spe)) < 0.03, (direct(sp), direct(spe))


def test_specint_repwvl_e2e(atm):
    """Full solar+thermal spectral solve through specint with clouds."""
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    nlay, nx, ny = atm.nlay, 4, 4
    dz = np.asarray(atm.dz, np.float32)
    lwc = np.zeros((nlay, nx, ny), np.float32)
    lwc[nlay - 8, 1:3, 1:3] = 0.3
    reliq = np.full((nlay, nx, ny), 10.0, np.float32)
    grid = Grid.create(nlay, nx, ny, 100.0, 100.0, dz)
    solver = PprtsSolver(grid, solver_type="2str")
    solver.set_angles(sundir_from_angles(0.0, 40.0))

    sw = specint_pprts(solver, atm, albedo=0.2, lsolar=True, lthermal=False,
                       specint="repwvl", lwc=lwc, reliq=reliq)
    lw = specint_pprts(solver, atm, albedo=0.05, lsolar=False, lthermal=True,
                       specint="repwvl", lwc=lwc, reliq=reliq)
    edir = np.asarray(sw.edir)
    eup_lw = np.asarray(lw.eup)
    edn_lw = np.asarray(lw.edn)
    mu = np.cos(np.deg2rad(40.0))
    np.testing.assert_allclose(edir[0], 1368.56 * mu, rtol=2e-3)
    # cloud shadow
    assert edir[-1, 1, 1] < 0.7 * edir[-1, 0, 0]
    # Earth-like OLR and surface longwave
    olr = eup_lw[0].mean()
    assert 150.0 < olr < 340.0, olr
    assert 200.0 < edn_lw[-1].mean() < 420.0
