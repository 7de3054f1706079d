"""RRTMG_SW gas optics (112 gpt) — extraction + taumol port.

Cross-validated against the independent ecCKD SW model; no reference
fluxes are available in-image, so agreement of two independent
k-distributions on clear-sky broadband quantities is the strongest
available oracle.
"""

import numpy as np
import pytest

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.spectral.rrtmg_sw import RrtmgSwOptics


@pytest.fixture(scope="module")
def atm():
    return setup_standard_atmosphere(nlay=40, ztop=60e3)


@pytest.fixture(scope="module")
def sp(atm):
    return RrtmgSwOptics().solar(atm)


def test_total_solar_irradiance(sp):
    # the Kurucz source built into RRTMG sums to its canonical solar
    # constant of 1368.22 W/m2
    np.testing.assert_allclose(float(np.asarray(sp.weight).sum()), 1368.22, rtol=1e-3)


def test_tau_sane(sp):
    tau = np.asarray(sp.tau)
    w0 = np.asarray(sp.w0)
    assert tau.shape[0] == 112
    assert np.isfinite(tau).all() and (tau > 0).all()
    assert (w0 >= 0).all() and (w0 <= 1).all()
    # the UV/vis bands must be Rayleigh-dominated at the top
    # (ozone-free stratopause layers): some gpts with w0 ~ 1
    assert (w0.max(1) > 0.99).sum() > 10


def test_vs_ecckd_broadband(atm, sp):
    """Two independent k-distribution models agree on clear-sky
    broadband direct transmission and beam absorption."""
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    spe = EcckdGasOptics(n_gpt=32).solar(atm)
    mu0 = 0.8

    def direct(s):
        tau = np.asarray(s.tau)
        w = np.asarray(s.weight)
        return (w * np.exp(-tau.sum(1) / mu0)).sum() / w.sum()

    def beam_abs(s):
        tau = np.asarray(s.tau)
        w0 = np.asarray(s.w0)
        w = np.asarray(s.weight)
        ta = (tau * (1 - w0)).sum(1)
        return (w * (1 - np.exp(-ta / mu0))).sum() / w.sum()

    assert abs(direct(sp) - direct(spe)) < 0.02, (direct(sp), direct(spe))
    assert abs(beam_abs(sp) - beam_abs(spe)) < 0.02, (beam_abs(sp), beam_abs(spe))


def test_specint_rrtmg_sw_e2e(atm):
    """Full spectral integration with the rrtmg_sw backend on a cloudy
    3-D scene (2str column solver for speed)."""
    import dataclasses

    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    nlay, nx, ny = atm.nlay, 4, 4
    dz = np.asarray(atm.dz, np.float32)
    lwc = np.zeros((nlay, nx, ny), np.float32)
    lwc[nlay - 8, 1:3, 1:3] = 0.3  # a small liquid cloud
    reliq = np.full((nlay, nx, ny), 10.0, np.float32)
    atm3 = dataclasses.replace(atm, lwc=lwc, reliq=reliq)

    grid = Grid.create(nlay, nx, ny, 100.0, 100.0, dz)
    solver = PprtsSolver(grid, solver_type="2str")
    solver.set_angles(sundir_from_angles(0.0, 40.0))

    res = specint_pprts(solver, atm3, albedo=0.2,
                        lsolar=True, lthermal=False, specint="rrtmg_sw",
                        lwc=lwc, reliq=reliq)
    edir = np.asarray(res.edir)
    edn = np.asarray(res.edn)
    eup = np.asarray(res.eup)
    assert np.isfinite(edir).all() and np.isfinite(edn).all()
    mu = np.cos(np.deg2rad(40.0))
    # TOA direct equals the Kurucz constant on the horizontal plane
    np.testing.assert_allclose(edir[0], 1368.22 * mu, rtol=2e-3)
    # cloudy columns are darker below the cloud than clear ones
    assert edir[-1, 1, 1] < 0.7 * edir[-1, 0, 0]
    # reflection above the cloud exceeds the clear-sky column
    assert eup[0, 1, 1] > eup[0, 0, 0]
