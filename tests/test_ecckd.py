"""ecCKD gas-optics backend tests.

Parity: reference `ecckd/` driver + data; checks physical plausibility of
the extracted tables: clear-sky OLR, solar transmission, heating rates.
"""

import numpy as np
import pytest

from tenstream_tpu.atm import setup_standard_atmosphere

pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("os").path.join(
            __import__("os").path.dirname(__file__), "..", "data", "ecckd",
            "ecckd-1.0_sw_climate_rgb-32.npz",
        )
    ),
    reason="ecckd tables not extracted",
)


def test_tau_shapes_and_magnitudes():
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    atm = setup_standard_atmosphere(nlay=30, ztop=40e3)
    gas = EcckdGasOptics(n_gpt=32)
    sw = gas.solar(atm)
    lw = gas.thermal(atm)
    assert sw.tau.shape == (32, 30)
    assert lw.tau.shape == (32, 30)
    # solar source sums to roughly the solar constant
    tsi = float(np.asarray(sw.weight).sum())
    assert 1300.0 < tsi < 1420.0, tsi
    # column gas optical depth spans from near-transparent to opaque gpts
    col_sw = np.asarray(sw.tau).sum(1)
    col_lw = np.asarray(lw.tau).sum(1)
    assert col_sw.min() < 1.0 and col_lw.max() > 10.0
    assert np.isfinite(col_sw).all() and np.isfinite(col_lw).all()
    # Planck at the surface integrates to ~ sigma T^4 / pi * pi
    b_sfc = float(np.asarray(lw.planck)[:, -1].sum()) * np.pi
    sigmaT4 = 5.67e-8 * float(atm.tlev[-1]) ** 4
    assert abs(b_sfc - sigmaT4) / sigmaT4 < 0.05, (b_sfc, sigmaT4)


def test_clear_sky_fluxes_2str():
    """Full clear-sky LW+SW with ecCKD through the two-stream solver:
    OLR and surface fluxes must land in Earth-like ranges."""
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    nlay, nx, ny = 30, 2, 2
    atm = setup_standard_atmosphere(nlay=nlay, ztop=40e3)
    grid = Grid.create(nlay, nx, ny, 1000.0, 1000.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, solver_type="2str")
    solver.set_angles(sundir_from_angles(0.0, 30.0))
    gas = EcckdGasOptics(n_gpt=32)
    sw = specint_pprts(solver, atm, albedo=0.12, lthermal=False, lsolar=True, specint=gas)
    lw = specint_pprts(solver, atm, albedo=0.0, lthermal=True, lsolar=False, specint=gas)

    mu = np.cos(np.deg2rad(30.0))
    tsi = float(np.asarray(gas.solar(atm).weight).sum())
    sfc_sw = float(np.asarray(sw.edir)[-1].mean() + np.asarray(sw.edn)[-1].mean())
    # clear-sky total SW at the surface: ~70-95% of the TOA input
    assert 0.6 * tsi * mu < sfc_sw < 1.0 * tsi * mu, (sfc_sw, tsi * mu)

    olr = float(np.asarray(lw.eup)[0].mean())
    sfc_lw_dn = float(np.asarray(lw.edn)[-1].mean())
    # Earth-like clear-sky values: OLR ~ 240-300, LW down ~ 250-350 W/m2
    assert 200.0 < olr < 340.0, olr
    assert 200.0 < sfc_lw_dn < 400.0, sfc_lw_dn
    assert np.isfinite(np.asarray(sw.abso)).all()
    assert np.isfinite(np.asarray(lw.abso)).all()


def test_ice_clouds_specint():
    """Ice-cloud coupling (Fu-Muskatel per-gpt for ecCKD, Fu96/98 bands
    for repwvl): a cirrus layer dims the surface solar flux and raises
    reflection."""
    import numpy as np

    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    atm = setup_standard_atmosphere(nlay=24, ztop=24e3)
    nx = ny = 4
    iwc = np.zeros((atm.nlay, nx, ny), np.float32)
    iwc[10, 1:3, 1:3] = 0.03  # cirrus
    reice = np.full((atm.nlay, nx, ny), 30.0, np.float32)
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0, np.asarray(atm.dz, np.float32))

    for backend in ("ecckd", "repwvl"):
        solver = PprtsSolver(grid, solver_type="2str")
        solver.set_angles(sundir_from_angles(0.0, 30.0))
        clear = specint_pprts(solver, atm, albedo=0.1, lsolar=True,
                              lthermal=False, specint=backend)
        cloudy = specint_pprts(solver, atm, albedo=0.1, lsolar=True,
                               lthermal=False, specint=backend,
                               iwc=iwc, reice=reice)
        e_clear = np.asarray(clear.edir)[-1, 1, 1]
        e_cloud = np.asarray(cloudy.edir)[-1, 1, 1]
        assert e_cloud < 0.6 * e_clear, (backend, e_cloud, e_clear)
        assert np.asarray(cloudy.eup)[0, 1, 1] > np.asarray(clear.eup)[0, 1, 1]
        # thermal path with ice is finite and cools cloud top
        lw = specint_pprts(solver, atm, albedo=0.05, lsolar=False,
                           lthermal=True, specint=backend,
                           iwc=iwc, reice=reice)
        assert np.isfinite(np.asarray(lw.abso)).all(), backend
