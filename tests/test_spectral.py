"""Spectral integration tests.

Parity: reference `tests/test_pprts_specint/` (regression of full-spectrum
LW/SW fluxes) and `test_pprts_rrtm_lw_sw` invariants (positive fluxes,
sane heating rates, TOA balance).
"""

import numpy as np
import pytest

from tenstream_tpu.atm import abso2hr, setup_standard_atmosphere, us_standard_atmosphere
from tenstream_tpu.core.types import SOLAR_CONSTANT, STEFAN_BOLTZMANN


def test_ussa76_values():
    atm = us_standard_atmosphere(np.array([0.0, 11000.0, 20000.0, 47000.0]))
    np.testing.assert_allclose(atm["p"][0], 101325.0, rtol=1e-6)
    np.testing.assert_allclose(atm["T"][0], 288.15, rtol=1e-6)
    np.testing.assert_allclose(atm["T"][1], 216.65, rtol=1e-3)
    np.testing.assert_allclose(atm["p"][1], 22632.0, rtol=1e-2)
    np.testing.assert_allclose(atm["p"][2], 5474.9, rtol=1e-2)


def test_standard_atmosphere_setup():
    atm = setup_standard_atmosphere(nlay=20)
    assert atm.nlay == 20
    assert atm.plev[0] < atm.plev[-1]  # TOA -> surface ordering
    assert (atm.dz > 0).all()
    assert atm.gases["h2o"].max() < 0.05


@pytest.mark.parametrize("specint", ["gray", "synthck"])
def test_specint_clear_sky(specint, opp_small):
    import jax.numpy as jnp

    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    nlay, nx, ny = 10, 4, 4
    atm = setup_standard_atmosphere(nlay=nlay, ztop=25e3)
    grid = Grid.create(nlay, nx, ny, 500.0, 500.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, opp_small)
    solver.set_angles(sundir_from_angles(20.0, 30.0))

    res = specint_pprts(
        solver, atm, albedo=0.2, lthermal=True, lsolar=True,
        specint=specint, band_chunk=8,
    )
    edir, edn, eup, abso = map(np.asarray, res)

    # solar direct at TOA bounded by the solar constant
    mu = np.cos(np.deg2rad(30.0))
    assert 0 < edir[0].mean() <= SOLAR_CONSTANT * mu * 1.01
    assert edir[-1].mean() < edir[0].mean()
    # upwelling LW at TOA within physical bounds (OLR-ish)
    assert 30.0 < eup[0].mean() < STEFAN_BOLTZMANN * 300.0**4
    # heating rates are finite and within a plausible magnitude
    hr = np.asarray(abso2hr(jnp.asarray(abso), atm.play[:, None, None], atm.tlay[:, None, None]))
    assert np.isfinite(hr).all()
    assert np.abs(hr).max() < 100.0  # K/day


def test_specint_cloud_effect(opp_small):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    nlay, nx, ny = 10, 4, 4
    atm = setup_standard_atmosphere(nlay=nlay, ztop=25e3)
    grid = Grid.create(nlay, nx, ny, 500.0, 500.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, opp_small)
    solver.set_angles(sundir_from_angles(0.0, 20.0))

    clear = specint_pprts(solver, atm, 0.2, lthermal=False, lsolar=True, specint="gray")

    lwc = np.zeros((nlay, nx, ny), np.float32)
    lwc[6] = 0.3  # stratus-ish layer
    solver2 = PprtsSolver(grid, opp_small)
    solver2.set_angles(sundir_from_angles(0.0, 20.0))
    cloudy = specint_pprts(solver2, atm, 0.2, lthermal=False, lsolar=True, specint="gray", lwc=lwc)

    # cloud reflects: more TOA upwelling, less surface direct
    assert np.asarray(cloudy.eup)[0].mean() > np.asarray(clear.eup)[0].mean() * 1.5
    assert np.asarray(cloudy.edir)[-1].mean() < np.asarray(clear.edir)[-1].mean() * 0.5


def test_mcica_subcolumns():
    """Raisanen max-random overlap statistics (reference
    `mcica_subcol_gen_lw.f90`)."""
    import jax
    import jax.numpy as jnp

    from tenstream_tpu.spectral.mcica import mcica_subcolumns

    f = jnp.asarray(np.array([0.0, 0.5, 0.5, 0.2, 0.0], np.float32)[:, None])
    m = np.asarray(mcica_subcolumns(jax.random.PRNGKey(0), f, 4000))
    np.testing.assert_allclose(m.mean(axis=(0, 2)), [0, 0.5, 0.5, 0.2, 0], atol=0.02)
    # adjacent cloudy layers overlap maximally, not randomly
    assert (m[:, 1] & m[:, 2]).mean() > 0.45
    # random overlap reproduces the product probability
    mr = np.asarray(mcica_subcolumns(jax.random.PRNGKey(1), f, 4000, overlap="random"))
    assert abs((mr[:, 1] & mr[:, 2]).mean() - 0.25) < 0.03


def test_specint_extra_tau():
    """Gray extra optical properties (aerosol/vegetation hook of the
    reference specint API)."""
    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    atm = setup_standard_atmosphere(nlay=16, ztop=16e3)
    nx = ny = 2
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0, np.asarray(atm.dz, np.float32))
    solver = PprtsSolver(grid, solver_type="2str")
    solver.set_angles(sundir_from_angles(0.0, 30.0))
    clear = specint_pprts(solver, atm, albedo=0.1, lsolar=True, lthermal=False,
                          specint="ecckd")
    aer_tau = np.zeros((atm.nlay, nx, ny), np.float32)
    aer_tau[12] = 0.5  # an absorbing aerosol layer
    hazy = specint_pprts(solver, atm, albedo=0.1, lsolar=True, lthermal=False,
                         specint="ecckd", extra_tau=aer_tau,
                         extra_w0=np.full_like(aer_tau, 0.9),
                         extra_g=np.full_like(aer_tau, 0.7))
    e_clear = float(np.asarray(clear.edir)[-1].mean())
    e_hazy = float(np.asarray(hazy.edir)[-1].mean())
    assert e_hazy < 0.75 * e_clear, (e_hazy, e_clear)
    assert np.isfinite(np.asarray(hazy.abso)).all()


def test_vegetation_albedo_ranges():
    """Vegetation spectral albedo curves + range averaging (reference
    `vegetation_optprop.F90:186-215`)."""
    from tenstream_tpu.spectral.vegetation import (
        VEG_TYPES,
        get_albedo_for_range,
        mix_material,
    )

    # leaves are dark in the visible and bright in the NIR plateau
    vis = get_albedo_for_range("leaf", 0.45, 0.68)
    nir = get_albedo_for_range("leaf", 0.75, 1.2)
    assert vis < 0.1 < 0.35 < nir, (vis, nir)
    # range averages stay inside the curve's bounds
    for name, (lam, alb) in VEG_TYPES.items():
        a = get_albedo_for_range(name, float(lam[0]), float(lam[-1]))
        assert alb.min() - 1e-12 <= a <= alb.max() + 1e-12
    # single-point range == interpolated curve value
    a55 = get_albedo_for_range("grass", 0.55, 0.55)
    import numpy as _np
    lam, alb = VEG_TYPES["grass"]
    assert abs(a55 - _np.interp(0.55, lam, alb)) < 1e-6
    # material mixing is tau-weighted
    tau, w0 = mix_material(1.0, 0.1, 1.0, 0.5)
    assert tau == 2.0 and abs(w0 - 0.3) < 1e-12


def test_specint_cache_modes(opp_small):
    """All warm-start cache modes (f32 / bf16 / host / off) must agree on
    the physics; only iteration counts may differ on re-solves
    (reference `compress_solution` semantics, `src/pprts_base.F90:425`)."""
    import jax.numpy as jnp

    from tenstream_tpu.core.config import Options
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    atm = setup_standard_atmosphere(nlay=10, ztop=16e3)
    nx = ny = 3
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0,
                       np.asarray(atm.dz, np.float32))
    results = {}
    for mode in ("f32", "bf16", "host", "off"):
        opts = Options()
        opts.set("specint_cache", mode)
        solver = PprtsSolver(grid, opp_small, options=opts)
        solver.set_angles(sundir_from_angles(30.0, 40.0))
        r1 = specint_pprts(solver, atm, albedo=0.2, lthermal=True,
                           lsolar=True, specint="ecckd")
        r2 = specint_pprts(solver, atm, albedo=0.2, lthermal=True,
                           lsolar=True, specint="ecckd")  # warm re-solve
        results[mode] = (np.asarray(r1.edn), np.asarray(r2.edn))
        if mode == "off":
            assert not solver.solutions or all(
                s.ediff is None for s in solver.solutions.values())
        elif mode == "host":
            assert all(isinstance(s.ediff, np.ndarray)
                       for s in solver.solutions.values())
    ref1, ref2 = results["f32"]
    for mode, (e1, e2) in results.items():
        np.testing.assert_allclose(e1, ref1, atol=1e-3, err_msg=f"{mode} cold")
        np.testing.assert_allclose(e2, ref2, atol=0.5, err_msg=f"{mode} warm")


def test_specint_band_grouping(opp_small):
    """Difficulty-grouped band chunks: after the first solve the bands
    are reordered by measured niter and regrouped; fluxes must match the
    ungrouped natural-order solve on every step, warm starts must
    survive the regroup (second solve re-converges in few iterations)."""
    from tenstream_tpu.core.config import Options
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    atm = setup_standard_atmosphere(nlay=10, ztop=16e3)
    nx = ny = 3
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0,
                       np.asarray(atm.dz, np.float32))
    res = {}
    for grouped in (True, False):
        opts = Options()
        opts.set("specint_band_group", grouped)
        solver = PprtsSolver(grid, opp_small, options=opts)
        solver.set_angles(sundir_from_angles(30.0, 40.0))
        r = [specint_pprts(solver, atm, albedo=0.2, lthermal=True,
                           lsolar=True, specint="ecckd", band_chunk=4)
             for _ in range(3)]
        res[grouped] = [np.asarray(x.edn) for x in r]
        if grouped:
            # grouping froze after the first solve
            assert "solar" in solver._band_order
            assert "thermal" in solver._band_order
            # regrouped warm starts: third solve converges instantly
            niters = [int(np.max(np.asarray(s.niter_diff)))
                      for s in solver.solutions.values()]
            assert max(niters) <= 2, niters
    for a, b in zip(res[True], res[False]):
        np.testing.assert_allclose(a, b, atol=1e-2)


def test_specint_warm_extrapolation(opp_small):
    """Opt-in x0 = 2x(t-1) - x(t-2) stepping seed: fluxes must match the
    plain warm-start solve on a drifting scene."""
    from tenstream_tpu.core.config import Options
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    atm = setup_standard_atmosphere(nlay=10, ztop=16e3)
    nx = ny = 4
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0,
                       np.asarray(atm.dz, np.float32))
    res = {}
    for extrap in (False, True):
        opts = Options()
        opts.set("specint_warm_extrapolate", extrap)
        opts.set("specint_cache", "f32")
        solver = PprtsSolver(grid, opp_small, options=opts)
        solver.set_angles(sundir_from_angles(30.0, 40.0))
        lwc = np.zeros((atm.nlay, nx, ny), np.float32)
        outs = []
        for step in range(4):
            lwc[:] = 0.0
            lwc[6, (step) % nx, 1] = 0.25  # advecting cloud
            r = specint_pprts(solver, atm, albedo=0.2, lthermal=True,
                              lsolar=True, specint="ecckd", lwc=lwc,
                              band_chunk=8)
            outs.append(np.asarray(r.edn))
        res[extrap] = outs
    for a, b in zip(res[True], res[False]):
        np.testing.assert_allclose(a, b, atol=1e-2)
