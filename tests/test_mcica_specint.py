"""McICA partial cloudiness through specint (reference
`mcica_subcol_gen_{lw,sw}.f90` wired into the rrtmg drivers).
"""

import numpy as np
import pytest

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.spectral.specint import specint_pprts


def _scene(nx=8, ny=8):
    zlev = np.concatenate([np.geomspace(20e3, 3000.0, 12), np.arange(2500.0, -1.0, -500.0)])
    atm = setup_standard_atmosphere(z_grid=zlev)
    nlay = atm.nlay
    lwc = np.zeros((nlay, nx, ny), np.float32)
    cf = np.zeros((nlay, nx, ny), np.float32)
    lwc[nlay - 3] = 0.15  # GRID-MEAN condensate
    cf[nlay - 3] = 0.5
    grid = Grid.create(nlay, nx, ny, 500.0, 500.0, np.asarray(atm.dz, np.float32))
    return atm, grid, lwc, cf


def test_mcica_plane_parallel_bias():
    """A broken cloud field (fraction 0.5) must transmit MORE solar
    radiation than the same water smeared over the whole layer — the
    plane-parallel bias McICA exists to remove."""
    atm, grid, lwc, cf = _scene()
    s1 = PprtsSolver(grid, solver_type="2str")
    s1.set_angles(sundir_from_angles(0.0, 30.0))
    res_pp = specint_pprts(s1, atm, albedo=0.1, lsolar=True, lthermal=False,
                           specint="ecckd", lwc=lwc)
    s2 = PprtsSolver(grid, solver_type="2str")
    s2.set_angles(sundir_from_angles(0.0, 30.0))
    res_mc = specint_pprts(s2, atm, albedo=0.1, lsolar=True, lthermal=False,
                           specint="ecckd", lwc=lwc, cld_frac=cf)
    sfc_pp = float(np.asarray(res_pp.edn)[-1].mean() + np.asarray(res_pp.edir)[-1].mean())
    sfc_mc = float(np.asarray(res_mc.edn)[-1].mean() + np.asarray(res_mc.edir)[-1].mean())
    assert sfc_mc > sfc_pp * 1.02, (sfc_mc, sfc_pp)


def test_mcica_limits():
    """cld_frac == 1 with in-cloud == grid-mean lwc must reproduce the
    plane-parallel result exactly; cld_frac -> 0 approaches clear sky."""
    atm, grid, lwc, cf = _scene(nx=4, ny=4)
    sun = sundir_from_angles(0.0, 40.0)

    def run(**kw):
        s = PprtsSolver(grid, solver_type="2str")
        s.set_angles(sun)
        r = specint_pprts(s, atm, albedo=0.1, lsolar=True, lthermal=False,
                          specint="ecckd", **kw)
        return float(np.asarray(r.edn)[-1].mean() + np.asarray(r.edir)[-1].mean())

    full = run(lwc=lwc, cld_frac=np.ones_like(cf))
    pp = run(lwc=lwc)
    assert full == pytest.approx(pp, rel=1e-5)

    clear = run()
    almost_clear = run(lwc=lwc * 0 + 1e-12, cld_frac=cf * 0 + 1e-6)
    assert almost_clear == pytest.approx(clear, rel=1e-3)


def test_mcica_thermal_runs():
    atm, grid, lwc, cf = _scene(nx=4, ny=4)
    s = PprtsSolver(grid, solver_type="2str")
    res = specint_pprts(s, atm, albedo=0.05, lsolar=False, lthermal=True,
                        specint="ecckd", lwc=lwc, cld_frac=cf)
    assert np.isfinite(np.asarray(res.abso)).all()
    assert float(np.asarray(res.eup)[0].mean()) > 100.0
