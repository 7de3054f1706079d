"""Atmosphere collapse (reference `-atm_collapse` / `handle_atm_collapse`,
`src/pprts.F90:685-705,2080-2198`; test `tests/test_pprts_rrtm_icollapse`):
the top K 1-D layers fold into ONE effective layer via the adding method.
Fluxes at and below the collapsed region must match the uncollapsed solve
exactly (block-model Schur equivalence) for both solar and thermal — the
per-layer B_eff emission rows fold through the same exact interface
recursion as the diffuse coefficients."""

import numpy as np
import pytest

from tenstream_tpu.core.config import Options
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles

K = 8  # layers to collapse


def _scene(nz=16, nx=8, ny=8):
    # top K layers: thick (aspect 5 -> 1-D), below: cubic 3-D layers
    dz = np.concatenate([np.full(K, 500.0), np.full(nz - K, 100.0)]).astype(np.float32)
    dz3 = np.broadcast_to(dz[:, None, None], (nz, nx, ny)).copy()
    rng = np.random.default_rng(5)
    ka = (1e-5 + 2e-4 * rng.random((nz, nx, ny))).astype(np.float32)
    ks = (1e-5 + 1e-4 * rng.random((nz, nx, ny))).astype(np.float32)
    g = np.full((nz, nx, ny), 0.3, np.float32)
    ks[nz - 5, 2:6, 2:6] += 0.02  # a cloud below the collapsed region
    ka[nz - 5, 2:6, 2:6] += 0.003
    planck = np.linspace(2.0, 9.0, nz + 1)[:, None, None].astype(np.float32) \
        * np.ones((nx, ny), np.float32)
    return dz3, ka, ks, g, planck


def _solve(opp, collapse, lthermal, lsolar):
    dz3, ka, ks, g, planck = _scene()
    nz, nx, ny = ka.shape
    opts = Options()
    if collapse:
        opts.set("atm_collapse", K)
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, dz3), opp,
                         options=opts)
    solver.set_optical_properties(0.2, ka, ks, g,
                                  planck=planck if lthermal else None)
    solver.set_angles(sundir_from_angles(40.0, 35.0))
    solver.solve(lthermal=lthermal, lsolar=lsolar,
                 edirTOA=1000.0 if lsolar else 0.0)
    edir, edn, eup, abso = solver.get_result()
    conv = lambda a: None if a is None else np.asarray(a)
    return conv(edir), conv(edn), conv(eup), conv(abso), solver


def test_collapse_solar_exact(opp_small):
    """Solar fluxes below the collapsed stack are block-model exact."""
    edir_f, edn_f, eup_f, abso_f, _ = _solve(opp_small, False, False, True)
    edir_c, edn_c, eup_c, abso_c, s = _solve(opp_small, True, False, True)
    assert s.nz_solve == edir_f.shape[0] - 1 - (K - 1)
    # faces K.. of the full solve == faces 1.. of the collapsed solve
    np.testing.assert_allclose(edir_c[1:], edir_f[K:], rtol=2e-4, atol=0.05)
    np.testing.assert_allclose(edn_c[1:], edn_f[K:], rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(eup_c[1:], eup_f[K:], rtol=1e-3, atol=0.05)
    # TOA eup (reflection of the whole column) matches too
    np.testing.assert_allclose(eup_c[0], eup_f[0], rtol=1e-3, atol=0.05)
    # absorption in the 3-D region below
    np.testing.assert_allclose(abso_c[1:], abso_f[K:], rtol=2e-3, atol=1e-4)


def test_collapse_thermal(opp_small):
    """Thermal fluxes below the stack are block-model exact too: the
    super-layer emission folds the per-layer B_eff emission rows through
    the exact interface recursion (the reference instead approximates
    with a no-scattering schwarzschild integral,
    src/pprts.F90:2192-2197)."""
    _, edn_f, eup_f, abso_f, _ = _solve(opp_small, False, True, False)
    _, edn_c, eup_c, abso_c, _ = _solve(opp_small, True, True, False)
    np.testing.assert_allclose(edn_c[1:], edn_f[K:], rtol=5e-3, atol=0.1)
    np.testing.assert_allclose(eup_c[1:], eup_f[K:], rtol=5e-3, atol=0.1)
    np.testing.assert_allclose(eup_c[0], eup_f[0], rtol=5e-3, atol=0.1)


def test_collapse_specint(opp_small):
    """atm_collapse through the full-spectrum driver: TOA/sfc broadband
    fluxes match the uncollapsed solve (reference
    `test_pprts_rrtm_icollapse` gates TOA/srfc fluxes)."""
    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.spectral.specint import specint_pprts

    # background atmosphere: coarse (1-D) layers above, fine below
    z_low = np.arange(0.0, 2001.0, 250.0)
    z_high = np.geomspace(2500.0, 30e3, 9)
    zlev = np.concatenate([z_high[::-1], z_low[::-1][:-1], [0.0]])
    atm = setup_standard_atmosphere(z_grid=zlev)
    nz = atm.nlay
    nx = ny = 4
    Kc = 8
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, np.asarray(atm.dz, np.float32))

    def run(collapse):
        opts = Options()
        if collapse:
            opts.set("atm_collapse", Kc)
        sol = PprtsSolver(grid, opp_small, options=opts)
        sol.set_angles(sundir_from_angles(0.0, 40.0))
        return specint_pprts(sol, atm, albedo=0.15, lthermal=True,
                             lsolar=True, specint="ecckd"), sol

    rf, _ = run(False)
    rc, sc = run(True)
    assert np.asarray(rc.edn).shape[0] == sc.nz_solve + 1
    # surface + TOA broadband fluxes
    np.testing.assert_allclose(np.asarray(rc.edir)[-1], np.asarray(rf.edir)[-1],
                               rtol=2e-3, atol=0.2)
    np.testing.assert_allclose(np.asarray(rc.edn)[-1], np.asarray(rf.edn)[-1],
                               rtol=0.02, atol=1.0)
    np.testing.assert_allclose(np.asarray(rc.eup)[0], np.asarray(rf.eup)[0],
                               rtol=0.02, atol=1.0)


def test_collapse_rejects_3d_region(opp_small):
    """Collapsing non-1-D layers must fail loudly (the reference only
    warns and silently changes results, src/pprts.F90:698-702)."""
    dz3, ka, ks, g, _ = _scene()
    nz, nx, ny = ka.shape
    opts = Options()
    opts.set("atm_collapse", K + 4)  # reaches into the 3-D region
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, dz3), opp_small,
                         options=opts)
    solver.set_optical_properties(0.2, ka, ks, g)
    solver.set_angles(sundir_from_angles(40.0, 35.0))
    with pytest.raises(ValueError):
        solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
