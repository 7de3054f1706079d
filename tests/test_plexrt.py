"""plexrt wedge-mesh solver (reference `plexrt/plex_rt.F90` capability
on the structured extruded-triangle grid)."""

import jax
import numpy as np
import pytest

from tenstream_tpu.plexrt.mesh import fish_mesh
from tenstream_tpu.plexrt.optprop import (
    WedgeOptProp,
    load_or_create_wedge_lut,
)
from tenstream_tpu.plexrt.solver import PlexrtSolver
from tenstream_tpu.plexrt.wedge_boxmc import run_wedge_boxmc

import os

_LUTDIR = os.path.join(os.path.dirname(__file__), "data", "luts")


def _sundir(phi_deg, theta_deg):
    p, t = np.deg2rad(phi_deg), np.deg2rad(theta_deg)
    return np.array([np.sin(p) * np.sin(t), np.cos(p) * np.sin(t), -np.cos(t)])


@pytest.fixture(scope="module")
def opp():
    return WedgeOptProp(load_or_create_wedge_lut(n_photons=1500, basename=_LUTDIR))


def test_wedge_tracer_invariants():
    # transparent top source: down only, conserving
    T, S = run_wedge_boxmc(jax.random.PRNGKey(0), 0, False, 1e-8, 0.0, 0.0, 1.0,
                           n_photons=8000)
    S = np.asarray(S)
    np.testing.assert_allclose(S.sum(), 1.0, atol=2e-3)
    assert S[0] < 1e-6 and S[[2, 4, 6]].max() < 1e-6
    # conservative scattering conserves for every diffuse source
    for src in range(8):
        T, S = run_wedge_boxmc(jax.random.PRNGKey(src + 1), src, False,
                               1.5, 1.0, 0.5, 1.0, n_photons=8000)
        assert abs(float(np.asarray(S).sum()) - 1.0) < 8e-3
    # vertical transparent beam: all out the bottom
    T, S = run_wedge_boxmc(jax.random.PRNGKey(43), 0, True, 1e-8, 0.0, 0.0, 1.0,
                           0.0, 0.0, n_photons=4000)
    np.testing.assert_allclose(float(np.asarray(T)[4]), 1.0, atol=1e-3)


def test_transparent_transport_exact(opp):
    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp)
    z = np.full((5, 2, 6, 6), 1e-10, np.float32)
    s.set_optical_properties(0.3, z, z, np.zeros_like(z))
    s.set_angles(_sundir(30.0, 40.0))
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    # conservation is exact on the orientation-summed transport; the
    # per-orientation split carries the MC noise of the phi vs phi+180
    # table entries (independent samples at 1500 photons)
    mu = np.cos(np.deg2rad(40.0))
    np.testing.assert_allclose(edir[-1].mean(), 1000.0 * mu, rtol=1e-3)
    np.testing.assert_allclose(edir[-1], 1000.0 * mu, rtol=0.06)
    np.testing.assert_allclose(eup[0].mean(), 300.0 * mu, rtol=3e-2)  # albedo 0.3
    assert np.abs(abso).max() < 1e-3


def test_solar_energy_balance(opp):
    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp)
    ka = np.full((5, 2, 6, 6), 3e-4, np.float32)
    ks = np.full((5, 2, 6, 6), 1e-3, np.float32)
    gg = np.full((5, 2, 6, 6), 0.4, np.float32)
    s.set_optical_properties(0.3, ka, ks, gg)
    s.set_angles(_sundir(30.0, 40.0))
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    bal = (eup[0].mean() + (abso * 100.0).sum(0).mean()
           + (edir[-1] + edn[-1] - eup[-1]).mean())
    incoming = 1000.0 * np.cos(np.deg2rad(40.0))
    assert abs(bal - incoming) / incoming < 0.01, bal
    # horizontally uniform scene -> translation-invariant fluxes
    assert edn[-1].std() / max(edn[-1].mean(), 1e-6) < 0.02


def test_thermal_isothermal(opp):
    g = fish_mesh(6, 4, 4, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp)
    ka = np.full((6, 2, 4, 4), 5e-3, np.float32)
    pl = np.full((7, 2, 4, 4), 3.0, np.float32)
    s.set_optical_properties(0.0, ka, np.zeros_like(ka), np.zeros_like(ka), planck=pl)
    s.set_angles(_sundir(0.0, 40.0))
    sol = s.solve(lthermal=True, lsolar=False)
    _, edn, eup, abso = map(np.asarray, s.get_result(sol))
    assert sol.edir is None
    # 1500-photon test-fixture LUT: emissivity rows carry ~1-2% MC
    # noise which integrates to a few % on the broadband equilibrium
    np.testing.assert_allclose(eup[0].mean(), np.pi * 3.0, rtol=0.05)
    assert abs(edn[0]).max() < 1e-4
    # deep layers near radiative equilibrium (bound scales with the
    # fixture LUT's MC noise on the emissivity rows)
    assert np.abs(abso[-1]).max() * 100.0 < 0.2


def test_cloud_shadow(opp):
    """A cloudy block shades the triangles below it."""
    g = fish_mesh(5, 8, 8, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp)
    ka = np.full((5, 2, 8, 8), 1e-5, np.float32)
    ks = np.full((5, 2, 8, 8), 1e-5, np.float32)
    gg = np.full((5, 2, 8, 8), 0.3, np.float32)
    ks[1:3, :, 3:5, 3:5] += 0.05  # optically thick cloud
    s.set_optical_properties(0.1, ka, ks, gg)
    s.set_angles(_sundir(0.0, 1e-3))  # overhead
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    assert edir[-1, :, 3:5, 3:5].max() < 50.0  # shadow
    assert edir[-1, :, 0, 0].min() > 950.0  # clear columns
    # cloud top clearly brighter than the clear-sky ground reflection
    assert eup[0, :, 3:5, 3:5].mean() > 1.4 * eup[0, :, 0, 0].mean()


def test_specint_plexrt(opp):
    """Spectral integration on the wedge solver (reference
    `specint/specint_plexrt.F90`): ecCKD SW subset over a cloud."""
    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.spectral.specint_plexrt import specint_plexrt

    atm = setup_standard_atmosphere(nlay=12, ztop=12e3)
    g = fish_mesh(atm.nlay, 4, 4, 500.0, 500.0, np.asarray(atm.dz, np.float32))
    s = PlexrtSolver(g, opp)
    s.set_angles(_sundir(20.0, 30.0))
    lwc = np.zeros((atm.nlay, 2, 4, 4), np.float32)
    lwc[8, :, 1:3, 1:3] = 0.3
    res = specint_plexrt(s, atm, 0.2, lthermal=False, lsolar=True,
                         specint="ecckd", lwc=lwc,
                         reliq=np.full_like(lwc, 10.0), max_gpt=3)
    edir = np.asarray(res.edir)
    abso = np.asarray(res.abso)
    assert np.isfinite(edir).all() and np.isfinite(abso).all()
    assert edir[0].std() < 1e-3  # uniform TOA
    # the cloud extinguishes the beam below it
    assert edir[9, :, 1:3, 1:3].mean() < 0.5 * edir[9, :, 0, 0].mean()
    # thermal path exercises per-gpt Planck broadcast
    res2 = specint_plexrt(s, atm, 0.05, lthermal=True, lsolar=False,
                          specint="ecckd", max_gpt=3)
    assert np.isfinite(np.asarray(res2.eup)).all()
    assert np.asarray(res2.eup)[0].mean() > 1.0  # nonzero OLR contribution


def test_wedge_solver_vs_domain_mc(opp):
    """Quantitative 3-D MC cross-validation of the wedge solver
    (reference `test_plexrt_rayli` validates plexrt against the rayli
    path tracer).  Both triangles of every rectangle share the same
    optical properties, so the continuous medium equals a cube-cell
    medium and the in-repo full-domain MC (`pprts/mcdmda.py`) is an
    exact reference for the wedge discretization."""
    import jax

    from tenstream_tpu.pprts.mcdmda import solve_mcdmda

    nz, nx, ny = 6, 8, 8
    dz = np.full(nz, 100.0, np.float32)
    kabs = np.full((nz, nx, ny), 1e-4, np.float32)
    ksca = np.full((nz, nx, ny), 3e-4, np.float32)
    gg = np.full((nz, nx, ny), 0.5, np.float32)
    # cloud blob
    kabs[2:4, 3:6, 3:6] += 2e-3
    ksca[2:4, 3:6, 3:6] += 2e-2
    albedo, edirTOA = 0.2, 1000.0
    sundir = _sundir(30.0, 40.0)

    res = solve_mcdmda(
        jax.random.PRNGKey(5), kabs, ksca, gg, dz, 100.0, 100.0, albedo,
        sundir, edirTOA, n_photons=150000,
    )
    mc_eup = float(np.asarray(res.eup_toa).mean())
    mc_edn_sfc = float(np.asarray(res.edn_srfc).mean())

    g = fish_mesh(nz, nx, ny, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp)
    per_tri = lambda a: np.repeat(a[:, None], 2, axis=1)
    s.set_optical_properties(albedo, per_tri(kabs), per_tri(ksca), per_tri(gg))
    s.set_angles(sundir)
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=edirTOA)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))

    wx_eup = float(eup[0].mean())
    wx_edn_sfc = float((edir[-1] + edn[-1]).mean())
    mu = np.cos(np.deg2rad(40.0))
    # domain means: stream discretization + LUT noise vs MC noise
    assert abs(wx_eup - mc_eup) < 0.04 * edirTOA * mu, (wx_eup, mc_eup)
    assert abs(wx_edn_sfc - mc_edn_sfc) < 0.05 * edirTOA * mu, (
        wx_edn_sfc, mc_edn_sfc)
    # the cloud shadow must sit in the same place: column-wise surface
    # flux correlates strongly with the MC
    mc_map = np.asarray(res.edn_srfc)
    wx_map = (edir[-1] + edn[-1]).mean(axis=0)  # average the two triangles
    cc = np.corrcoef(mc_map.ravel(), wx_map.ravel())[0, 1]
    assert cc > 0.85, cc


def test_bicgstab_matches_fixedpoint(opp):
    """diff_solver='bicgstab' (reference KSPFBCGS parity,
    `plexrt/plex_rt.F90:2228`) must reproduce the fixed-point solve and
    report convergence metadata (niter/res/tol, pprts Solution parity)."""
    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    ka = np.full((5, 2, 6, 6), 3e-4, np.float32)
    ks = np.full((5, 2, 6, 6), 2e-3, np.float32)
    ks[2, :, 2:4, 2:4] = 0.05  # embedded scatterer
    gg = np.full((5, 2, 6, 6), 0.4, np.float32)
    res = {}
    for ds in ("fixedpoint", "bicgstab"):
        s = PlexrtSolver(g, opp, diff_solver=ds)
        s.set_optical_properties(0.3, ka, ks, gg)
        s.set_angles(_sundir(30.0, 40.0))
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        assert int(np.asarray(sol.niter_diff)) > 0
        assert float(np.asarray(sol.diff_res)) <= float(np.asarray(sol.diff_tol)) * 10.0
        res[ds] = [None if a is None else np.asarray(a) for a in s.get_result(sol)]
    for a, b in zip(res["fixedpoint"], res["bicgstab"]):
        if a is not None:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_wedge_solve_matches_single(opp):
    """(x, y)-sharded structured wedge solve == single-device solve
    (1-proc == N-proc reference suite semantics for plexrt)."""
    from tenstream_tpu.parallel.mesh import make_mesh

    g = fish_mesh(4, 8, 8, 100.0, 100.0, 100.0)
    rng = np.random.default_rng(11)
    ka = (1e-4 + 1e-3 * rng.random((4, 2, 8, 8))).astype(np.float32)
    ks = (1e-4 + 8e-3 * rng.random((4, 2, 8, 8))).astype(np.float32)
    gg = np.full((4, 2, 8, 8), 0.4, np.float32)
    out = {}
    for shard in (False, True):
        s = PlexrtSolver(g, opp)
        if shard:
            s.set_mesh(make_mesh(jax.devices()[:8]))
        s.set_optical_properties(0.2, ka, ks, gg)
        s.set_angles(_sundir(25.0, 35.0))
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        out[shard] = [None if a is None else np.asarray(a)
                      for a in s.get_result(sol)]
    for a, b in zip(out[False], out[True]):
        if a is not None:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3)
