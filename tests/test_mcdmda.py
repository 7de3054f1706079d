"""Cross-validation of the 3_10 stream solver against the full-domain
Monte-Carlo solver.

Parity: reference `tests/test_pprts_rayli/` compares the stream solver
with a path tracer; `src/mcdmda.F90` is the in-repo MC reference.
"""

import jax
import numpy as np

from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.mcdmda import solve_mcdmda
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def test_mc_vs_twostream_homogeneous():
    # horizontally homogeneous absorbing/scattering slab: MC and the
    # delta-scaled two-stream agree on TOA albedo and transmission
    nz, nx, ny = 8, 8, 8
    kabs = np.full((nz, nx, ny), 2e-4, np.float32)
    ksca = np.full((nz, nx, ny), 1.5e-3, np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    dz = np.full(nz, 100.0, np.float32)
    albedo = 0.25
    sundir = sundir_from_angles(40.0, 30.0)
    edirTOA = 1000.0

    res = solve_mcdmda(
        jax.random.PRNGKey(0), kabs, ksca, g, dz, 100.0, 100.0, albedo,
        sundir, edirTOA, n_photons=120000,
    )

    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), solver_type="2str")
    solver.set_optical_properties(albedo, kabs, ksca, g, ldelta_scaling=True)
    solver.set_angles(sundir)
    solver.solve(lthermal=False, lsolar=True, edirTOA=edirTOA)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mc_eup = float(np.asarray(res.eup_toa).mean())
    ts_eup = float(eup[0].mean())
    mu = np.cos(np.deg2rad(30.0))
    # two-stream closure error + MC noise: agree within ~10 W/m2
    assert abs(mc_eup - ts_eup) < 0.03 * edirTOA * mu, (mc_eup, ts_eup)

    # energy conservation of the MC itself
    mc_total = (
        float(np.asarray(res.eup_toa).mean())
        + float((np.asarray(res.abso) * dz[:, None, None]).sum(0).mean())
        + float(np.asarray(res.sfc_absorbed).mean())
    )
    incoming = edirTOA * mu
    assert abs(mc_total - incoming) / incoming < 0.01, (mc_total, incoming)


def test_mc_vs_3_10_cloud_scene(opp_small):
    """Full 3-D cross-check: stream solver vs Monte-Carlo on a scene with
    a cloud (reference test_pprts_rayli semantics)."""
    import jax.numpy as jnp

    nz, nx, ny = 6, 12, 12
    kabs = np.full((nz, nx, ny), 1e-4, np.float32)
    ksca = np.full((nz, nx, ny), 5e-4, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    ksca[2:4, 4:8, 4:8] += 0.01
    kabs[2:4, 4:8, 4:8] += 0.001
    dz = np.full(nz, 100.0, np.float32)
    albedo = 0.2
    sundir = sundir_from_angles(160.0, 35.0)
    edirTOA = 1000.0

    mc = solve_mcdmda(
        jax.random.PRNGKey(3), kabs, ksca, g, dz, 100.0, 100.0, albedo,
        sundir, edirTOA, n_photons=200000,
    )

    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), opp_small)
    solver.set_optical_properties(albedo, kabs, ksca, g)
    solver.set_angles(sundir)
    solver.solve(lthermal=False, lsolar=True, edirTOA=edirTOA)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(35.0))
    # domain-mean TOA reflectance within a few percent of incoming
    mc_eup = float(np.asarray(mc.eup_toa).mean())
    ts_eup = float(eup[0].mean())
    assert abs(mc_eup - ts_eup) < 0.04 * edirTOA * mu, (mc_eup, ts_eup)
    # surface downwelling (dir+diff) field: correlated shadow patterns
    mc_dn = np.asarray(mc.edn_srfc)
    ts_dn = edir[-1] + edn[-1]
    cc = np.corrcoef(mc_dn.ravel(), ts_dn.ravel())[0, 1]
    assert cc > 0.8, cc
    assert abs(mc_dn.mean() - ts_dn.mean()) < 0.05 * edirTOA * mu, (
        mc_dn.mean(), ts_dn.mean(),
    )


def test_mc_cloud_shadow():
    # a cloud blob must cast a shadow in the MC surface fluxes
    nz, nx, ny = 6, 12, 12
    kabs = np.full((nz, nx, ny), 1e-5, np.float32)
    ksca = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)
    ksca[2, 4:8, 4:8] = 0.05  # thick cloud layer patch
    dz = np.full(nz, 100.0, np.float32)
    res = solve_mcdmda(
        jax.random.PRNGKey(1), kabs, ksca, g, dz, 100.0, 100.0, 0.0,
        sundir_from_angles(0.0, 1e-3), 1000.0, n_photons=80000,
    )
    edn = np.asarray(res.edn_srfc)
    shadow = edn[5:7, 5:7].mean()
    clear = edn[0:2, 0:2].mean()
    assert shadow < 0.6 * clear, (shadow, clear)
