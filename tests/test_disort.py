"""DISORT-class multi-stream 1-D solver (doubling-adding).

Reference couples DISORT as its plane-parallel high-accuracy column
solver (`t_solver_disort`); validation here is against analytic limits
and the in-repo Monte Carlo (`pprts/mcdmda.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.ops.disort import disort_fluxes


def test_pure_absorption_beam():
    nz, mu0 = 10, 0.6
    dtau = jnp.full((nz, 1), 0.2)
    S, Edn, Eup = disort_fluxes(dtau, jnp.zeros((nz, 1)), jnp.zeros((nz, 1)),
                                mu0, 100.0, 0.0)
    np.testing.assert_allclose(
        float(S[-1, 0]), 100.0 * np.exp(-2.0 / mu0), rtol=1e-5
    )
    assert float(jnp.abs(Edn).max()) == 0.0
    assert float(jnp.abs(Eup).max()) == 0.0


def test_conservative_cloud_over_reflector():
    # w0=1, albedo=1: every photon returns to space
    nz, mu0 = 20, 0.6
    S, Edn, Eup = disort_fluxes(
        jnp.full((nz, 1), 0.5), jnp.full((nz, 1), 1.0), jnp.full((nz, 1), 0.85),
        mu0, 100.0, 1.0,
    )
    np.testing.assert_allclose(float(Eup[0, 0]), 60.0, rtol=2e-3)


def test_isothermal_limits():
    nz, B = 20, 3.0
    pl = jnp.full((nz + 1, 1), B)
    S, Edn, Eup = disort_fluxes(
        jnp.full((nz, 1), 2.0), jnp.zeros((nz, 1)), jnp.zeros((nz, 1)),
        None, 0.0, 0.0, planck=pl,
    )
    np.testing.assert_allclose(float(Eup[0, 0]), np.pi * B, rtol=1e-4)
    np.testing.assert_allclose(float(Edn[-1, 0]), np.pi * B, rtol=1e-4)
    # with scattering (conservative isothermal still reaches pi*B at sfc)
    S, Edn, Eup = disort_fluxes(
        jnp.full((nz, 1), 1.0), jnp.full((nz, 1), 0.5), jnp.full((nz, 1), 0.3),
        None, 0.0, 0.0, planck=pl,
    )
    np.testing.assert_allclose(float(Edn[-1, 0]), np.pi * B, rtol=1e-3)


def test_vs_monte_carlo_thick_anisotropic():
    """The case where two-stream errs by ~2x: tau=8, w0=0.9, g=0.85."""
    from tenstream_tpu.pprts.mcdmda import solve_mcdmda
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, mu0 = 20, 0.6
    w0v, gv = 0.9, 0.85
    kext = 0.4 / 100.0
    dtau = jnp.full((nz, 1), 0.4)
    S, Edn, Eup = disort_fluxes(
        dtau, jnp.full((nz, 1), w0v), jnp.full((nz, 1), gv), mu0, 100.0, 0.2
    )

    ka = jnp.full((nz, 4, 4), (1 - w0v) * kext)
    ks = jnp.full((nz, 4, 4), w0v * kext)
    gg = jnp.full((nz, 4, 4), gv)
    theta = float(np.rad2deg(np.arccos(mu0)))
    mc = solve_mcdmda(
        jax.random.PRNGKey(0), ka, ks, gg, jnp.full((nz,), 100.0),
        100.0, 100.0, 0.2, sundir_from_angles(0.0, theta), 100.0,
        n_photons=200000,
    )
    eup_mc = float(np.asarray(mc.eup_toa).mean())
    edn_mc = float(np.asarray(mc.edn_srfc).mean())  # includes direct
    eup_d = float(Eup[0, 0])
    edn_d = float(Edn[-1, 0]) + mu0 * float(S[-1, 0])
    assert abs(eup_d - eup_mc) / eup_mc < 0.03, (eup_d, eup_mc)
    assert abs(edn_d - edn_mc) / edn_mc < 0.03, (edn_d, edn_mc)


def test_solver_type_disort():
    """PprtsSolver dispatch: combined solar+thermal single solve."""
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 10, 4, 4
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, solver_type="disort")
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    planck = np.full((nz + 1, nx, ny), 3.0, np.float32)
    solver.set_optical_properties(0.2, ka, ks, g, planck=planck)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=True, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    # solar balance incl. thermal: check TOA direct is in horizontal units
    np.testing.assert_allclose(edir[0], 1000.0 * mu, rtol=1e-5)
    assert np.isfinite(abso).all()
    # solar-only closure: subtract a thermal-only re-solve
    solver2 = PprtsSolver(grid, solver_type="disort")
    solver2.set_optical_properties(0.2, ka, ks, g, planck=planck)
    solver2.set_angles(sundir_from_angles(30.0, 40.0))
    solver2.solve(lthermal=True, lsolar=False)
    _, edn_t, eup_t, _ = map(np.asarray, solver2.get_result())
    inc = 1000.0 * mu
    bal = (
        (eup[0] - eup_t[0]).mean()
        + (edir[-1] + (edn[-1] - edn_t[-1]) - (eup[-1] - eup_t[-1])).mean() * 1.0
        + ((abso * 100.0).sum(0).mean()
           - ((edn_t - eup_t)[:-1] - (edn_t - eup_t)[1:]).sum(0).mean())
    )
    assert abs(bal - inc) / inc < 0.01, (bal, inc)


def test_disort_vs_twostream_thin_isotropic():
    """Thin isotropic scattering: 2str is accurate there, both agree."""
    from tenstream_tpu.ops.twostream import delta_eddington_twostream

    nz, mu0 = 10, 0.7
    dtau = jnp.full((nz, 1), 0.02)
    w0 = jnp.full((nz, 1), 0.5)
    g = jnp.zeros((nz, 1))
    S, Edn, Eup = disort_fluxes(dtau, w0, g, mu0, 100.0, 0.3)
    St, Ednt, Eupt = delta_eddington_twostream(
        dtau, w0, g, mu0, 100.0, jnp.asarray([0.3])
    )
    # disort diffuse outputs are horizontal; twostream's are per tilted
    # beam unit (scaled by mu at get_result)
    np.testing.assert_allclose(float(S[-1, 0]), float(St[-1, 0]), rtol=1e-3)
    np.testing.assert_allclose(float(Eup[0, 0]), mu0 * float(Eupt[0, 0]), rtol=0.05)
    np.testing.assert_allclose(float(Edn[-1, 0]), mu0 * float(Ednt[-1, 0]), rtol=0.05)
