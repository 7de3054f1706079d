"""BiCGStab plateau-restart regression (`pprts/ediff.py:solve_bicgstab`).

A thermal box-cloud system made BiCGStab plateau at iteration ~3 (rhat
lost its component along the remaining error); the stall exit then
silently returned a near-zero "best iterate" (surface edn 5.5 W/m2
where the true answer is 80.9) while line-preconditioned Richardson
converged fine.  The in-loop restart (every 10 non-improving iterations,
from the best iterate) must recover convergence, and the returned
(diff_res, diff_tol) pair must expose any residual stall.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _solve(diff_solver, opp_small):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 16, 12, 12
    ka = np.full((nz, nx, ny), 2e-5, np.float32)
    ks = np.full((nz, nx, ny), 2e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)
    ka[6:8, 4:8, 4:8] = 4e-3
    ks[6:8, 4:8, 4:8] = 4e-2
    g[6:8, 4:8, 4:8] = 0.85
    planck = np.broadcast_to(
        np.linspace(100.0, 130.0, nz + 1)[:, None, None], (nz + 1, nx, ny)
    ).astype(np.float32)

    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    s = PprtsSolver(grid, opp_small)
    s.options.set("diff_solver", diff_solver)
    s.options.set("accept_incomplete_solve", False)  # raise on stall
    s.set_optical_properties(0.1, ka, ks, g, planck=planck)
    s.set_angles(sundir_from_angles(40.0, 55.0))
    s.solve(lthermal=True, lsolar=False, uid=1)
    sol = s.solutions[1]
    _, edn, eup, _ = map(np.asarray, s.get_result(uid=1))
    return sol, edn, eup


def test_thermal_bicgstab_matches_richardson(opp_small):
    sol_b, edn_b, eup_b = _solve("bicgstab", opp_small)
    sol_r, edn_r, eup_r = _solve("richardson", opp_small)
    # converged (not stall-exited): residual honors the tolerance
    assert float(np.max(np.asarray(sol_b.diff_res))) <= 10.0 * float(
        np.max(np.asarray(sol_b.diff_tol))
    )
    np.testing.assert_allclose(edn_b, edn_r, atol=0.15)
    np.testing.assert_allclose(eup_b, eup_r, atol=0.15)


def test_seed_rescale_recovers_wrong_amplitude(opp_small):
    """Round-5 optimal-scale seeding: an x0 with the right SHAPE but a
    3x-wrong amplitude must converge in no more iterations than the
    exact-seed solve plus a couple (alpha = <Ax0,b>/<Ax0,Ax0> rescales
    it before the Krylov loop), where an unscaled wrong-amplitude seed
    used to burn iterations undoing the amplitude error."""
    import jax.numpy as jnp
    import numpy as np

    from tenstream_tpu.pprts.coeffs import assemble_coeffs
    from tenstream_tpu.pprts.ediff import solve_bicgstab
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.sun import suninfo_from_sundir, sundir_from_angles

    scheme = opp_small.scheme
    nz, nx, ny = 10, 16, 16
    rng = np.random.default_rng(11)
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    ka[4:7, 4:12, 4:12] = 5e-3
    ks[4:7, 4:12, 4:12] = 5e-2
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    sun = suninfo_from_sundir(sundir_from_angles(30.0, 40.0))
    coeffs, _ = assemble_coeffs(
        scheme, opp_small, jnp.asarray(ka), jnp.asarray(ks), jnp.asarray(g),
        grid.dz3d, grid.dx, np.zeros(nz, bool), sun, need_dir=False,
    )
    alb = jnp.full((nx, ny), 0.2, jnp.float32)
    b = jnp.asarray(np.abs(rng.standard_normal((scheme.ndiff, nz + 1, nx, ny))),
                    jnp.float32)
    b = b.at[scheme.difftop.dof:, -1].set(0.0)

    x_true, n_cold, _ = solve_bicgstab(
        scheme, coeffs.diff2diff, b, alb, rtol=1e-6, atol=1e-10,
        precond="two_level")
    # exact seed: alpha == 1, converges immediately
    _, n_exact, _ = solve_bicgstab(
        scheme, coeffs.diff2diff, b, alb, x0=x_true, rtol=1e-6, atol=1e-10,
        precond="two_level")
    assert int(n_exact) <= 2
    # 3x-wrong amplitude: rescale must bring it back to ~n_exact
    _, n_scaled, _ = solve_bicgstab(
        scheme, coeffs.diff2diff, b, alb, x0=3.0 * x_true, rtol=1e-6,
        atol=1e-10, precond="two_level")
    assert int(n_scaled) <= int(n_exact) + 2, (int(n_scaled), int(n_exact))
    assert int(n_scaled) < int(n_cold)
