"""Direct-solve inner-iteration policy (`edir.inner_iter_policy`).

The x<->y side-stream pair iteration is a linear fixed-point map whose
contraction rate degrades toward grazing sun; round 5 replaced the fixed
plain n_inner=8 with theta-tiered pass counts + Aitken extrapolation.
These tests pin the accuracy claims: every tier must match a deeply
converged plain solve within physically negligible error, and must not
be WORSE than the old fixed-8 default at its angle.

Reference semantics: the repeated sun-ordered forward sweep of
`explicit_edir` (`src/pprts_explicit.F90:60-230`), iterated to a
residual tolerance.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tenstream_tpu.pprts.coeffs import assemble_coeffs  # noqa: E402
from tenstream_tpu.pprts.edir import inner_iter_policy, solve_edir  # noqa: E402
from tenstream_tpu.pprts.grid import Grid  # noqa: E402
from tenstream_tpu.pprts.sun import (  # noqa: E402
    suninfo_from_sundir,
    sundir_from_angles,
)


def _scene(opp, phi, theta, nz=16, nx=16, ny=16):
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    ka[6:12, 4:12, 4:12] = 5e-3
    ks[6:12, 4:12, 4:12] = 8e-2
    g[6:12, 4:12, 4:12] = 0.85
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 50.0)  # aspect 0.5
    sun = suninfo_from_sundir(sundir_from_angles(phi, theta))
    coeffs, _ = assemble_coeffs(
        opp.scheme, opp, jnp.asarray(ka), jnp.asarray(ks), jnp.asarray(g),
        grid.dz3d, grid.dx, np.zeros(nz, bool), sun, need_dir=True,
    )
    inc = (jnp.ones((opp.scheme.dirtop.dof, nx, ny), jnp.float32)
           * 1368.0 * sun.mu / opp.scheme.dirtop.dof)
    return coeffs.dir2dir, inc, sun


@pytest.mark.parametrize("phi,theta", [(45.0, 40.0), (45.0, 60.0), (45.0, 80.0)])
def test_tier_beats_old_fixed8(opp_small, phi, theta):
    c, inc, sun = _scene(opp_small, phi, theta)
    scheme = opp_small.scheme
    ref = np.asarray(solve_edir(scheme, c, inc, sun.xinc, sun.yinc,
                                n_inner=40))
    scale = np.abs(ref).max()

    ni, ait, cl = inner_iter_policy(theta)
    e_tier = np.asarray(solve_edir(scheme, c, inc, sun.xinc, sun.yinc,
                                   n_inner=ni, aitken=ait, cleanup=cl))
    e_old = np.asarray(solve_edir(scheme, c, inc, sun.xinc, sun.yinc,
                                  n_inner=8))
    err_tier = np.abs(e_tier - ref).max()
    err_old = np.abs(e_old - ref).max()
    # the new default must not regress on the old one...
    assert err_tier <= max(err_old * 1.5, 1e-3 * scale), (theta, err_tier, err_old)
    # ...and must be physically negligible in absolute terms
    assert err_tier <= 2e-3 * scale, (theta, err_tier, scale)


def test_aitken_noop_on_uniform_vertical_sun(opp_small):
    """Vertical sun -> no side streams -> the Aitken deltas are zero and
    the extrapolation must be an exact no-op (guards the rho = 0/0 edge)."""
    c, inc, sun = _scene(opp_small, 0.0, 0.0)
    scheme = opp_small.scheme
    a = np.asarray(solve_edir(scheme, c, inc, sun.xinc, sun.yinc,
                              n_inner=3, aitken=True, cleanup=False))
    b = np.asarray(solve_edir(scheme, c, inc, sun.xinc, sun.yinc,
                              n_inner=3))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_policy_tiers():
    # round-5 retune: one-pass margin + always-cleanup (the original
    # (3, aitken, no-cleanup) low tier left 1.13 W on the golden scene)
    assert inner_iter_policy(0.0) == (4, True, True)
    assert inner_iter_policy(40.0) == (4, True, True)
    assert inner_iter_policy(60.0) == (4, True, True)
    assert inner_iter_policy(80.0) == (7, True, True)
