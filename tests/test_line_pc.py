"""Factored vertical-line preconditioner (`ediff.make_line_pc`).

Round 5 split `vertical_line_solve` into a once-per-solve factorization
(the r-independent R/D elimination) and a per-apply path of two
log-depth affine associative scans.  The math is identical; these tests
pin (a) equivalence to the fused reference implementation at f32
roundoff on stressed scenes, and (b) that M really solves the vertical
system: (I - S_vert) M(r) == r on a horizontally-uniform scene where
the full operator has no horizontal couplings beyond the side dofs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tenstream_tpu.pprts.coeffs import assemble_coeffs  # noqa: E402
from tenstream_tpu.pprts.ediff import (  # noqa: E402
    make_line_pc,
    vertical_line_solve,
)
from tenstream_tpu.pprts.grid import Grid  # noqa: E402
from tenstream_tpu.pprts.sun import (  # noqa: E402
    suninfo_from_sundir,
    sundir_from_angles,
)


def _coeffs(opp, nz=14, nx=8, ny=8, stressed=False):
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.3, np.float32)
    if stressed:
        ka[:] = 1e-7
        ks[:] = 0.5  # thick conservative scattering
        g[:] = 0.0
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    sun = suninfo_from_sundir(sundir_from_angles(30.0, 40.0))
    coeffs, _ = assemble_coeffs(
        opp.scheme, opp, jnp.asarray(ka), jnp.asarray(ks), jnp.asarray(g),
        grid.dz3d, grid.dx, np.zeros(nz, bool), sun, need_dir=False,
    )
    return coeffs.diff2diff


@pytest.mark.parametrize("stressed,albedo", [(False, 0.2), (True, 1.0)])
def test_matches_fused_reference(opp_small, stressed, albedo):
    coeff = _coeffs(opp_small, stressed=stressed)
    scheme = opp_small.scheme
    nz = coeff.shape[2]
    alb = jnp.full(coeff.shape[-2:], albedo, jnp.float32)

    rng = np.random.default_rng(7)
    r = jnp.asarray(
        rng.standard_normal((scheme.ndiff, nz + 1) + coeff.shape[-2:]),
        jnp.float32,
    )

    ref = np.asarray(jax.jit(vertical_line_solve, static_argnums=0)(
        scheme, coeff, r, alb))
    M = make_line_pc(scheme, coeff, alb)
    got = np.asarray(jax.jit(M)(r))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5 * scale)


def test_solves_vertical_system(opp_small):
    """On the vertical sub-operator: (I - S_vert)(M r) == r exactly.
    Build S_vert by zeroing every coupling except the difftop pair."""
    from tenstream_tpu.pprts.operators import diff_coeff_full, diffuse_scatter

    coeff = _coeffs(opp_small)
    scheme = opp_small.scheme
    nz = coeff.shape[2]
    alb = jnp.full(coeff.shape[-2:], 0.3, jnp.float32)

    inward = scheme.diff_inward()
    d_up = 0 if not inward[0] else 1
    d_dn = 1 - d_up
    cf = np.asarray(diff_coeff_full(coeff))
    cvert = np.zeros_like(cf)
    for s, d in [(d_dn, d_dn), (d_up, d_dn), (d_up, d_up), (d_dn, d_up)]:
        cvert[s, d] = cf[s, d]
    cvert = jnp.asarray(cvert)

    rng = np.random.default_rng(8)
    r = jnp.asarray(
        rng.standard_normal((scheme.ndiff, nz + 1) + coeff.shape[-2:]),
        jnp.float32,
    )
    # side dofs are identity in M: restrict the check to the top pair
    M = make_line_pc(scheme, coeff, alb)
    z = M(r)
    Az = z - diffuse_scatter(scheme, cvert, z, alb)
    for d in (d_dn, d_up):
        np.testing.assert_allclose(
            np.asarray(Az[d]), np.asarray(r[d]), atol=3e-5,
            err_msg=f"dof {d}",
        )
