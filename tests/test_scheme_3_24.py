"""Angular-bin side schemes 3_24 / 3_30 / 8_18 (reference
`boxmc_3_24.inc`, `boxmc_3_30.inc`, `boxmc_8_18.inc`)."""

import os

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc
from tenstream_tpu.streams import get_scheme


def test_3_24_transparent_quadrant_binning():
    # Edn quadrant-q0 source (+x, +y, down) in a transparent box: exits
    # only through bot-q0, +x side or +y side quadrant bins
    T, S = run_boxmc(
        jax.random.PRNGKey(0), "3_24", 1, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    np.testing.assert_allclose(S.sum(), 1.0, atol=2e-3)
    assert S[1] > 0.1  # bot Edn q0
    assert S[[3, 5, 7]].max() < 1e-6  # no other bot quadrants
    assert S[[0, 2, 4, 6]].max() < 1e-6  # nothing upward
    # x-side exits land in the (+y, dn) = q1 inward bin (dof 9+2*1=11),
    # y-side exits in q1 inward (17+2=19)
    assert S[11] > 0.1 and S[19] > 0.1
    assert S[[9, 13, 15]].max() < 1e-6 and S[[17, 21, 23]].max() < 1e-6


def test_3_30_main_stream_invariants():
    # main source (|mu_z| >= 0.75): can exit bot-main or side bins, but
    # never a bot quadrant bin (the direction is unchanged when
    # transparent) and never upward
    T, S = run_boxmc(
        jax.random.PRNGKey(3), "3_30", 1, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    assert S[[3, 5, 7, 9]].max() < 1e-6
    assert S[[0, 2, 4, 6, 8]].max() < 1e-6
    assert S[1] > 0.3
    np.testing.assert_allclose(S.sum(), 1.0, atol=2e-3)

    # grazing quadrant source (mu < 0.75) never lands in bot-main
    T, S = run_boxmc(
        jax.random.PRNGKey(4), "3_30", 3, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    assert S[1] < 1e-6 and S[[5, 7, 9]].max() < 1e-6
    assert S[3] > 0.005  # small: most photons leave via the sides
    # side exits may reach the side *main* bins (|mu_x| can exceed alim)
    assert S[11] + S[15] > 0.2


@pytest.mark.parametrize("scheme", ["3_24", "3_30", "8_18"])
def test_energy_conservation(scheme):
    T, S = run_boxmc(
        jax.random.PRNGKey(1), scheme, 0, False, 1.5, 1.0, 0.5, 1.0, n_photons=20000
    )
    total = float(np.asarray(S).sum())
    assert abs(total - 1.0) < 5e-3, total
    T, S = run_boxmc(
        jax.random.PRNGKey(2), scheme, 0, True, 1.0, 1.0, 0.3, 1.0, 0.0, 40.0,
        n_photons=20000,
    )
    total = float(np.asarray(T).sum() + np.asarray(S).sum())
    assert abs(total - 1.0) < 5e-3, total


def test_8_18_sector_source():
    T, S = run_boxmc(
        jax.random.PRNGKey(5), "8_18", 3, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    assert S[1] < 1e-6  # never bot-main (mu < alim preserved)
    assert S[[5, 7, 9]].max() < 1e-6  # wrong sectors stay empty
    assert S[3] > 0.005  # grazing: most photons leave via the sides
    assert S[15] > 0.5  # +y sector exits mostly through the YMAX face
    assert S[14] < 1e-6  # and never through YMIN (it moves +y)


def test_bin_weights():
    s = get_scheme("3_30")
    w = s.difftop_weights()
    np.testing.assert_allclose(w[0], 1.0 - 0.75**2)
    np.testing.assert_allclose(w[2:], 0.75**2 / 4.0)
    np.testing.assert_allclose(w[::2].sum(), 1.0)
    np.testing.assert_allclose(s.diffside_weights()[::2].sum(), 1.0)
    # MC check: Lambertian bin occupation matches the analytic weights.
    # An isotropic-in, Lambertian-out transparent 1-D slab: use a very
    # wide box (aspect -> 0) so side leakage vanishes; an Edn main
    # source then lands entirely in the bot main bin etc., and a FULL
    # hemisphere source (approximated by the 1_2 scheme is not binned) —
    # instead check sampled mu of the quad source stays below alim.
    T, Sq = run_boxmc(
        jax.random.PRNGKey(6), "3_30", 3, False, 1e-8, 0.0, 0.0, 0.01, n_photons=4000
    )
    Sq = np.asarray(Sq)
    assert Sq[3] > 0.95  # nearly all out through the matching bot bin
    # (the residual is near-grazing photons that still reach a side wall)


def test_8_12_ring_binning():
    s = get_scheme("8_12")
    np.testing.assert_allclose(s.difftop_weights(), [0.75, 0.75, 0.25, 0.25])
    # inner ring (mu >= 0.5) downward: exits bot inner ring + sides,
    # never the outer ring (direction preserved when transparent)
    T, S = run_boxmc(
        jax.random.PRNGKey(0), "8_12", 1, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    assert S[3] < 1e-6 and S[[0, 2]].max() < 1e-6
    assert S[1] > 0.2
    # outer ring (mu < 0.5): cannot geometrically reach the bottom of a
    # unit-aspect box (needs > sqrt(3) horizontal travel per unit height)
    T, S = run_boxmc(
        jax.random.PRNGKey(1), "8_12", 3, False, 1e-8, 0.0, 0.0, 1.0, n_photons=8000
    )
    S = np.asarray(S)
    assert S[[0, 1, 2, 3]].max() < 1e-6
    assert S[[4, 5, 8, 9]].sum() > 0.99  # everything out the side dn bins
    # conservation with scattering
    T, S = run_boxmc(
        jax.random.PRNGKey(2), "8_12", 0, True, 1.0, 1.0, 0.3, 1.0, 0.0, 40.0,
        n_photons=20000,
    )
    total = float(np.asarray(T).sum() + np.asarray(S).sum())
    assert abs(total - 1.0) < 5e-3, total


def _tiny_3_24_lut():
    from tenstream_tpu.optprop.lut import LUTAxes, load_or_create_lut

    axes = LUTAxes(
        tau=np.array([1e-10, 1.0], np.float32),
        w0=np.array([0.0, 0.9], np.float32),
        aspect=np.array([0.5, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.array([0.0, 90.0], np.float32),
        theta=np.array([0.0, 40.0, 80.0], np.float32),
    )
    daxes = LUTAxes(axes.tau, axes.w0, axes.aspect, axes.g)
    return load_or_create_lut(
        "3_24", axes, daxes, n_photons=1000,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )


def test_3_24_solver_end_to_end():
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    lut = _tiny_3_24_lut()
    solver = PprtsSolver(Grid.create(4, 6, 6, 100.0, 100.0, 100.0), OptProp(lut))
    ka = np.full((4, 6, 6), 3e-4, np.float32)
    ks = np.full((4, 6, 6), 1e-3, np.float32)
    g = np.full((4, 6, 6), 0.4, np.float32)
    solver.set_optical_properties(0.3, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean() + (abso * 100.0).sum(0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.05, (balance, incoming)


def test_3_24_mirror_symmetry_exact():
    """x-mirroring the scene + negating the sun azimuth must mirror the
    fluxes to solver precision — exercises the quad-style switch_x
    destination permutation (symmetrized LUT makes this exact)."""
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    opp = OptProp(_tiny_3_24_lut())
    nz, nx, ny = 4, 8, 8
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 2e-4, np.float32)
    gg = np.full((nz, nx, ny), 0.3, np.float32)
    ks[1:3, 2:4, 3:6] += 0.01

    def run(kabs, ksca, g, phi):
        s = PprtsSolver(grid, opp)
        s.set_optical_properties(0.15, kabs, ksca, g)
        s.set_angles(sundir_from_angles(phi, 45.0))
        s.solve(lthermal=False, lsolar=True, edirTOA=500.0)
        return map(np.asarray, s.get_result())

    def mir(f):
        return np.flip(f, axis=1)

    edir_a, edn_a, eup_a, abso_a = run(ka, ks, gg, 35.0)
    edir_b, edn_b, eup_b, abso_b = run(mir(ka), mir(ks), mir(gg), -35.0)

    np.testing.assert_allclose(mir(edir_a), edir_b, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(mir(edn_a), edn_b, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(mir(eup_a), eup_b, rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(mir(abso_a), abso_b, rtol=1e-3, atol=1e-5)
