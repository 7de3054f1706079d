"""wedge_5_5 and wedge_18_8 BoxMC geometries.

Parity: reference `src/boxmc_wedge_5_5.inc` / `src/boxmc_wedge_18_8.inc`
(the remaining two of the reference's 13 stream geometries).

Pins: exact ballistic sub-face transport, area-averaged consistency of
the 18_8 sub-face groups with the 5_8 whole-face coefficients, 5_5
hemispheres as the up/dn merge of 5_8, and energy conservation.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tenstream_tpu.plexrt.wedge_boxmc import WEDGE_SCHEMES, run_wedge_boxmc  # noqa: E402


def test_18_8_ballistic_corner_transport():
    """Vertical sun, no scattering: a top corner-quad source maps 1:1
    onto the bottom corner directly below with exp(-tauz)."""
    for src, bot_dof in ((0, 15), (1, 16), (2, 17)):
        T, S = run_wedge_boxmc(
            jax.random.PRNGKey(src), src, True, 0.5, 0.0, 0.0, 1.0,
            0.0, 0.0, n_photons=8000, scheme="18_8",
        )
        T = np.asarray(T)
        np.testing.assert_allclose(T[bot_dof], np.exp(-0.5), atol=1e-3)
        assert T.sum() - T[bot_dof] < 1e-6
        assert np.asarray(S).sum() < 1e-6


def test_18_8_side_quads_ballistic():
    """Tilted non-scattering beam from one side sub-quad conserves
    energy: everything leaves as direct through some sub-face."""
    T, S = run_wedge_boxmc(
        jax.random.PRNGKey(5), 3, True, 1e-8, 0.0, 0.0, 1.0,
        35.0, 70.0, n_photons=8000, scheme="18_8",
    )
    total = float(np.asarray(T).sum() + np.asarray(S).sum())
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_18_8_groups_match_5_8_faces():
    """Averaging the three equal-area top sub-sources reproduces the
    5_8 whole-top-face coefficients; sub-face tallies group to faces."""
    args = (2.0, 0.7, 0.5, 1.0, 35.0, 40.0)
    Ts, Ss = [], []
    for s in range(3):
        T, S = run_wedge_boxmc(
            jax.random.PRNGKey(10 + s), s, True, *args,
            n_photons=30000, scheme="18_8",
        )
        Ts.append(np.asarray(T))
        Ss.append(np.asarray(S))
    T18, S18 = np.mean(Ts, 0), np.mean(Ss, 0)
    T5, S5 = run_wedge_boxmc(
        jax.random.PRNGKey(2), 0, True, *args, n_photons=60000, scheme="5_8"
    )
    T5, S5 = np.asarray(T5), np.asarray(S5)
    groups = np.array([
        T18[0:3].sum(), T18[3:7].sum(), T18[7:11].sum(),
        T18[11:15].sum(), T18[15:18].sum(),
    ])
    np.testing.assert_allclose(groups, T5, atol=0.01)
    np.testing.assert_allclose(S18, S5, atol=0.01)


def test_5_5_merges_5_8_hemispheres():
    """The 5_5 per-face diffuse coefficients equal the 5_8 ones with
    the side dn/up pairs summed (same hemisphere source)."""
    for src58, src55 in ((0, 0), (7, 4)):
        S58 = np.asarray(run_wedge_boxmc(
            jax.random.PRNGKey(src58), src58, False, 1.0, 0.8, 0.3, 1.0,
            n_photons=40000, scheme="5_8",
        )[1])
        S55 = np.asarray(run_wedge_boxmc(
            jax.random.PRNGKey(90 + src55), src55, False, 1.0, 0.8, 0.3, 1.0,
            n_photons=40000, scheme="5_5",
        )[1])
        merged = np.array([
            S58[0], S58[1] + S58[2], S58[3] + S58[4], S58[5] + S58[6], S58[7],
        ])
        np.testing.assert_allclose(S55, merged, atol=0.01)


def test_energy_conservation_all_schemes():
    """Conservative scattering: T + S == 1 for every scheme/source."""
    for scheme, (ndir, ndiff) in WEDGE_SCHEMES.items():
        for src in (0, ndir - 1):
            T, S = run_wedge_boxmc(
                jax.random.PRNGKey(src), src, True, 3.0, 1.0, 0.6, 1.0,
                20.0, 50.0, n_photons=6000, scheme=scheme,
            )
            total = float(np.asarray(T).sum() + np.asarray(S).sum())
            np.testing.assert_allclose(total, 1.0, atol=2e-3)
            assert np.asarray(T).shape == (ndir,)
            assert np.asarray(S).shape == (ndiff,)


# ----------------------------------------------------------------------
# 18_8 end-to-end: the structured wedge solver running on 18_8 tables
# (reference `t_plex_solver_18_8`, `plexrt/plex_rt_base.F90:28-75`).

import os  # noqa: E402

_LUTDIR = os.path.join(os.path.dirname(__file__), "data", "luts")


@pytest.fixture(scope="module")
def opp18():
    from tenstream_tpu.plexrt.optprop import (
        WedgeAxes, WedgeOptProp, load_or_create_wedge_lut,
    )

    axes = WedgeAxes(
        tau=np.array([1e-10, 0.5, 2.0, 8.0], np.float32),
        w0=np.array([0.0, 0.7, 0.99999], np.float32),
        aspect=np.array([0.5, 1.0, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.linspace(0.0, 360.0, 5).astype(np.float32),
        theta=np.array([0.0, 40.0, 75.0], np.float32),
    )
    return WedgeOptProp(load_or_create_wedge_lut(
        axes, n_photons=1000, scheme="18_8", basename=_LUTDIR))


def _sundir(phi_deg, theta_deg):
    p, t = np.deg2rad(phi_deg), np.deg2rad(theta_deg)
    return np.array([np.sin(p) * np.sin(t), np.cos(p) * np.sin(t), -np.cos(t)])


def test_18_8_solver_transparent_exact(opp18):
    """Transparent medium: per-corner direct streams recombine to the
    exact beam at every level (also validates the corner-to-corner
    layer coupling and the u-flip side-quad exchange)."""
    from tenstream_tpu.plexrt.mesh import fish_mesh
    from tenstream_tpu.plexrt.solver import PlexrtSolver

    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp18)
    assert s.scheme == "18_8"
    z = np.full((5, 2, 6, 6), 1e-10, np.float32)
    s.set_optical_properties(0.3, z, z, np.zeros_like(z))
    s.set_angles(_sundir(30.0, 40.0))
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    mu = np.cos(np.deg2rad(40.0))
    np.testing.assert_allclose(edir[-1].mean(), 1000.0 * mu, rtol=1e-3)
    np.testing.assert_allclose(eup[0].mean(), 300.0 * mu, rtol=3e-2)
    assert np.abs(abso).max() < 1e-3


def test_18_8_solver_energy_balance(opp18):
    from tenstream_tpu.plexrt.mesh import fish_mesh
    from tenstream_tpu.plexrt.solver import PlexrtSolver

    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp18)
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


def test_18_8_solver_thermal_isothermal(opp18):
    from tenstream_tpu.plexrt.mesh import fish_mesh
    from tenstream_tpu.plexrt.solver import PlexrtSolver

    g = fish_mesh(5, 6, 6, 100.0, 100.0, 100.0)
    s = PlexrtSolver(g, opp18)
    ka = np.full((5, 2, 6, 6), 5e-3, np.float32)
    pl = np.full((6, 2, 6, 6), 3.0, np.float32)
    s.set_optical_properties(0.0, ka, np.zeros_like(ka), np.zeros_like(ka),
                             planck=pl)
    s.set_angles(_sundir(0.0, 40.0))
    sol = s.solve(lthermal=True, lsolar=False)
    _, edn, eup, abso = map(np.asarray, s.get_result(sol))
    np.testing.assert_allclose(eup[0].mean(), np.pi * 3.0, rtol=0.05)
    assert abs(edn[0]).max() < 1e-4
    # near radiative equilibrium in the interior (bound scales with the
    # 1000-photon fixture LUT's MC noise on the emissivity rows)
    assert np.abs(abso[-1]).max() * 100.0 < 0.35


def test_shape_exact_tracer_and_mesh_apex():
    """The generalized (apex) wedge tracer + shape-aware table helper:
    (a) apex=(1,1) reproduces the canonical tracer bit-for-bit,
    (b) the equilateral cell conserves energy and has exact 3-fold
        side symmetry for the top diffuse source,
    (c) `wedge_lut_for_mesh` detects the equilateral mesh's shape."""
    import jax
    import numpy as np

    from tenstream_tpu.plexrt.icon import trimesh_equilateral
    from tenstream_tpu.plexrt.wedge_boxmc import run_wedge_boxmc

    key = jax.random.PRNGKey(7)
    T0, S0 = run_wedge_boxmc(key, 0, False, 1.5, 1.0, 0.5, 1.0, n_photons=20000)
    T1, S1 = run_wedge_boxmc(key, 0, False, 1.5, 1.0, 0.5, 1.0, n_photons=20000,
                             apex=(1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(S0), np.asarray(S1))

    # equilateral, conservative scattering: sum(S) == 1 and the three
    # sides are statistically identical for the symmetric top source
    eq = (0.5, float(np.sqrt(3) / 2))
    _, S = run_wedge_boxmc(key, 0, False, 1.5, 1.0, 0.5, 1.0,
                           n_photons=60000, apex=eq)
    S = np.asarray(S)
    assert abs(S.sum() - 1.0) < 5e-3
    sides_dn = S[[1, 3, 5]]
    sides_up = S[[2, 4, 6]]
    assert sides_dn.std() < 0.01 and sides_up.std() < 0.01, (sides_dn, sides_up)

    mesh = trimesh_equilateral(3, 3, 100.0)
    v = mesh.verts[mesh.tris]
    ab = v[:, 1] - v[:, 0]
    ac = v[:, 2] - v[:, 0]
    L = np.linalg.norm(ab, axis=-1)
    abh = ab / L[:, None]
    cx = (ac * abh).sum(-1) / L
    cy = np.abs(ac[:, 1] * abh[:, 0] - ac[:, 0] * abh[:, 1]) / L
    np.testing.assert_allclose(cx, 0.5, atol=1e-6)
    np.testing.assert_allclose(cy, np.sqrt(3) / 2, atol=1e-6)
