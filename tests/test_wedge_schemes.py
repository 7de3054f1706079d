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
