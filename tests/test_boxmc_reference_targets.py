"""BoxMC coefficients vs the REFERENCE'S OWN hardcoded test targets.

Ported from `tests/test_boxmc_3_10/test_boxmc_3_10.F90` (geometry
dx=dy=100, dz=50; sources/destinations in the same dof order).  The
analytic targets (Beer-Lambert, slab integrals) are exact; the MC
constants (0.390156 etc.) are the reference's converged values, so
agreement here is direct tracer-level parity.
"""

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc

ASPECT = 0.5  # dz/dx = 50/100
NPHOT = 60000
ATOL = 6e-3  # MC noise at NPHOT + the reference's own tolerance


def _run(src, ldir, kabs, ksca, g, phi=0.0, theta=0.0, seed=0):
    tauz = (kabs + ksca) * 50.0
    w0 = ksca / max(kabs + ksca, 1e-30)
    T, S = run_boxmc(
        jax.random.PRNGKey(seed), "3_10", src, ldir, tauz, w0, g, ASPECT,
        phi, theta, n_photons=NPHOT,
    )
    return np.asarray(T), np.asarray(S)


def test_direct_srctopface():
    """Vertical beam through an absorbing layer: T(1) = exp(-tau)
    (`test_boxmc_3_10.F90:58-80`)."""
    T, S = _run(0, True, 1e-3, 0.0, 0.5)
    tau = 1e-3 * 50
    np.testing.assert_allclose(T[0], np.exp(-tau), atol=ATOL)
    np.testing.assert_allclose(T[1:], 0.0, atol=ATOL)
    np.testing.assert_allclose(S, 0.0, atol=ATOL)


def test_direct_srctopface_45():
    """45-degree beam: half exits the bottom, the slant remainder exits
    the side, both Beer-Lambert (`:83-105`)."""
    T, S = _run(0, True, 1e-3, 0.0, 0.5, phi=0.0, theta=45.0)
    tau = 1e-3 * 50 * np.sqrt(2.0)
    np.testing.assert_allclose(T[0], np.exp(-tau) / 2, atol=ATOL)
    np.testing.assert_allclose(T[2], (1 - np.exp(-tau)) / (2 * tau), atol=ATOL)
    np.testing.assert_allclose(S, 0.0, atol=ATOL)


def test_direct_srcsidefaces_vertical_sun():
    """Side sources under a vertical sun: the slab-integral
    T(1) = (sinh(tau) - cosh(tau) + 1)/tau for every azimuth
    (`:110-135`)."""
    tau = 1e-3 * 50
    tgt = (np.sinh(tau) - np.cosh(tau) + 1) / tau
    for src in (1, 2):
        for phi in (0.0, 90.0, 210.0):
            T, S = _run(src, True, 1e-3, 0.0, 0.5, phi=phi, theta=0.0,
                        seed=int(phi) + src)
            np.testing.assert_allclose(T[0], tgt, atol=ATOL)
            np.testing.assert_allclose(S, 0.0, atol=ATOL)


def test_diff_srctopface():
    """Diffuse top-face source, absorbing only: the reference's
    converged MC split (`:138-157`)."""
    T, S = _run(1, False, 1e-3, 0.0, 0.0)
    target = np.array([0.0, 0.390156, 0.1404375, 0.1404375, 0.0, 0.0,
                       0.1404375, 0.1404375, 0.0, 0.0])
    np.testing.assert_allclose(S, target, atol=ATOL)


def test_diff_srcbottomface():
    T, S = _run(0, False, 1e-3, 0.0, 0.0)
    target = np.array([0.390156, 0.0, 0.0, 0.0, 0.1404375, 0.1404375,
                       0.0, 0.0, 0.1404375, 0.1404375])
    np.testing.assert_allclose(S, target, atol=ATOL)


@pytest.mark.parametrize("src,target", [
    # reference srcs 3..10 (0-based 2..9) with constants
    # top=0.56173, a=0.104806, b=0.1424402 (`:184-237`)
    (2, [0.0, 1, 2, 0.0, 0.0, 0.0, 3, 3, 0.0, 0.0]),
    (3, [0.0, 1, 0.0, 2, 0.0, 0.0, 3, 3, 0.0, 0.0]),
    (4, [1, 0.0, 0.0, 0.0, 2, 0.0, 0.0, 0.0, 3, 3]),
    (5, [1, 0.0, 0.0, 0.0, 0.0, 2, 0.0, 0.0, 3, 3]),
    (6, [0.0, 1, 3, 3, 0.0, 0.0, 2, 0.0, 0.0, 0.0]),
    (7, [0.0, 1, 3, 3, 0.0, 0.0, 0.0, 2, 0.0, 0.0]),
    (8, [1, 0.0, 0.0, 0.0, 3, 3, 0.0, 0.0, 2, 0.0]),
    (9, [1, 0.0, 0.0, 0.0, 3, 3, 0.0, 0.0, 0.0, 2]),
])
def test_diff_srcsidefaces(src, target):
    top, a, b = 0.56173, 0.104806, 0.1424402
    vals = {0: 0.0, 1: top, 2: a, 3: b}
    tgt = np.array([vals[t] for t in target])
    T, S = _run(src, False, 1e-3, 0.0, 0.0, seed=src)
    np.testing.assert_allclose(S, tgt, atol=ATOL)
