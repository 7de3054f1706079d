"""Eddington coefficient sanity tests.

Parity: reference `tests/eddington/test_eddington.F90` checks energy
conservation and limiting behavior of the coefficient sets.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tenstream_tpu.ops.eddington import eddington_coeff_ec, eddington_coeff_zdun


@pytest.mark.parametrize("coeff_fn", [eddington_coeff_ec, eddington_coeff_zdun])
def test_energy_conservation(coeff_fn, rng):
    n = 256
    dtau = 10.0 ** rng.uniform(-6, 2, n)
    w0 = rng.uniform(0.0, 1.0, n)
    g = rng.uniform(0.0, 0.85, n)
    mu0 = rng.uniform(0.05, 1.0, n)

    a11, a12, a13, a23, a33 = coeff_fn(dtau, w0, g, mu0)
    for a in (a11, a12, a33):
        assert np.all(np.asarray(a) >= 0.0)
        assert np.all(np.asarray(a) <= 1.0 + 1e-5)
    # diffuse energy conservation: transmission + reflection <= 1
    assert np.all(np.asarray(a11 + a12) <= 1.0 + 1e-4)
    # direct energy conservation: tdir + rdir + sdir <= 1 (+tolerance)
    total = np.asarray(a33 + a13 + a23)
    assert np.all(total <= 1.0 + 5e-3), total.max()


def test_thin_limit():
    a11, a12, a13, a23, a33 = eddington_coeff_ec(1e-8, 0.5, 0.5, 1.0)
    assert np.isclose(float(a11), 1.0, atol=1e-5)
    assert np.isclose(float(a12), 0.0, atol=1e-5)
    assert np.isclose(float(a33), 1.0, atol=1e-5)


def test_thick_limit():
    a11, a12, a13, a23, a33 = eddington_coeff_ec(100.0, 0.0, 0.0, 1.0)
    assert float(a33) < 1e-20
    assert float(a11) < 1e-6
    # pure absorption: no reflection
    assert float(a12) < 1e-6


def test_conservative_scattering_thick():
    # w0 = 1, thick: everything must come back out (T + R ~ 1)
    a11, a12, _, _, _ = eddington_coeff_ec(50.0, 1.0 - 1e-7, 0.0, 1.0)
    assert np.isclose(float(a11 + a12), 1.0, atol=1e-3)


def test_vectorized_shapes():
    dtau = jnp.ones((4, 5, 6))
    out = eddington_coeff_ec(dtau, 0.5, 0.3, 0.7)
    for a in out:
        assert a.shape == (4, 5, 6)
