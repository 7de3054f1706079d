"""Pallas BoxMC kernel equivalence tests (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc


def _run_pallas_interp(params, src, ldir, max_iter=2000):
    from jax.experimental.pallas import tpu as pltpu

    from tenstream_tpu.boxmc.pallas_tracer import run_boxmc_pallas

    with pltpu.force_tpu_interpret_mode():
        return run_boxmc_pallas(
            jax.numpy.asarray(params, jax.numpy.float32), "3_10", src, ldir,
            max_iter=max_iter, seed=3,
        )


@pytest.mark.parametrize(
    "entry",
    [
        (1.3, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
        (2.0, 0.9, 1.0, 0.5, 30.0, 40.0, 0.0, 0.0),
        (0.5, 0.99, 0.5, 0.85, 60.0, 70.0, 0.0, 0.0),
    ],
)
def test_pallas_matches_jnp_direct(entry):
    params = np.asarray([entry], np.float32)
    T_p, S_p = _run_pallas_interp(params, 0, True)
    T_p, S_p = np.asarray(T_p)[0], np.asarray(S_p)[0]

    tauz, w0, aspect, g, phi, theta = entry[:6]
    T_j, S_j = run_boxmc(
        jax.random.PRNGKey(5), "3_10", 0, True, tauz, w0, g, aspect, phi, theta,
        n_photons=20000,
    )
    T_j, S_j = np.asarray(T_j), np.asarray(S_j)
    np.testing.assert_allclose(T_p, T_j, atol=0.02)
    np.testing.assert_allclose(S_p, S_j, atol=0.02)
    # energy conservation
    total = T_p.sum() + S_p.sum()
    assert total <= 1.0 + 1e-4


def test_pallas_matches_jnp_diffuse():
    params = np.asarray([[1.0, 0.8, 1.0, 0.3, 0.0, 0.0, 0.0, 0.0]], np.float32)
    T_p, S_p = _run_pallas_interp(params, 1, False)
    S_p = np.asarray(S_p)[0]
    T_j, S_j = run_boxmc(
        jax.random.PRNGKey(6), "3_10", 1, False, 1.0, 0.8, 0.3, 1.0, n_photons=20000
    )
    np.testing.assert_allclose(S_p, np.asarray(S_j), atol=0.02)
