"""ND interpolation tests (parity: reference `tests/interpolation/`)."""

import numpy as np
from scipy.interpolate import RegularGridInterpolator

from tenstream_tpu.ops.interp import fractional_index, interp_multilinear


def test_fractional_index():
    grid = np.array([0.0, 1.0, 3.0, 7.0], np.float32)
    f = np.asarray(fractional_index(grid, np.array([0.0, 0.5, 2.0, 7.0, 10.0, -1.0], np.float32)))
    np.testing.assert_allclose(f, [0.0, 0.5, 1.5, 3.0, 3.0, 0.0], atol=1e-6)


def test_multilinear_vs_scipy(rng):
    grids = [np.sort(rng.uniform(0, 1, n)).astype(np.float32) for n in (5, 4, 6, 3)]
    table = rng.normal(size=(5, 4, 6, 3, 7)).astype(np.float32)
    ref = RegularGridInterpolator(grids, table)

    q = np.stack([rng.uniform(g[0], g[-1], 50).astype(np.float32) for g in grids], -1)
    fracs = [fractional_index(g, q[:, d]) for d, g in enumerate(grids)]
    out = np.asarray(interp_multilinear(table, fracs))
    np.testing.assert_allclose(out, ref(q), rtol=2e-4, atol=2e-4)


def test_exact_at_grid_points(rng):
    grids = [np.array([0.0, 1.0, 2.0], np.float32)] * 2
    table = rng.normal(size=(3, 3, 2)).astype(np.float32)
    fr = [fractional_index(grids[0], np.array([1.0], np.float32))] * 2
    out = np.asarray(interp_multilinear(table, fr))
    np.testing.assert_allclose(out[0], table[1, 1], atol=1e-6)
