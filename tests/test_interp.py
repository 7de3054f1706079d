"""ND interpolation tests (parity: reference `tests/interpolation/`)."""

import numpy as np
from scipy.interpolate import RegularGridInterpolator

from tenstream_tpu.ops.interp import (
    fractional_index,
    interp_multilinear,
    interp_multilinear_cf,
    interp_simplex_cf,
)


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


def test_simplex_exact_at_grid_points(rng):
    grids = [np.arange(n, dtype=np.float32) for n in (4, 3, 5, 3)]
    table = rng.normal(size=(4, 3, 5, 3, 6)).astype(np.float32)
    pts = np.array([[0, 0, 0, 0], [3, 2, 4, 2], [1, 2, 3, 1], [2, 0, 2, 2]], np.float32)
    fr = [pts[:, d] for d in range(4)]
    out = np.asarray(interp_simplex_cf(table, fr))  # (6, 4)
    for q in range(pts.shape[0]):
        i = tuple(int(v) for v in pts[q])
        np.testing.assert_allclose(out[:, q], table[i], atol=1e-6)


def test_simplex_exact_on_affine(rng):
    # Simplex interpolation reproduces affine functions exactly inside
    # every cell (each simplex vertex-weight set is barycentric).
    dims = (5, 4, 6, 3)
    coef = rng.normal(size=4).astype(np.float64)
    idx = np.meshgrid(*[np.arange(n) for n in dims], indexing="ij")
    tbl = sum(c * g for c, g in zip(coef, idx)) + 0.7
    table = tbl[..., None].astype(np.float32)
    q = np.stack([rng.uniform(0, n - 1, 200) for n in dims], -1).astype(np.float32)
    fr = [q[:, d] for d in range(4)]
    out = np.asarray(interp_simplex_cf(table, fr))[0]
    expect = q.astype(np.float64) @ coef + 0.7
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_simplex_matches_multilinear_on_edges(rng):
    # Along a cell edge only one frac is non-integer: both schemes are
    # 1-D linear there.
    table = rng.normal(size=(4, 3, 5, 2)).astype(np.float32)
    base = np.array([1, 1, 2], np.float32)
    for d in range(3):
        q = np.tile(base, (7, 1))
        q[:, d] = np.linspace(0.0, 0.95, 7) + base[d] - 1
        fr = [q[:, j] for j in range(3)]
        ml = np.asarray(interp_multilinear_cf(table, fr))
        sx = np.asarray(interp_simplex_cf(table, fr))
        np.testing.assert_allclose(sx, ml, atol=1e-5)


def test_simplex_convex_weights(rng):
    # Interpolated value of a table bounded in [0,1] stays in [0,1]:
    # weights are a convex combination.
    table = rng.uniform(0, 1, size=(5, 4, 6, 3, 8)).astype(np.float32)
    q = np.stack([rng.uniform(0, n - 1, 300) for n in (5, 4, 6, 3)], -1).astype(np.float32)
    fr = [q[:, d] for d in range(4)]
    out = np.asarray(interp_simplex_cf(table, fr))
    assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5


def test_loop_gathers_matches_unrolled(rng):
    table = rng.normal(size=(5, 4, 6, 3, 7)).astype(np.float32)
    q = np.stack([rng.uniform(0, n - 1, 40) for n in (5, 4, 6, 3)], -1).astype(np.float32)
    fr = [q[:, d] for d in range(4)]
    for fn in (interp_multilinear_cf, interp_simplex_cf):
        a = np.asarray(fn(table, fr))
        b = np.asarray(fn(table, fr, loop_gathers=True))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_onehot_layered_matches_multilinear(rng):
    """The one-hot MXU path is the same multilinear math as the corner
    gathers when aspect is per-layer constant."""
    from tenstream_tpu.ops.interp import interp_4d_layered_onehot_cf

    n0, n1, n2, n3, C = 9, 7, 6, 4, 5
    nz, nx, ny = 5, 4, 3
    table = rng.normal(size=(n0, n1, n2, n3, C)).astype(np.float32)
    f0 = rng.uniform(0, n0 - 1, (nz, nx, ny)).astype(np.float32)
    f1 = rng.uniform(0, n1 - 1, (nz, nx, ny)).astype(np.float32)
    f2l = rng.uniform(0, n2 - 1, (nz,)).astype(np.float32)
    f3 = rng.uniform(0, n3 - 1, (nz, nx, ny)).astype(np.float32)

    got = np.asarray(interp_4d_layered_onehot_cf(table, f0, f1, f2l, f3))
    ref = np.asarray(
        interp_multilinear_cf(
            table, (f0, f1, np.broadcast_to(f2l[:, None, None], f0.shape), f3)
        )
    )
    assert got.shape == (C, nz, nx, ny)
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)


def test_onehot_layered_exact_at_grid_points(rng):
    from tenstream_tpu.ops.interp import interp_4d_layered_onehot_cf

    n0, n1, n2, n3 = 6, 5, 4, 3
    table = rng.normal(size=(n0, n1, n2, n3, 2)).astype(np.float32)
    nz, nx, ny = 4, 3, 2
    i0 = rng.integers(0, n0, (nz, nx, ny)).astype(np.float32)
    i1 = rng.integers(0, n1, (nz, nx, ny)).astype(np.float32)
    i2 = rng.integers(0, n2, (nz,)).astype(np.float32)
    i3 = rng.integers(0, n3, (nz, nx, ny)).astype(np.float32)
    got = np.asarray(interp_4d_layered_onehot_cf(table, i0, i1, i2, i3))
    for z in range(nz):
        for x in range(nx):
            for y in range(ny):
                want = table[int(i0[z, x, y]), int(i1[z, x, y]),
                             int(i2[z]), int(i3[z, x, y])]
                np.testing.assert_allclose(got[:, z, x, y], want, atol=1e-6)
