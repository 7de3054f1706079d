"""LUT generation + facade tests.

Parity: reference `tests/test_LUT_3_10/` checks LUT interpolation vs
direct BoxMC and energy conservation of interpolated coefficients
(`src/optprop_LUT.F90:1489-1504`).
"""

import jax
import numpy as np
import pytest

from tenstream_tpu.boxmc import run_boxmc
from tenstream_tpu.optprop.facade import OptProp, check_energy_conservation
from tenstream_tpu.optprop.lut import LUT, LUTAxes, create_lut


@pytest.fixture(scope="module")
def tiny_lut():
    dir_axes = LUTAxes(
        tau=np.array([1e-10, 0.5, 5.0], np.float32),
        w0=np.array([0.0, 0.9], np.float32),
        aspect=np.array([0.5, 1.0, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.array([0.0, 45.0, 90.0], np.float32),
        theta=np.array([0.0, 40.0, 80.0], np.float32),
    )
    diff_axes = LUTAxes(
        tau=dir_axes.tau, w0=dir_axes.w0, aspect=dir_axes.aspect, g=dir_axes.g
    )
    return create_lut("3_10", dir_axes, diff_axes, n_photons=2000)


def test_lut_energy_conservation(tiny_lut):
    # each (entry, src) row: T + S must sum to <= 1
    tot = tiny_lut.dir2dir.sum(-1) + tiny_lut.dir2diff.sum(-1)
    assert tot.max() <= 1.0 + 1e-4
    assert tiny_lut.diff2diff.sum(-1).max() <= 1.0 + 1e-4
    # conservative-scattering entries (w0 index 1 is not 1.0 here, so just
    # check transparent entries transmit everything: tau=1e-10)
    thin_dir = tiny_lut.dir2dir[0].sum(-1) + tiny_lut.dir2diff[0].sum(-1)
    np.testing.assert_allclose(thin_dir, 1.0, atol=1e-3)


def test_facade_interpolation_matches_boxmc(tiny_lut):
    opp = OptProp(tiny_lut)
    # query at an exact grid point: must match a fresh BoxMC run within MC noise
    tauz, w0, g, aspect = 0.5, 0.9, 0.5, 1.0
    phi, theta = 45.0, 40.0
    c_dd, c_df = opp.dir_coeffs(
        np.float32(tauz), np.float32(w0), np.float32(g), np.float32(aspect), phi, theta
    )
    T, S = run_boxmc(
        jax.random.PRNGKey(99), "3_10", 0, True, tauz, w0, g, aspect, phi, theta,
        n_photons=20000,
    )
    np.testing.assert_allclose(np.asarray(c_dd)[0], np.asarray(T), atol=0.03)
    np.testing.assert_allclose(np.asarray(c_df)[0], np.asarray(S), atol=0.03)


def test_facade_batched_grid(tiny_lut):
    opp = OptProp(tiny_lut)
    shape = (4, 3, 2)
    rng = np.random.default_rng(1)
    tauz = rng.uniform(0.01, 4.0, shape).astype(np.float32)
    w0 = rng.uniform(0, 0.9, shape).astype(np.float32)
    g = rng.uniform(0, 0.5, shape).astype(np.float32)
    c = opp.diff_coeffs(tauz, w0, g, np.float32(1.0))
    assert c.shape == (10, 10) + shape  # streams lead (facade convention)
    c_last = np.moveaxis(np.asarray(c), (0, 1), (-2, -1))
    assert float(check_energy_conservation(c_last)) < 5e-3


def test_symmetry_unfolding(tiny_lut):
    opp = OptProp(tiny_lut)
    c_dd, c_df = opp.dir_coeffs(0.5, 0.9, 0.0, 1.0, 45.0, 40.0)
    c_dd_x, c_df_x = opp.dir_coeffs(0.5, 0.9, 0.0, 1.0, 45.0, 40.0, switch_x=True)
    # dir2dir unchanged for 3-direct schemes
    np.testing.assert_allclose(np.asarray(c_dd), np.asarray(c_dd_x))
    # x-side destination pairs swapped (dofs 2<->3, 4<->5)
    c_df, c_df_x = np.asarray(c_df), np.asarray(c_df_x)
    np.testing.assert_allclose(c_df[..., [2, 3, 4, 5]], c_df_x[..., [3, 2, 5, 4]])
    np.testing.assert_allclose(c_df[..., [0, 1, 6, 7, 8, 9]], c_df_x[..., [0, 1, 6, 7, 8, 9]])


def test_lut_save_load(tmp_path, tiny_lut):
    p = str(tmp_path / "lut.npz")
    tiny_lut.save(p)
    back = LUT.load(p)
    np.testing.assert_array_equal(back.dir2dir, tiny_lut.dir2dir)
    np.testing.assert_array_equal(back.diff2diff, tiny_lut.diff2diff)


def test_facade_simplex_mode(tiny_lut):
    # simplex mode: exact at LUT grid points (same gathers land on the
    # grid vertex) and close to multilinear in between.
    ml = OptProp(tiny_lut, interp_mode="multilinear")
    sx = OptProp(tiny_lut, interp_mode="simplex")
    # exact grid point
    args = (np.float32(0.5), np.float32(0.9), np.float32(0.5), np.float32(1.0), 45.0, 40.0)
    for a, b in zip(ml.dir_coeffs(*args), sx.dir_coeffs(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    d_ml = ml.diff_coeffs(np.float32(0.5), np.float32(0.9), np.float32(1.0), np.float32(0.5))
    d_sx = sx.diff_coeffs(np.float32(0.5), np.float32(0.9), np.float32(1.0), np.float32(0.5))
    np.testing.assert_allclose(np.asarray(d_ml), np.asarray(d_sx), atol=1e-5)
    # off-grid: O(cell curvature) agreement, and convex-combination bounds
    args2 = (np.float32(0.9), np.float32(0.4), np.float32(0.2), np.float32(1.3), 20.0, 30.0)
    c_dd, c_df = sx.dir_coeffs(*args2)
    m_dd, m_df = ml.dir_coeffs(*args2)
    assert np.asarray(c_dd).min() >= -1e-5 and np.asarray(c_dd).max() <= 1 + 1e-5
    np.testing.assert_allclose(np.asarray(c_df), np.asarray(m_df), atol=0.1)


def test_diff_orbit_compression_exact(tiny_lut):
    """The orbit-compressed diffuse gather (12 channels for 3_10 instead
    of ndiff^2=100) must reproduce the full-channel interpolation exactly
    for symmetrized tables (the 8.3x assembly-gather-traffic cut must be
    a pure layout change, never a physics change)."""
    opp = OptProp(tiny_lut)
    assert opp._diff_orbit_idx is not None, "symmetrized LUT should enable the orbit path"
    assert opp._diff2diff_orb.shape[-1] == 12  # 3_10 pair orbits under the order-16 group

    rng = np.random.default_rng(3)
    B = (4, 6)
    tauz = (10 ** rng.uniform(-4, 1, B)).astype(np.float32)
    w0 = rng.uniform(0, 0.9, B).astype(np.float32)
    g = rng.uniform(0, 0.5, B).astype(np.float32)
    asp = rng.uniform(0.5, 2.0, B).astype(np.float32)
    c_orb = np.asarray(opp.diff_coeffs(tauz, w0, g, asp))
    opp._diff_orbit_idx = None  # force the full-channel path
    c_full = np.asarray(opp.diff_coeffs(tauz, w0, g, asp))
    np.testing.assert_allclose(c_orb, c_full, atol=5e-6)

    # an unsymmetrized table must fail the init gate and stay on the full path
    lut2 = LUT(
        tiny_lut.scheme, tiny_lut.dir_axes, tiny_lut.diff_axes,
        tiny_lut.dir2dir, tiny_lut.dir2diff,
        tiny_lut.diff2diff + rng.uniform(0, 1e-3, tiny_lut.diff2diff.shape).astype(np.float32),
    )
    assert OptProp(lut2)._diff_orbit_idx is None
