"""ANN optprop backend tests (reference `test_ANN_3_10`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ann(opp_small):
    from tenstream_tpu.optprop.ann import AnnOptProp

    return AnnOptProp(opp_small.lut, epochs=600, seed=1)


def test_ann_matches_lut(ann, opp_small):
    rng = np.random.default_rng(0)
    n = 200
    tau = 10 ** rng.uniform(-4, 1, n).astype(np.float32)
    w0 = rng.uniform(0, 0.99, n).astype(np.float32)
    g = rng.uniform(0, 0.5, n).astype(np.float32)
    asp = rng.uniform(0.15, 1.8, n).astype(np.float32)
    c_lut = np.asarray(opp_small.diff_coeffs(tau, w0, g, asp))
    c_ann = np.asarray(ann.diff_coeffs(tau, w0, g, asp))
    err = np.abs(c_lut - c_ann).mean()
    assert err < 0.02, err  # mean absolute coefficient error


def test_solver_runs_with_ann(ann):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 5, 6, 6
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), ann)
    ka = np.full((nz, nx, ny), 2e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.2, ka, ks, g)
    solver.set_angles(sundir_from_angles(20.0, 30.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    assert np.isfinite(edir).all() and np.isfinite(abso).all()
    assert edir[0].mean() > edir[-1].mean() > 0


def test_ann_octant_perms_match_facade(ann, opp_small):
    """Sun-octant unfolding must permute exactly like OptProp.dir_coeffs
    (p on both dir dims, p/q on dir2diff src/dst) — the direct backbone
    is closed-form so any c_dd octant error is a pure permutation bug."""
    n = 32
    rng = np.random.default_rng(3)
    tau = 10 ** rng.uniform(-3, 0.5, n).astype(np.float32)
    w0 = rng.uniform(0, 0.9, n).astype(np.float32)
    g = rng.uniform(0, 0.5, n).astype(np.float32)
    asp = rng.uniform(0.2, 1.5, n).astype(np.float32)
    for sx, sy in ((True, False), (False, True), (True, True)):
        dd_a, df_a = map(np.asarray, ann.dir_coeffs(tau, w0, g, asp, 30.0, 40.0,
                                                    switch_x=sx, switch_y=sy))
        dd0, df0 = map(np.asarray, ann.dir_coeffs(tau, w0, g, asp, 30.0, 40.0))
        q = np.asarray(ann.scheme.diff_switch_perm(sx, sy))
        p = np.asarray(ann.scheme.dir_switch_perm(sx, sy))
        np.testing.assert_allclose(dd_a, dd0[p][:, p], atol=1e-6)
        np.testing.assert_allclose(df_a, df0[p][:, q], atol=1e-6)
    # and the facade agrees structurally (closed-form dir2dir identical)
    dd_lut, _ = map(np.asarray, opp_small.dir_coeffs(tau, w0, g, asp, 30.0, 40.0,
                                                     switch_x=True))
    dd_ann, _ = map(np.asarray, ann.dir_coeffs(tau, w0, g, asp, 30.0, 40.0,
                                               switch_x=True))
    np.testing.assert_allclose(dd_ann, dd_lut, atol=5e-3)


def test_production_ann_committed():
    """The committed production net must reproduce the production LUT
    (reference ships trained 3_10 nets for `-pprts_use_ANN`)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "data", "ann",
                        "ANN_3_10_production.npz")
    lut_path = os.path.join(os.path.dirname(__file__), "..", "data", "luts",
                            "LUT_3_10_production.npz")
    if not (os.path.exists(path) and os.path.exists(lut_path)):
        pytest.skip("production ANN/LUT not committed")
    from tenstream_tpu.optprop.ann import AnnOptProp
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import LUT

    ann = AnnOptProp.load(path)
    opp = OptProp(LUT.load(lut_path))
    rng = np.random.default_rng(11)
    n = 512
    fa = opp.lut.diff_axes
    tau = np.exp(rng.uniform(np.log(fa.tau[0] + 1e-12), np.log(fa.tau[-1]), n)).astype(np.float32)
    w0 = rng.uniform(fa.w0[0], fa.w0[-1], n).astype(np.float32)
    asp = np.exp(rng.uniform(np.log(fa.aspect[0]), np.log(fa.aspect[-1]), n)).astype(np.float32)
    g = rng.uniform(fa.g[0], fa.g[-1], n).astype(np.float32)
    c_lut = np.asarray(opp.diff_coeffs(tau, w0, g, asp))
    c_ann = np.asarray(ann.diff_coeffs(tau, w0, g, asp))
    err = np.abs(c_lut - c_ann)
    assert err.mean() < 0.01, err.mean()

    t_lut, s_lut = map(np.asarray, opp.dir_coeffs(tau, w0, g, asp, 25.0, 45.0))
    t_ann, s_ann = map(np.asarray, ann.dir_coeffs(tau, w0, g, asp, 25.0, 45.0))
    np.testing.assert_allclose(t_ann, t_lut, atol=1e-5)  # both closed-form
    assert np.abs(s_lut - s_ann).mean() < 0.01
