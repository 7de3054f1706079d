"""Auxiliary subsystem tests: 1-D solver dispatch, adaptive re-solve
skipping, postprocess smoothing/slope correction.

Parity: reference `tests/pprts_error_growth_tracking/`,
`test_pprts_slope_correction`, `test_convolution`.
"""

import numpy as np
import pytest

from tenstream_tpu.core.config import Options
from tenstream_tpu.pprts.adaptive import SolutionErrorTracker, abso_change_maxnorm
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.postprocess import convolve_srfc_5pt, slope_correction_srfc_edir
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def test_2str_solver_class():
    nz, nx, ny = 12, 4, 4
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), solver_type="2str")
    ka = np.full((nz, nx, ny), 2e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    planck = np.full((nz + 1, nx, ny), 3.0, np.float32)
    solver.set_optical_properties(0.2, ka, ks, g, planck=planck)
    solver.set_angles(sundir_from_angles(0.0, 30.0))
    solver.solve(lthermal=True, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    mu = np.cos(np.deg2rad(30.0))
    np.testing.assert_allclose(edir[0], 1000.0 * mu, rtol=1e-5)
    assert (edir[1:] < edir[:-1]).all()
    assert np.isfinite(abso).all()
    # schwarzschild thermal variant
    s2 = PprtsSolver(
        Grid.create(nz, nx, ny, 100.0, 100.0, 100.0),
        options=Options({"schwarzschild": True}),
        solver_type="2str",
    )
    s2.set_optical_properties(0.0, ka, np.zeros_like(ks), np.zeros_like(g), planck=planck)
    s2.set_angles(sundir_from_angles(0.0, 30.0))
    s2.solve(lthermal=True, lsolar=False)
    _, edn2, eup2, _ = map(np.asarray, s2.get_result())
    assert eup2[0].mean() > 0


def test_error_growth_tracker():
    tr = SolutionErrorTracker()
    assert tr.need_new_solution(0.0, 1.0, 100.0)  # empty history
    tr.record(0.0, 0.1)
    tr.record(10.0, 0.2)
    tr.record(20.0, 0.3)
    # linear growth 0.01/s: at t=25 est err 0.35 < 1.0 -> skip
    assert not tr.need_new_solution(25.0, 1.0, 1000.0)
    # tight error budget -> recompute
    assert tr.need_new_solution(25.0, 0.2, 1000.0)
    # too old -> recompute
    assert tr.need_new_solution(25.0, 1.0, 4.0)
    assert abso_change_maxnorm(np.ones(3), np.zeros(3)) == 1.0


def test_convolve_srfc():
    f = np.zeros((8, 8), np.float32)
    f[4, 4] = 1.0
    out = np.asarray(convolve_srfc_5pt(f, iterations=1))
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)  # conservative
    assert out[4, 4] == pytest.approx(0.2)
    assert out[3, 4] == pytest.approx(0.2)
    # periodic wrap
    f2 = np.zeros((8, 8), np.float32)
    f2[0, 0] = 1.0
    out2 = np.asarray(convolve_srfc_5pt(f2))
    assert out2[7, 0] == pytest.approx(0.2)


def test_slope_correction():
    edir = np.full((4, 4), 100.0, np.float32)
    sundir = sundir_from_angles(0.0, 0.0)  # overhead
    # flat terrain: unchanged
    flat = np.asarray(slope_correction_srfc_edir(edir, np.zeros((4, 4)), np.zeros((4, 4)), sundir))
    np.testing.assert_allclose(flat, 100.0, rtol=1e-5)
    # 45-deg slope under overhead sun: cos factor 1/sqrt(2)
    gx = np.ones((4, 4), np.float32)
    tilted = np.asarray(slope_correction_srfc_edir(edir, gx, np.zeros((4, 4)), sundir))
    np.testing.assert_allclose(tilted, 100.0 / np.sqrt(2.0), rtol=1e-5)


def test_accept_incomplete_solve_strict_raises(tmp_path):
    """Reference `-accept_incomplete_solve` analogue: the DEFAULT aborts
    when the diffuse iteration leaves a residual above tolerance
    (`src/pprts_explicit.F90:134-136`), with the host-side check
    deferred to the next natural sync point (`get_result`, or the end of
    a `specint_pprts` call) so the async band pipeline never syncs per
    band; accept_incomplete_solve=True tolerates the stalled iterate."""
    import os

    import pytest

    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    lut = load_or_create_lut(
        "3_10", mockup_axes(True), mockup_axes(False), n_photons=2000,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )
    opp = OptProp(lut)
    nz, nx, ny = 6, 8, 8
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)

    def make():
        s = PprtsSolver(grid, opp)
        ka = np.full((nz, nx, ny), 1e-4, np.float32)
        ks = np.full((nz, nx, ny), 5e-2, np.float32)  # scattering: needs iterations
        g = np.full((nz, nx, ny), 0.6, np.float32)
        s.set_optical_properties(0.3, ka, ks, g)
        s.set_angles(sundir_from_angles(0.0, 30.0))
        return s

    strict = make()  # strict is the DEFAULT (round-3 change)
    strict.options.set("ksp_max_it", 1)
    # unpreconditioned: the two-level PC converges this small scene in
    # ~1 iteration, which would defeat the deliberate stall
    strict.options.set("diff_precond", "none")
    strict.solve(lthermal=False, lsolar=True, edirTOA=1000.0)  # async: no raise yet
    with pytest.raises(RuntimeError, match="did not converge"):
        strict.get_result()

    tolerant = make()
    tolerant.options.set("ksp_max_it", 1)
    tolerant.options.set("diff_precond", "none")
    tolerant.options.set("accept_incomplete_solve", True)
    tolerant.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    tolerant.get_result()  # no raise
