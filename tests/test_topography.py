"""Topography tests (reference `examples/pprts_hill`,
`test_pprts_slope_correction`)."""

import numpy as np
import pytest


def test_hill_slope_asymmetry(opp_small):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from ex_pprts_hill import gaussian_hill_grid

    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.postprocess import slope_correction_srfc_edir
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny, dx = 8, 16, 16, 100.0
    dz3d, h, hx, hy = gaussian_hill_grid(nz, nx, ny, dx, ztop=2000.0, hill_height=600.0)
    solver = PprtsSolver(Grid.create(nz, nx, ny, dx, dx, dz3d.astype(np.float32)), opp_small)
    kabs = np.full((nz, nx, ny), 5e-5, np.float32)
    ksca = np.full((nz, nx, ny), 2e-4, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.2, kabs, ksca, g)
    # sun from the +x direction, zenith 50 deg (reference phi=90 -> -x motion)
    sundir = sundir_from_angles(90.0, 50.0)
    solver.set_angles(sundir)
    solver.solve(lthermal=False, lsolar=True, edirTOA=1364.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    assert np.isfinite(edir).all() and np.isfinite(abso).all()

    edir_slope = np.asarray(slope_correction_srfc_edir(edir[-1], hx, hy, sundir))
    mid = ny // 2
    # photons travel toward -x: the +x flank (facing the sun) brightens,
    # the -x flank dims after slope correction
    sunny = edir_slope[11, mid] / max(edir[-1][11, mid], 1e-6)
    shady = edir_slope[4, mid] / max(edir[-1][4, mid], 1e-6)
    assert sunny > 1.05, sunny
    assert shady < 0.95, shady
