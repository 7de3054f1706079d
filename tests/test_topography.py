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


def test_geometric_coeffs_hill(opp_small):
    """-pprts_geometric_coeffs: analytic tilted-cell direct transport
    (reference `src/geometric_coeffs.F90`).  On a hill, the tilted
    bottom faces shift the surface direct-flux pattern relative to the
    stair-step cuboid LUT; on flat terrain both paths agree."""
    import jax.numpy as jnp

    from tenstream_tpu.core.config import Options
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 6, 16, 8
    # terrain-following dz: compress layers over a ridge along x
    h = 150.0 * np.exp(-((np.arange(nx) - 8.0) ** 2) / 8.0)
    h2d = np.tile(h[:, None], (1, ny)).astype(np.float32)
    ztop = 1200.0
    dz = np.empty((nz, nx, ny), np.float32)
    for i in range(nx):
        dz[:, i, :] = (ztop - h[i]) / nz
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, dz)

    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 2e-4, np.float32)
    g = np.full((nz, nx, ny), 0.3, np.float32)

    def run(geom):
        opts = Options(option_string="-pprts_geometric_coeffs" if geom else "")
        s = PprtsSolver(grid, opp_small, options=opts)
        s.set_optical_properties(0.2, ka, ks, g)
        s.set_terrain(h2d)
        s.set_angles(sundir_from_angles(90.0, 50.0))
        s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        return map(np.asarray, s.get_result())

    edir_g, edn_g, eup_g, abso_g = run(True)
    edir_l, edn_l, eup_l, abso_l = run(False)
    assert np.isfinite(edir_g).all()
    # both conserve energy to a few percent
    for edir, edn, eup, abso in ((edir_g, edn_g, eup_g, abso_g),):
        inc = 1000.0 * np.cos(np.deg2rad(50.0))
        dzc = dz.sum(0) / nz
        bal = eup[0].mean() + (abso * dz.mean()).sum(0).mean() + (
            edir[-1] + edn[-1] - eup[-1]
        ).mean()
        assert abs(bal - inc) / inc < 0.06, (bal, inc)
    # geometric coeffs change the direct pattern on the slopes but not
    # the domain total dramatically
    assert abs(edir_g[-1].mean() - edir_l[-1].mean()) / edir_l[-1].mean() < 0.2
    slope_diff = np.abs(edir_g[-1] - edir_l[-1]).max()
    assert slope_diff > 1.0  # the tilt has a visible effect somewhere
