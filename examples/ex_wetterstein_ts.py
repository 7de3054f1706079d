#!/usr/bin/env python
"""Wetterstein-style steep-terrain time series.

Parity: reference `examples/wetterstein_ts/wetterstein.F90` — radiation
over real Alpine terrain (Wetterstein massif) on a terrain-following
grid, stepped through a day of sun positions.  The reference
interpolates a DEM (not vendored); here a synthetic Wetterstein-like
ridge (2 km relief, ~6 km across) reproduces the regime: steep
terrain-following layers, slope-corrected surface fluxes, shadowing,
and the adaptive re-solve skip across time steps (reference
`-max_solution_err/-max_solution_time` machinery).

Run (CPU): JAX_PLATFORMS=cpu python examples/ex_wetterstein_ts.py
"""

import os
import sys
import time as _time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def wetterstein_ridge(nx=48, ny=32, dx=200.0):
    """Synthetic ridge: an east-west crest with side valleys [m]."""
    x = np.arange(nx) * dx
    y = np.arange(ny) * dx
    xx, yy = np.meshgrid(x, y, indexing="ij")
    crest = 2000.0 * np.exp(-((yy - y.mean()) / 1500.0) ** 2)
    serration = 400.0 * np.sin(xx / 900.0) ** 2
    h = (crest + serration * (crest / 2000.0)).astype(np.float32)
    return h


def main(nsteps=6):
    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.core.config import Options
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.postprocess import slope_correction_srfc_edir
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    nx, ny, dx = 48, 32, 200.0
    h = wetterstein_ridge(nx, ny, dx)
    nz, ztop = 16, 8000.0
    # terrain-following sigma layers
    dz3d = np.broadcast_to((ztop - h)[None] / nz, (nz, nx, ny)).astype(np.float32)
    zlev_mean = ztop - np.cumsum(dz3d.mean(axis=(1, 2)))
    zlev = np.concatenate([[ztop], zlev_mean])
    atm = setup_standard_atmosphere(z_grid=zlev)

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False), n_photons=2000)
    opts = Options()
    opts.set("pprts_geometric_coeffs", True)  # terrain-tilted direct transport
    grid = Grid.create(nz, nx, ny, dx, dx, dz3d)
    solver = PprtsSolver(grid, OptProp(lut), options=opts)
    solver.set_terrain(h)

    hx = np.gradient(h, dx, axis=0)
    hy = np.gradient(h, dx, axis=1)

    # morning -> afternoon sweep; adaptive spectral integration reuses
    # band solutions whose error-growth stays small between steps
    thetas = np.linspace(75.0, 30.0, nsteps)
    phis = np.linspace(110.0, 250.0, nsteps)
    for it, (phi0, theta0) in enumerate(zip(phis, thetas)):
        t0 = _time.time()
        solver.set_angles(sundir_from_angles(phi0, theta0))
        res = specint_pprts(
            solver, atm, albedo=0.25, lthermal=True, lsolar=True,
            specint="ecckd", band_chunk=8,
            time=it * 600.0, max_solution_err=5.0, max_solution_time=1800.0,
        )
        edir, edn, eup, abso = map(np.asarray, res)
        e_corr = np.asarray(slope_correction_srfc_edir(
            edir[-1], hx, hy, sundir_from_angles(phi0, theta0)))
        skips = getattr(solver, "_spectral_skips", 0)
        print(f"step {it}: phi {phi0:5.1f} theta {theta0:4.1f} | "
              f"sfc edir flat {edir[-1].mean():6.1f} slope-corrected {e_corr.mean():6.1f} "
              f"(shadow min {edir[-1].min():5.1f}) W/m2 | "
              f"band-chunks skipped so far: {skips} | {_time.time()-t0:.1f}s")
    print("done")


if __name__ == "__main__":
    main()
