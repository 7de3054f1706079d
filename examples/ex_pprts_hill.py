#!/usr/bin/env python
"""Topography example: radiation over a Gaussian hill.

Parity: reference `examples/pprts_hill/pprts_hill.F90` — a
terrain-following (sigma-coordinate) grid with 3-D layer thicknesses,
solved with the 3-D solver, surface direct flux corrected for the local
slope (`slope_correction_fluxes`).

Run (CPU): JAX_PLATFORMS=cpu python examples/ex_pprts_hill.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def gaussian_hill_grid(nz=10, nx=24, ny=24, dx=100.0, ztop=2000.0, hill_height=800.0, hill_sigma=400.0):
    """Terrain-following layer thicknesses and surface height/gradients."""
    x = (np.arange(nx) - nx / 2.0) * dx
    y = (np.arange(ny) - ny / 2.0) * dx
    xx, yy = np.meshgrid(x, y, indexing="ij")
    h = hill_height * np.exp(-(xx**2 + yy**2) / (2.0 * hill_sigma**2))
    # sigma coordinate: nz equal layers between h(x,y) and ztop
    dz3d = np.broadcast_to((ztop - h)[None, :, :] / nz, (nz, nx, ny)).astype(np.float32)
    hx = np.gradient(h, dx, axis=0)
    hy = np.gradient(h, dx, axis=1)
    return dz3d, h, hx, hy


def main(phi0=90.0, theta0=50.0, verbose=True):
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.postprocess import slope_correction_srfc_edir
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles, suninfo_from_sundir

    nz, nx, ny, dx = 10, 24, 24, 100.0
    dz3d, h, hx, hy = gaussian_hill_grid(nz, nx, ny, dx)

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False), n_photons=2000)
    solver = PprtsSolver(Grid.create(nz, nx, ny, dx, dx, dz3d), OptProp(lut))

    kabs = np.full((nz, nx, ny), 5e-5, np.float32)
    ksca = np.full((nz, nx, ny), 2e-4, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.2, kabs, ksca, g)
    sundir = sundir_from_angles(phi0, theta0)
    solver.set_angles(sundir)
    solver.solve(lthermal=False, lsolar=True, edirTOA=1364.0)
    edir, edn, eup, abso = solver.get_result()

    edir_srfc = np.asarray(edir)[-1]
    edir_slope = np.asarray(slope_correction_srfc_edir(edir_srfc, hx, hy, sundir))

    if verbose:
        mid = ny // 2
        print("surface edir across the hill (flat vs slope-corrected):")
        for i in range(0, nx, 2):
            print(f"  x={i:3d} h={h[i, mid]:6.1f} m  edir={edir_srfc[i, mid]:8.2f} "
                  f" slope-corrected={edir_slope[i, mid]:8.2f} W/m2")
    return edir_srfc, edir_slope, h, (hx, hy)


if __name__ == "__main__":
    main()
