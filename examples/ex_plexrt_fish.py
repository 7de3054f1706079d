#!/usr/bin/env python
"""Wedge-mesh (plexrt) solve on a regular "fish" triangulation.

Parity: reference `examples/plexrt/plex_fish.F90` — build a regular
triangle mesh, extrude to wedges, monochromatic solar solve, report
fluxes.  Adds a displaced-cloud-shadow demonstration and XDMF output.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_plexrt_fish.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.plexrt.mesh import fish_mesh
from tenstream_tpu.plexrt.optprop import WedgeOptProp, load_or_create_wedge_lut
from tenstream_tpu.plexrt.solver import PlexrtSolver


def main(nz=8, nx=16, ny=16, dx=100.0):
    lut = load_or_create_wedge_lut(n_photons=2000, verbose=True)
    solver = PlexrtSolver(fish_mesh(nz, nx, ny, dx, dx, 60.0), WedgeOptProp(lut))

    ka = np.full((nz, 2, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, 2, nx, ny), 1e-5, np.float32)
    g = np.full((nz, 2, nx, ny), 0.5, np.float32)
    ks[3:5, :, 6:10, 6:10] += 0.05  # a cloud block

    solver.set_optical_properties(0.15, ka, ks, g)
    phi, theta = np.deg2rad(40.0), np.deg2rad(55.0)
    solver.set_angles(np.array([
        np.sin(phi) * np.sin(theta), np.cos(phi) * np.sin(theta), -np.cos(theta)
    ]))

    sol = solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result(sol))

    print(f"TOA  edir {edir[0].mean():8.2f}  eup {eup[0].mean():8.2f} W/m2")
    print(f"srfc edir {edir[-1].mean():8.2f}  edn {edn[-1].mean():8.2f} W/m2")
    print(f"surface direct min/max: {edir[-1].min():.1f} / {edir[-1].max():.1f} "
          "(displaced cloud shadow)")

    bal = eup[0].mean() + (abso * 60.0).sum(0).mean() + (
        edir[-1] + edn[-1] - eup[-1]
    ).mean()
    print(f"energy balance: {bal:.2f} / 1000.00 W/m2")

    from tenstream_tpu.utils.io import write_xdmf_grid

    out = os.path.join(os.path.dirname(__file__), "out_plexrt_fish")
    # export the triangle-pair mean as a regular grid for quick viewing
    write_xdmf_grid(out, {"edir_srfc": edir[-1].mean(0), "eup_toa": eup[0].mean(0)},
                    dx=dx, dy=dx)
    print(f"wrote {out}.xmf")
    return 0


if __name__ == "__main__":
    sys.exit(main())
