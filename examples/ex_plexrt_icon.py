#!/usr/bin/env python
"""Wedge solve on an ICON grid file (unstructured triangle mesh).

Parity: reference `examples/plexrt/ex_plex_ex1.F90` +
`gen_plex_from_icon.F90` workflow — read an ICON grid, extrude to wedge
columns, monochromatic solar solve with a cloud patch, report fluxes.
If no grid file is given, one is generated first (the
`tools/gen_mesh.py` path), so the example is self-contained.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_plexrt_icon.py [grid.nc]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.plexrt.icon import read_icon_grid, trimesh_from_structured, write_icon_grid
from tenstream_tpu.plexrt.optprop import WedgeOptProp, load_or_create_wedge_lut
from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon


def main(grid_path=None, nz=8):
    if grid_path is None:
        grid_path = os.path.join(os.path.dirname(__file__), "out_icon_grid.nc")
        write_icon_grid(grid_path, trimesh_from_structured(16, 16, 100.0, 100.0))
        print(f"generated {grid_path}")
    mesh = read_icon_grid(grid_path)
    print(f"mesh: {mesh.ncell} cells, {mesh.verts.shape[0]} vertices")

    # shape-AWARE table: traced at the mesh's mean cell shape instead of
    # the canonical right triangle (canonical tables cost ~10-16% flux
    # error on equilateral ICON cells — tools/wedge_shape_error.py,
    # PARITY.md); this structured demo mesh IS canonical-shaped, so the
    # helper reproduces the canonical table here
    from tenstream_tpu.plexrt.optprop import wedge_lut_for_mesh

    opp = WedgeOptProp(wedge_lut_for_mesh(mesh, n_photons=2000, verbose=True))
    solver = PlexrtSolverIcon(mesh, np.full(nz, 60.0), opp)

    ka = np.full((nz, mesh.ncell), 1e-5, np.float32)
    ks = np.full((nz, mesh.ncell), 1e-5, np.float32)
    g = np.full((nz, mesh.ncell), 0.5, np.float32)
    # cloud patch: cells whose centroid falls in a mid-domain box
    c = mesh.verts[mesh.tris].mean(1)
    lo, hi = mesh.verts.min(0), mesh.verts.max(0)
    incld = ((c > lo + 0.35 * (hi - lo)) & (c < lo + 0.65 * (hi - lo))).all(1)
    ks[3:5, incld] += 0.05

    solver.set_optical_properties(0.15, ka, ks, g)
    phi, theta = np.deg2rad(40.0), np.deg2rad(55.0)
    solver.set_angles(np.array([
        np.sin(phi) * np.sin(theta), np.cos(phi) * np.sin(theta),
        -np.cos(theta),
    ]))
    sol = solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result(sol))

    mu = np.cos(theta)
    print(f"TOA:  edir {edir[0].mean():8.2f}  eup {eup[0].mean():8.2f} W/m2"
          f"   (incoming {1000.0 * mu:.2f})")
    print(f"sfc:  edir {edir[-1].mean():8.2f}  edn {edn[-1].mean():8.2f}"
          f"  eup {eup[-1].mean():8.2f} W/m2")
    # at theta=55 the shadow is DISPLACED ~tan(theta)*z_cld off the cloud
    # footprint (the point of a 3-D solver) — report the shadow extremum
    print(f"cloud shadowing: sfc edir min {edir[-1].min():.1f} (displaced "
          f"shadow) vs max {edir[-1].max():.1f} (sunlit) W/m2")
    return edir, edn, eup, abso


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
