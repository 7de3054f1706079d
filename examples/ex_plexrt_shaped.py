#!/usr/bin/env python
"""Shape-heterogeneous ICON mesh solve with per-cell shape-interpolated
wedge tables (`WedgeOptPropShaped`).

The reference carries triangle shape as wedge-LUT axes
(`src/optprop_base.F90:230-283`); here `wedge_optprop_for_mesh` traces
shape-exact tables at the corners of the mesh's apex distribution and
blends them per cell.  This example distorts a structured triangle mesh
(apex spread far beyond any real ICON grid), solves a solar scene, and
reports the per-shape-class surface fluxes.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_plexrt_shaped.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.plexrt.icon import trimesh_from_points, trimesh_from_structured
from tenstream_tpu.plexrt.optprop import (
    WedgeAxes,
    mesh_cell_shapes,
    wedge_optprop_for_mesh,
)
from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon


def main(nx=6, ny=6, nz=6, dx=100.0, photons=500):
    base = trimesh_from_structured(nx, ny, dx, dx)
    rng = np.random.default_rng(42)
    mesh = trimesh_from_points(
        base.verts + rng.uniform(-0.18 * dx, 0.18 * dx, base.verts.shape),
        base.tris,
    )
    cx, cy = mesh_cell_shapes(mesh)
    print(f"mesh: {mesh.ncell} cells, apex spread "
          f"cx [{cx.min():.2f}, {cx.max():.2f}] cy [{cy.min():.2f}, {cy.max():.2f}]")

    # compact axes for the example (production: default_axes)
    axes_d = WedgeAxes(
        tau=np.array([0.01, 0.1, 0.6, 3.0, 12.0], np.float32),
        w0=np.array([0.2, 0.8, 0.99], np.float32),
        aspect=np.array([0.4, 0.8, 1.4], np.float32),
        g=np.array([0.0, 0.5, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 13).astype(np.float32),
        theta=np.array([0.0, 25.0, 50.0, 75.0], np.float32),
    )
    axes_f = WedgeAxes(axes_d.tau, axes_d.w0, axes_d.aspect, axes_d.g)
    # cache the sample tables beside the example outputs, not data/luts
    cache = os.path.join(os.path.dirname(__file__), "out_shaped_luts")
    opp = wedge_optprop_for_mesh(mesh, axes_d, axes_f, n_photons=photons,
                                 basename=cache)
    ntab = len(getattr(opp, "tabs", [None]))
    print(f"shape coverage: {ntab} sample table(s)")

    solver = PlexrtSolverIcon(mesh, [80.0] * nz, opp)
    ka = np.full((nz, mesh.ncell), 2e-4, np.float32)
    ks = np.full((nz, mesh.ncell), 2e-3, np.float32)
    ks[2] = 3e-2  # scattering layer
    gg = np.full((nz, mesh.ncell), 0.5, np.float32)
    solver.set_optical_properties(0.2, ka, ks, gg)
    theta, phi = 40.0, 30.0
    p, t = np.deg2rad(phi), np.deg2rad(theta)
    solver.set_angles(np.array([np.sin(p) * np.sin(t), np.cos(p) * np.sin(t),
                                -np.cos(t)]))
    sol = solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = solver.get_result(sol)

    edir_s = np.asarray(edir[-1])
    print(f"surface edir: mean {edir_s.mean():.1f} W/m2 "
          f"(spread {edir_s.std():.1f}), TOA eup {np.asarray(eup[0]).mean():.1f}")
    print(f"diffuse solve: niter {int(np.asarray(sol.niter_diff))}, "
          f"res {float(np.asarray(sol.diff_res)):.2e} "
          f"(tol {float(np.asarray(sol.diff_tol)):.2e})")


if __name__ == "__main__":
    main()
