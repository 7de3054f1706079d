#!/usr/bin/env python
"""Classic box-cloud benchmark scene.

Parity: reference `examples/pprts/pprts_box_cld.F90` — a single
homogeneous cuboid cloud in a clear column; compares the TenStream
3-D fluxes against the 1-D two-stream and the DISORT-class
multi-stream column solver on the same scene.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_box_cld.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def run(solver_type, grid, ka, ks, g, lut=None):
    solver = PprtsSolver(grid, None if lut is None else OptProp(lut),
                         solver_type=solver_type)
    solver.set_optical_properties(0.2, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 60.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    return map(np.asarray, solver.get_result())


def main(nz=12, nx=16, ny=16):
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    ka = np.full((nz, nx, ny), 1e-6, np.float32)
    ks = np.full((nz, nx, ny), 1e-6, np.float32)
    g = np.full((nz, nx, ny), 0.85, np.float32)
    # the box cloud: tau ~ 10 over 3 layers
    ks[4:7, 5:11, 5:11] += 10.0 / 300.0
    ka[4:7, 5:11, 5:11] += 0.5 / 300.0

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    edir3, edn3, eup3, _ = run("3_10", grid, ka, ks, g, lut)
    edir1, edn1, eup1, _ = run("2str", grid, ka, ks, g)
    edirD, ednD, eupD, _ = run("disort", grid, ka, ks, g)

    print("                      TenStream-3D   twostream-1D   disort-1D")
    print(f"TOA  eup  (domain)   {eup3[0].mean():10.1f}  {eup1[0].mean():12.1f}"
          f"  {eupD[0].mean():10.1f}")
    print(f"srfc edir (domain)   {edir3[-1].mean():10.1f}  {edir1[-1].mean():12.1f}"
          f"  {edirD[-1].mean():10.1f}")
    print(f"srfc edn  (domain)   {edn3[-1].mean():10.1f}  {edn1[-1].mean():12.1f}"
          f"  {ednD[-1].mean():10.1f}")
    shadow = np.unravel_index(np.argmin(edir3[-1]), (nx, ny))
    print(f"3-D shadow center at {shadow} (cloud at x,y in [5,11)): "
          "the tilted sun displaces it")
    return 0


if __name__ == "__main__":
    sys.exit(main())
