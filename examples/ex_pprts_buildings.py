#!/usr/bin/env python
"""Urban scene: buildings casting shadows and reflecting walls.

Parity: reference `examples/pprts/pprts_buildings.F90` — a solid
building block inside the domain, monochromatic solar solve, shadows,
roof/wall reflection.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_buildings.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.pprts.buildings import Buildings
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def main(nz=10, nx=16, ny=16):
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    grid = Grid.create(nz, nx, ny, 50.0, 50.0, 20.0)
    solver = PprtsSolver(grid, OptProp(lut))

    ka = np.full((nz, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)

    solid = np.zeros((nz, nx, ny), bool)
    solid[4:, 6:9, 6:9] = True  # a 120 m tower
    solid[7:, 11:13, 4:6] = True  # a lower block

    solver.set_optical_properties(0.15, ka, ks, g)
    solver.set_angles(sundir_from_angles(120.0, 55.0))
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.4))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    print(f"surface edir: min {edir[-1].min():6.1f} (street shadow)  "
          f"max {edir[-1].max():6.1f} W/m2")
    print(f"roof-level eup above the tower: {eup[4, 7, 7]:6.1f} vs "
          f"far field {eup[4, 0, 0]:6.1f} W/m2")
    shadowed = (edir[-1] < 0.5 * edir[-1].max()).sum()
    print(f"shadowed surface cells: {shadowed}/{nx * ny}")

    from tenstream_tpu.utils.io import ncwrite

    out = os.path.join(os.path.dirname(__file__), "out_buildings.nc")
    ncwrite(out, "edir_srfc", edir[-1], dim_names=("x", "y"),
            attrs={"units": b"W/m2"})
    ncwrite(out, "edn_srfc", edn[-1], dim_names=("x", "y"))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
