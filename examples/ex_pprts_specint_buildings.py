#!/usr/bin/env python
"""Full-spectrum urban scene: buildings inside a specint LW+SW solve.

Parity: reference `examples/pprts/pprts_specint_buildings.F90` /
`ex_pprts_specint_buildings.F90` — a building block with face albedo and
face TEMPERATURE; the spectral driver derives the per-g-point Planck
emission of the faces (`ecckd/ecckd_pprts.F90:339-448`) and accumulates
per-face incoming/outgoing radiation over the whole spectrum.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_specint_buildings.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.pprts.buildings import Buildings
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.spectral.specint import specint_pprts


def main(nx=16, ny=16, nlay=20, dx=100.0,
         buildings_albedo=0.25, buildings_temp=305.0,
         phi0=180.0, theta0=40.0, Ag=0.15):
    atm = setup_standard_atmosphere(nlay=nlay, ztop=20e3)
    grid = Grid.create(nlay, nx, ny, dx, dx, np.asarray(atm.dz, np.float32))

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    solver = PprtsSolver(grid, OptProp(lut))
    solver.set_angles(sundir_from_angles(phi0, theta0))

    # a 3x3-column tower occupying the lowest two layers
    solid = np.zeros((nlay, nx, ny), bool)
    solid[-2:, 6:9, 6:9] = True
    bldg = Buildings(solid=jnp.asarray(solid), albedo=buildings_albedo,
                     temp=jnp.asarray(buildings_temp))

    res = specint_pprts(solver, atm, albedo=Ag, lthermal=True, lsolar=True,
                        specint="ecckd", buildings=bldg)

    edn = np.asarray(res.edn)
    eup = np.asarray(res.eup)
    edir = np.asarray(res.edir)
    print(f"TOA: edir {edir[0].mean():8.2f}  eup {eup[0].mean():8.2f} W/m2")
    print(f"sfc: edir {edir[-1].mean():8.2f}  edn {edn[-1].mean():8.2f} W/m2")
    ishadow = np.unravel_index(np.argmin(edir[-1]), edir[-1].shape)
    print(f"direct in the tower shadow (cell {ishadow}) vs far field: "
          f"{edir[-1][ishadow]:.2f} vs {edir[-1, 1, 1]:.2f} W/m2")

    roof = {k: np.asarray(v) for k, v in bldg.fluxes["roof"].items()}
    wallS = {k: np.asarray(v) for k, v in bldg.fluxes["wall_y_low"].items()}
    k_roof = nlay - 2
    print(f"roof  (broadband): edir {roof['edir'][k_roof, 7, 7]:8.2f}  "
          f"incoming {roof['incoming'][k_roof, 7, 7]:8.2f}  "
          f"outgoing {roof['outgoing'][k_roof, 7, 7]:8.2f} W/m2")
    print(f"wall-S(broadband): edir {wallS['edir'][-1, 7, 6]:8.2f}  "
          f"incoming {wallS['incoming'][-1, 7, 6]:8.2f}  "
          f"outgoing {wallS['outgoing'][-1, 7, 6]:8.2f} W/m2")
    sigma = 5.670374419e-8
    emitted = roof["outgoing"][k_roof, 7, 7] - buildings_albedo * roof["incoming"][k_roof, 7, 7]
    print(f"face emission {emitted:.2f} W/m2 vs (1-a) sigma T^4 = "
          f"{(1 - buildings_albedo) * sigma * buildings_temp**4:.2f}")
    return res


if __name__ == "__main__":
    main()
