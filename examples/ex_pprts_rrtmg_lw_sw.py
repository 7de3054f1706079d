#!/usr/bin/env python
"""Full-spectrum solar + thermal fluxes on a cloudy LES-like scene.

Parity: reference `examples/pprts/pprts_rrtm_lw_sw.F90` /
`pprts_specint_lw_sw.F90` — background atmosphere + liquid cloud,
RRTMG_SW for the solar spectrum and ecCKD for the longwave (the
reference tree does not vendor the RRTMG_LW k-tables), heating rates.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_rrtmg_lw_sw.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.atm import abso2hr, setup_standard_atmosphere
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.spectral.specint import specint_pprts


def main(nx=8, ny=8):
    atm = setup_standard_atmosphere(nlay=40, ztop=40e3)
    nlay = atm.nlay
    dz = np.asarray(atm.dz, np.float32)

    lwc = np.zeros((nlay, nx, ny), np.float32)
    lwc[nlay - 10, 2:6, 2:6] = 0.4  # stratocumulus patch [g/m3]
    reliq = np.full((nlay, nx, ny), 10.0, np.float32)
    atm = dataclasses.replace(atm, lwc=lwc, reliq=reliq)

    grid = Grid.create(nlay, nx, ny, 100.0, 100.0, dz)
    solver = PprtsSolver(grid, solver_type="2str")
    solver.set_angles(sundir_from_angles(0.0, 40.0))

    # solar: RRTMG_SW 112 gpt
    sw = specint_pprts(solver, atm, albedo=0.2, lsolar=True, lthermal=False,
                       specint="rrtmg_sw", lwc=lwc, reliq=reliq)
    # thermal: ecCKD 32 gpt longwave
    lw = specint_pprts(solver, atm, albedo=0.05, lsolar=False, lthermal=True,
                       specint="ecckd", lwc=lwc, reliq=reliq)

    edir, edn_sw, eup_sw = map(np.asarray, (sw.edir, sw.edn, sw.eup))
    edn_lw, eup_lw = map(np.asarray, (lw.edn, lw.eup))
    play = np.asarray(atm.play, np.float32)[:, None, None]
    tlay = np.asarray(atm.tlay, np.float32)[:, None, None]
    hr_sw = np.asarray(abso2hr(np.asarray(sw.abso), play, tlay))
    hr_lw = np.asarray(abso2hr(np.asarray(lw.abso), play, tlay))

    print(f"SW: TOA edir {edir[0].mean():7.1f}  sfc edir {edir[-1].mean():7.1f}  "
          f"sfc edn {edn_sw[-1].mean():6.1f}  TOA eup {eup_sw[0].mean():6.1f} W/m2")
    print(f"LW: OLR {eup_lw[0].mean():6.1f}  sfc edn {edn_lw[-1].mean():6.1f} W/m2")
    print(f"heating rates [K/d]: SW max {hr_sw.max():6.2f}   "
          f"LW min {hr_lw.min():7.2f} (cloud-top cooling)")
    icloud = nlay - 10
    print(f"cloud layer {icloud}: SW heating {hr_sw[icloud,2:6,2:6].mean():6.2f}  "
          f"LW cooling {hr_lw[icloud,2:6,2:6].mean():7.2f} K/d")
    return 0


if __name__ == "__main__":
    sys.exit(main())
