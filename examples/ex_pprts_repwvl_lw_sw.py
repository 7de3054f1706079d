#!/usr/bin/env python
"""Representative-wavelength full-spectrum solar + thermal fluxes.

Parity: reference `examples/pprts/pprts_repwvl_lw_sw.F90` /
`ex_pprts_repwvl_lw_sw.F90` — the repwvl spectral integration (a small
set of weighted monochromatic wavelengths, `repwvl/repwvl_pprts.F90`)
driving the same cloudy-scene solve as the rrtmg/ecckd demos; far fewer
spectral points, per-wavelength Rayleigh + Mie water + Fu ice optics.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_repwvl_lw_sw.py
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

    res = specint_pprts(solver, atm, albedo=0.2, lsolar=True, lthermal=True,
                        specint="repwvl", lwc=lwc, reliq=reliq)

    edir, edn, eup = map(np.asarray, (res.edir, res.edn, res.eup))
    play = np.asarray(atm.play, np.float32)[:, None, None]
    tlay = np.asarray(atm.tlay, np.float32)[:, None, None]
    hr = np.asarray(abso2hr(np.asarray(res.abso), play, tlay))

    print(f"repwvl: TOA edir {edir[0].mean():7.1f}  sfc edir {edir[-1].mean():7.1f}  "
          f"sfc edn {edn[-1].mean():6.1f}  TOA eup {eup[0].mean():6.1f} W/m2")
    icloud = nlay - 10
    print(f"heating rates [K/d]: max {hr.max():6.2f}  min {hr.min():7.2f}; "
          f"cloud layer mean {hr[icloud, 2:6, 2:6].mean():7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
