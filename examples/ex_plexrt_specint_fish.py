#!/usr/bin/env python
"""Full-spectrum (LW+SW) heating rates on the wedge "fish" mesh.

Parity: reference `examples/plexrt/plex_specint_fish.F90` /
`plex_rrtmg_fish.F90` — build a regular triangle mesh, extrude to
wedges, spectral integration (here ecCKD 32+32 g-points, band-batched)
over a cloudy scene, report broadband fluxes and heating rates.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_plexrt_specint_fish.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.atm import abso2hr, setup_standard_atmosphere
from tenstream_tpu.plexrt.mesh import fish_mesh
from tenstream_tpu.plexrt.optprop import WedgeOptProp, load_or_create_wedge_lut
from tenstream_tpu.plexrt.solver import PlexrtSolver
from tenstream_tpu.spectral.specint_plexrt import specint_plexrt


def main(nx=10, ny=10, nlay=12, dx=200.0):
    atm = setup_standard_atmosphere(nlay=nlay, ztop=12e3)
    dz = np.asarray(atm.dz, np.float32)

    lut = load_or_create_wedge_lut(n_photons=2000, verbose=True)
    solver = PlexrtSolver(fish_mesh(nlay, nx, ny, dx, dx, dz), WedgeOptProp(lut))
    phi, theta = np.deg2rad(30.0), np.deg2rad(45.0)
    solver.set_angles(np.array([
        np.sin(phi) * np.sin(theta), np.cos(phi) * np.sin(theta), -np.cos(theta)
    ]))

    lwc = np.zeros((nlay, 2, nx, ny), np.float32)
    lwc[nlay - 4, :, 3:7, 3:7] = 0.3  # cloud patch on both triangle kinds

    res = specint_plexrt(solver, atm, albedo=0.15, lthermal=True,
                         lsolar=True, specint="ecckd", lwc=lwc)

    edir, edn, eup = map(np.asarray, (res.edir, res.edn, res.eup))
    play = np.asarray(atm.play, np.float32)[:, None, None, None]
    tlay = np.asarray(atm.tlay, np.float32)[:, None, None, None]
    hr = np.asarray(abso2hr(np.asarray(res.abso), play, tlay))

    print(f"TOA : edir {edir[0].mean():8.2f}  eup(SW+OLR) {eup[0].mean():7.2f} W/m2")
    print(f"srfc: edir {edir[-1].mean():8.2f}  edn {edn[-1].mean():7.2f} W/m2")
    print(f"direct under the cloud vs open: "
          f"{edir[-1, :, 4, 4].mean():.1f} vs {edir[-1, :, 0, 0].mean():.1f} W/m2")
    icld = nlay - 4
    print(f"heating rates [K/d]: max {hr.max():6.2f}  min {hr.min():7.2f}; "
          f"cloud layer {hr[icld, :, 3:7, 3:7].mean():7.2f}")
    return res


if __name__ == "__main__":
    main()
