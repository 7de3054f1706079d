#!/usr/bin/env python
"""Dump all spectral-solve inputs to an archive, then re-solve from the
dump alone and verify the results match.

Parity: reference `examples/pprts/ex_pprts_specint_lw_sw_from_dump.F90`
(specint `dump_input` / `load_input_dump`,
`specint/specint_pprts.F90:213+`) — the workflow for shipping a
problematic host-model scene to a machine where it can be replayed and
debugged standalone.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_specint_from_dump.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from tenstream_tpu.atm import setup_standard_atmosphere
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.spectral import specint_pprts
from tenstream_tpu.utils.io import dump_specint_input, load_specint_input


def solve_from_inputs(atm, params, lut):
    nx, ny = int(params["nx"]), int(params["ny"])
    grid = Grid.create(atm.nlay, nx, ny, float(params["dx"]),
                       float(params["dy"]), atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, OptProp(lut))
    solver.set_angles(np.asarray(params["sundir"], np.float64))
    res = specint_pprts(
        solver, atm, albedo=float(params["albedo"]),
        lthermal=True, lsolar=True, specint=str(params["specint"]),
        band_chunk=int(params["band_chunk"]),
    )
    return map(np.asarray, (res.edir, res.edn, res.eup, res.abso))


def main(nx=8, ny=8):
    # ---- host-model side: build a cloudy scene and DUMP it ------------
    atm = setup_standard_atmosphere(z_grid=np.linspace(10e3, 0.0, 21))
    lwc = np.zeros((atm.nlay, nx, ny), np.float32)
    lwc[12:14, 2:6, 2:6] = 0.3  # g/m3 cumulus block
    atm.lwc, atm.reliq = lwc, np.full_like(lwc, 10.0)

    path = os.path.join(tempfile.gettempdir(), "specint_dump.npz")
    dump_specint_input(
        path, atm, sundir=sundir_from_angles(40.0, 55.0),
        albedo=0.2, dx=100.0, dy=100.0, nx=nx, ny=ny,
        specint="synthck", band_chunk=8,
    )
    print(f"dumped {os.path.getsize(path)/1e3:.1f} kB scene -> {path}")

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    edir0, edn0, eup0, abso0 = solve_from_inputs(atm, {
        "nx": nx, "ny": ny, "dx": 100.0, "dy": 100.0,
        "sundir": sundir_from_angles(40.0, 55.0), "albedo": 0.2,
        "specint": "synthck", "band_chunk": 8,
    }, lut)

    # ---- replay side: everything comes from the archive ---------------
    atm2, params = load_specint_input(path)
    edir1, edn1, eup1, abso1 = solve_from_inputs(atm2, params, lut)

    for name, a, b in (("edir", edir0, edir1), ("edn", edn0, edn1),
                       ("eup", eup0, eup1), ("abso", abso0, abso1)):
        err = float(np.max(np.abs(a - b)))
        print(f"{name}: replay max |diff| = {err:.2e}")
        assert err < 1e-4, name
    print(f"TOA edn {edn0[0].mean():.1f} W/m2, sfc edir {edir0[-1].mean():.1f} W/m2")
    print("replay reproduces the original solve")


if __name__ == "__main__":
    main()
