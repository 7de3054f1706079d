#!/usr/bin/env python
"""Minimal end-to-end example: box cloud in a clear-sky column.

Parity: reference `examples/pprts/pprts_ex1.F90` — allocate solver ->
init grid -> fill kabs/ksca/g (+planck) -> set_optical_properties ->
set_angles -> solve -> get_result.

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_ex1.py
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


def main(
    nv=10, nxp=16, nyp=16, dx=100.0, dy=100.0, dz=100.0,
    phi0=180.0, theta0=40.0, albedo=0.2, incSolar=1364.0,
    dtau_clearsky=1.0, w0_clearsky=0.5, g_clearsky=0.5,
    cld_layer_idx=(4, 5), dtau_cloud=10.0, w0_cloud=0.99, g_cloud=0.85,
    lthermal=True, lsolar=True, Bplck=100.0 / np.pi, Bplck_srfc=120.0 / np.pi,
):
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False), n_photons=2000)
    solver = PprtsSolver(Grid.create(nv, nxp, nyp, dx, dy, dz), OptProp(lut))

    kabs = np.full((nv, nxp, nyp), dtau_clearsky / dz / nv * (1 - w0_clearsky), np.float32)
    ksca = np.full((nv, nxp, nyp), dtau_clearsky / dz / nv * w0_clearsky, np.float32)
    g = np.full((nv, nxp, nyp), g_clearsky, np.float32)

    ncld = 1 + cld_layer_idx[1] - cld_layer_idx[0]
    sl = slice(cld_layer_idx[0], cld_layer_idx[1] + 1)
    # cloud only in the middle of the domain
    cx, cy = slice(nxp // 4, 3 * nxp // 4), slice(nyp // 4, 3 * nyp // 4)
    kabs[sl, cx, cy] += dtau_cloud / ncld / dz * (1 - w0_cloud)
    ksca[sl, cx, cy] += dtau_cloud / ncld / dz * w0_cloud
    g[sl, cx, cy] = g_cloud

    planck = np.full((nv + 1, nxp, nyp), Bplck, np.float32)
    planck_srfc = np.full((nxp, nyp), Bplck_srfc, np.float32)

    sundir = sundir_from_angles(phi0, theta0)
    solver.set_optical_properties(
        albedo, kabs, ksca, g,
        planck=planck if lthermal else None,
        planck_srfc=planck_srfc if lthermal else None,
    )
    solver.set_angles(sundir)
    solver.solve(lthermal=lthermal, lsolar=lsolar, edirTOA=incSolar)
    fdir, fdn, fup, fdiv = solver.get_result()

    print(f"{'lvl':>4s} {'edir':>10s} {'edn':>10s} {'eup':>10s} {'abso':>12s}")
    for k in range(nv + 1):
        a = float(np.asarray(fdiv)[min(k, nv - 1)].mean())
        print(
            f"{k:4d} {float(np.asarray(fdir)[k].mean()):10.2f} "
            f"{float(np.asarray(fdn)[k].mean()):10.2f} "
            f"{float(np.asarray(fup)[k].mean()):10.2f} {a:12.6f}"
        )
    return fdir, fdn, fup, fdiv


if __name__ == "__main__":
    main()
