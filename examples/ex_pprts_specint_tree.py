#!/usr/bin/env python
"""A tree in the domain: vegetation optical properties through specint's
gray extra-optical-property hook.

Parity: reference `examples/pprts/pprts_specint_tree.F90` — a bark trunk
plus an ellipsoidal leaf canopy, vegetation single-scattering albedo from
the USGS spectral curves averaged over the solar range (0.45-1.2 um),
pure absorption in the thermal range; solar and thermal run as separate
specint calls with their own extra tau/w0 fields (the reference's
`opt_tau/opt_w0/opt_g` inputs).

Run (CPU):  JAX_PLATFORMS=cpu python examples/ex_pprts_specint_tree.py
"""

import os
import sys

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
from tenstream_tpu.spectral.specint import specint_pprts
from tenstream_tpu.spectral.vegetation import get_albedo_for_range, mix_material


def build_tree(nlay, nx, ny, tree_height=6, lai_leaf=1.0, lai_bark=0.1):
    """Trunk + ellipsoidal canopy LAI fields; returns (tau_solar,
    w0_solar, tau_thermal) per cell (reference `build_tree`,
    `pprts_specint_tree.F90:183-305`)."""
    ci, cj = nx // 2, ny // 2
    ck = nlay - tree_height  # canopy center layer (k grows downward)
    alb_bark = get_albedo_for_range("bark", 0.45, 1.2)
    alb_leaf = get_albedo_for_range("leaf", 0.45, 1.2)

    tau_s = np.zeros((nlay, nx, ny), np.float32)
    w0_s = np.zeros_like(tau_s)
    tau_t = np.zeros_like(tau_s)

    # trunk: bark in the domain-center column over the lowest layers
    tau_s[nlay - tree_height:, ci, cj] = lai_bark
    w0_s[nlay - tree_height:, ci, cj] = alb_bark
    tau_t[nlay - tree_height:, ci, cj] = lai_bark

    # canopy: leaves inside an ellipsoid around the tree top
    for k in range(max(nlay - tree_height - 1, 0), nlay):
        for i in range(nx):
            for j in range(ny):
                r = np.sqrt((i - ci) ** 2 + (j - cj) ** 2 + 4.0 * (k - ck) ** 2)
                if r <= tree_height / 3.0:
                    tau_s[k, i, j], w0_s[k, i, j] = mix_material(
                        tau_s[k, i, j], w0_s[k, i, j], lai_leaf, alb_leaf
                    )
                    tau_t[k, i, j] += lai_leaf
    return tau_s, w0_s, tau_t


def main(nx=16, ny=16, nlay=16, dx=50.0, phi0=180.0, theta0=30.0, Ag=0.15):
    atm = setup_standard_atmosphere(nlay=nlay, ztop=10e3)
    grid = Grid.create(nlay, nx, ny, dx, dx, np.asarray(atm.dz, np.float32))
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    solver = PprtsSolver(grid, OptProp(lut))
    solver.set_angles(sundir_from_angles(phi0, theta0))

    tau_s, w0_s, tau_t = build_tree(nlay, nx, ny)
    zeros = np.zeros_like(tau_s)

    solar = specint_pprts(solver, atm, albedo=Ag, lthermal=False,
                          lsolar=True, specint="ecckd",
                          extra_tau=tau_s, extra_w0=w0_s, extra_g=zeros)
    thermal = specint_pprts(solver, atm, albedo=Ag, lthermal=True,
                            lsolar=False, specint="ecckd",
                            extra_tau=tau_t, extra_w0=zeros, extra_g=zeros)

    edir = np.asarray(solar.edir)
    ci, cj = nx // 2, ny // 2
    ishade = np.unravel_index(np.argmin(edir[-1]), edir[-1].shape)
    print(f"solar sfc edir: open {edir[-1, 1, 1]:7.2f}  "
          f"under-tree min {edir[-1][ishade]:7.2f} W/m2 at {tuple(map(int, ishade))}")
    print(f"solar sfc edn : open {np.asarray(solar.edn)[-1, 1, 1]:7.2f}  "
          f"under tree {np.asarray(solar.edn)[-1, ci, cj]:7.2f} W/m2")
    abso_s = np.asarray(solar.abso)
    print(f"canopy solar heating (max abso): {abso_s.max():.4f} W/m3")
    print(f"thermal sfc edn: open {np.asarray(thermal.edn)[-1, 1, 1]:7.2f}  "
          f"under tree {np.asarray(thermal.edn)[-1, ci, cj]:7.2f} W/m2")
    return solar, thermal


if __name__ == "__main__":
    main()
