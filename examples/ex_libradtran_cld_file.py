#!/usr/bin/env python
"""libRadtran 3-D cloud-file example (I3RC cumulus workflow).

Parity: reference `examples/libRadtran_cld_file/uvspec_cld_file.F90` +
`run_i3rc1_example.sh` — read a libRadtran/I3RC netCDF cloud file
(variables z [km], lwc [g/m3] on (nz, nx, ny), optionally reff), merge
it with the AFGL background atmosphere, run the full-spectrum LW+SW
solve, and write surface/TOA flux maps.  The reference downloads the
I3RC cumulus case from the libRadtran server; without a file this
script generates an I3RC-like broken-cumulus field with the same layout
so the whole workflow runs self-contained.

Run (CPU): JAX_PLATFORMS=cpu python examples/ex_libradtran_cld_file.py [cloudfile.nc]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def synthetic_i3rc_field(nz=12, nx=32, ny=32, dx=66.7, zbase=600.0, ztop=1800.0):
    """Broken-cumulus lwc field in the libRadtran cld-file layout."""
    rng = np.random.default_rng(42)
    z = np.linspace(0.0, 3000.0, nz + 1)
    lwc = np.zeros((nz, nx, ny), np.float32)
    zc = 0.5 * (z[:-1] + z[1:])
    incloud = (zc > zbase) & (zc < ztop)
    # clustered cumulus cells
    for _ in range(nx * ny // 24):
        i, j = rng.integers(0, nx), rng.integers(0, ny)
        di, dj = rng.integers(2, 6), rng.integers(2, 6)
        amp = rng.uniform(0.2, 0.7)
        for k in np.where(incloud)[0]:
            frac = (zc[k] - zbase) / (ztop - zbase)
            lwc[k, i : i + di, j : j + dj] = amp * frac  # adiabatic-ish
    return z, lwc, dx


def read_cld_file(path):
    """libRadtran cloud file: z (km, nz+1), lwc (g/m3, nz, nx, ny)."""
    from tenstream_tpu.utils.io import ncload

    z = np.asarray(ncload(path, "z"), np.float64) * 1e3
    lwc = np.asarray(ncload(path, "lwc"), np.float32)
    try:
        dx = float(np.asarray(ncload(path, "dx")))
    except Exception:
        dx = 100.0
    return z, lwc, dx


def main(cldfile=None, phi0=0.0, theta0=40.0):
    from tenstream_tpu.atm import setup_tenstr_atm
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts
    from tenstream_tpu.utils.io import ncwrite

    if cldfile:
        zlev_dyn, lwc, dx = read_cld_file(cldfile)
        print(f"read cloud file {cldfile}: {lwc.shape} cells, dx={dx} m")
    else:
        zlev_dyn, lwc, dx = synthetic_i3rc_field()
        print(f"generated I3RC-like cumulus: {lwc.shape} cells, dx={dx} m")

    nz, nx, ny = lwc.shape
    # dynamics pressure from a hydrostatic standard profile at the cloud
    # grid's heights (surface-based LES grid)
    from tenstream_tpu.atm import us_standard_atmosphere

    prof = us_standard_atmosphere(zlev_dyn[::-1])  # TOA-first
    atm = setup_tenstr_atm(
        prof["p"], prof["T"],
        lwc=lwc[::-1],  # TOA-first layer ordering
        reliq=np.full_like(lwc, 10.0),
    )
    nbg = atm.nlay - nz
    print(f"merged column: {atm.nlay} layers ({nbg} background + {nz} dynamics)")

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False), n_photons=2000)
    grid = Grid.create(atm.nlay, nx, ny, dx, dx, np.asarray(atm.dz, np.float32))
    solver = PprtsSolver(grid, OptProp(lut))
    solver.set_angles(sundir_from_angles(phi0, theta0))

    res = specint_pprts(
        solver, atm, albedo=0.07, lthermal=True, lsolar=True,
        specint="ecckd", band_chunk=8,
    )
    edir, edn, eup, abso = map(np.asarray, res)
    print(f"TOA: SWdn {edir[0].mean():.1f}  up {eup[0].mean():.1f} W/m2")
    print(f"SFC: edir {edir[-1].mean():.1f}  edn {edn[-1].mean():.1f} W/m2 "
          f"(cloud shadow min edir {edir[-1].min():.1f})")

    out = os.path.join(os.path.dirname(__file__), "out_cld_file.nc")
    for name, arr in {
        "edir_srfc": edir[-1], "edn_srfc": edn[-1], "eup_toa": eup[0],
        "lwc_path": lwc.sum(0) * float(np.abs(np.diff(zlev_dyn)).mean()),
    }.items():
        ncwrite(out, name, arr)
    print(f"wrote {out}")
    return res


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
