#!/usr/bin/env python
"""Extract the repwvl (representative wavelength) tables into npz.

Reads the reference's netCDF4/HDF5 tables with the in-repo minimal
HDF5 reader (`utils/hdf5reader.py`) — no libhdf5 needed — and stores
them under data/repwvl/:

  repwvl_{sw,lw}_{15,50}.npz : wvl [nm], wgts, p_ref, t_ref, t_pert,
        vmrs_ref (tracer, Np), xsec (Nt_pert, Ntracer, Nwvl, Np),
        crs_o3 / crs_no2 (Nwvl, 3) where present, tracernames
  mie_wc_table.npz           : wvl [nm], reff [um], ext, ssa, g
  fu_ice_general.npz         : Fu96/Fu98 ice parameterization tables

Usage: python tools/extract_repwvl.py [--ref /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tenstream_tpu.utils.hdf5reader import MiniH5  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    src = os.path.join(args.ref, "repwvl", "data")
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "repwvl")
    os.makedirs(out, exist_ok=True)

    for band in ("sw", "lw"):
        for nw in (15, 20, 25, 50):
            h = MiniH5(os.path.join(src, f"pyada_{band}_{nw}.nc"))
            store = {}
            for v in h.variables():
                a = h.read(v)
                store[v] = a.astype(np.float64) if a.dtype.kind == "f" else a
            path = os.path.join(out, f"repwvl_{band}_{nw}.npz")
            np.savez_compressed(path, **store)
            print(f"{path}: wvl {store['wvl'].shape}, "
                  f"wgts sum {store['wgts'].sum():.2f}")

    h = MiniH5(os.path.join(src, "mie.wc.table.nc"))
    np.savez_compressed(os.path.join(out, "mie_wc_table.npz"),
                        **{v: h.read(v) for v in h.variables()})
    h = MiniH5(os.path.join(src, "fu.ice.general.nc"))
    np.savez_compressed(os.path.join(out, "fu_ice_general.npz"),
                        **{v: h.read(v) for v in h.variables()})
    print("wrote mie + fu-ice tables")
    return 0


if __name__ == "__main__":
    sys.exit(main())
