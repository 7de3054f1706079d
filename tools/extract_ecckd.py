#!/usr/bin/env python
"""Extract ecCKD CKD-definition netCDF tables into npz artifacts.

Parity: the reference vendors the ecCKD 1.0 gas-optics model data
(`ecckd/data/*.nc`, loaded by `ecckd/ecckd_base.F90`).  This tool
converts those NetCDF3 files (readable with scipy, no netCDF library
needed) into `data/ecckd/*.npz` consumed by
`tenstream_tpu.spectral.ecckd`.

Data provenance: ecCKD correlated-k model, R. Hogan / ECMWF
(https://confluence.ecmwf.int/display/ECCKD), redistributed by the
tenstream reference repository.  This tool only reformats the numbers.

Usage: python tools/extract_ecckd.py [--src DIR] [--out DIR]
"""

import argparse
import os
import sys

import numpy as np
from scipy.io import netcdf_file

GASES = ["composite", "h2o", "o3", "co2", "ch4", "n2o", "cfc11", "cfc12"]


def extract(path: str) -> dict:
    f = netcdf_file(path, "r", mmap=False)
    v = f.variables
    out = {}
    for key in (
        "pressure", "temperature", "temperature_planck", "planck_function",
        "solar_irradiance", "rayleigh_molar_scattering_coeff",
        "wavenumber1", "wavenumber2", "gpoint_fraction",
        "wavenumber1_band", "wavenumber2_band", "band_number",
    ):
        if key in v:
            out[key] = np.array(v[key].data, np.float64)
    gases = []
    for gas in GASES:
        code_key = f"{gas}_conc_dependence_code"
        if code_key not in v:
            continue
        code = int(np.array(v[code_key].data))
        entry = {"name": gas, "code": code}
        out[f"{gas}_code"] = np.int32(code)
        mabs = np.array(v[f"{gas}_molar_absorption_coeff"].data, np.float64)
        out[f"{gas}_mabs"] = mabs.astype(np.float32)
        if f"{gas}_mole_fraction" in v:
            out[f"{gas}_mole_fraction"] = np.array(v[f"{gas}_mole_fraction"].data, np.float64)
        if f"{gas}_reference_mole_fraction" in v:
            out[f"{gas}_ref_vmr"] = np.array(v[f"{gas}_reference_mole_fraction"].data, np.float64)
        gases.append(gas)
    out["gases"] = np.array(gases)
    f.close()
    return out


def extract_scattering(path: str) -> dict:
    f = netcdf_file(path, "r", mmap=False)
    out = {}
    for k in f.variables:
        arr = np.array(f.variables[k].data, np.float64)
        if arr.ndim > 0:
            out[k] = arr
    f.close()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/ecckd/data")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data", "ecckd"),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in (
        "ecckd-1.0_sw_climate_rgb-16_ckd-definition.nc",
        "ecckd-1.0_sw_climate_rgb-32_ckd-definition.nc",
        "ecckd-1.0_lw_climate_fsck-16_ckd-definition.nc",
        "ecckd-1.0_lw_climate_fsck-32_ckd-definition.nc",
    ):
        src = os.path.join(args.src, name)
        if not os.path.exists(src):
            print(f"skip missing {src}")
            continue
        out = extract(src)
        dst = os.path.join(args.out, name.replace("_ckd-definition.nc", "") + ".npz")
        np.savez_compressed(dst, **out)
        print(f"{dst}: gases={list(out['gases'])}, "
              + ", ".join(f"{k}{out[k].shape}" for k in out if k.endswith("_mabs")))

    for name in ("mie_droplet_scattering.nc", "fu-muskatel-rough_ice_scattering.nc"):
        src = os.path.join(args.src, name)
        if not os.path.exists(src):
            print(f"skip missing {src}")
            continue
        out = extract_scattering(src)
        dst = os.path.join(args.out, name.replace(".nc", "") + ".npz")
        np.savez_compressed(dst, **out)
        print(f"{dst}: " + ", ".join(f"{k}{out[k].shape}" for k in sorted(out)[:6]))


if __name__ == "__main__":
    main()
