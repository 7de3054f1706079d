#!/usr/bin/env python
"""Extract the AFGL U.S.-standard-atmosphere background profile.

The reference vendors the libRadtran AFGL profile table
(`examples/pprts/afglus_100m.dat`, identical copy in
`tests/test_pprts_specint/`): public scientific data from
AFGL-TR-86-0110 ("AFGL atmospheric constituent profiles"), columns
z(km) p(mb) T(K) air(cm-3) o3 o2 h2o co2 no2 n2o ch4 (number densities).

This script re-packs those numbers (scientific data, not code) into
`data/atm/afglus_100m.dat` in the same ASCII layout so
`tenstream_tpu.atm.load_atmfile` and the default background profile can
use the exact reference data instead of analytic approximations.
"""

import os
import sys

import numpy as np

SRC = "/root/reference/examples/pprts/afglus_100m.dat"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data", "atm", "afglus_100m.dat")


def main():
    raw = np.loadtxt(SRC, comments="#")
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    header = (
        "# AFGL atmospheric constituent profile, U.S. standard atmosphere 1976"
        " (AFGL-TR-86-0110)\n"
        "# extracted from the reference tree examples/pprts/afglus_100m.dat"
        " (libRadtran data file)\n"
        "#  z(km)  p(mb)  T(K)  air(cm-3)  o3(cm-3)  o2(cm-3)  h2o(cm-3)"
        "  co2(cm-3)  no2(cm-3)  n2o(cm-3)  ch4(cm-3)\n"
    )
    with open(DST, "w") as f:
        f.write(header)
        np.savetxt(f, raw, fmt="%.7g")
    print(f"wrote {DST}: {raw.shape[0]} levels, {raw.shape[1]} columns")


if __name__ == "__main__":
    main()
