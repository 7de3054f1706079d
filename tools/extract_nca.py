#!/usr/bin/env python
"""Extract the NCA emissivity/correction tables.

The reference vendors Carolin Klinger's Neighbouring Column
Approximation lookup data (`misc/nca_data.nc`, Klinger & Mayer 2019)
consumed by `plexrt/nca_multi_tri.F90:plexrt_nca_init`.  This re-packs
the scientific data tables into `data/nca/nca_tables.npz`.
"""

import os

import numpy as np

SRC = "/root/reference/misc/nca_data.nc"
DST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data", "nca", "nca_tables.npz")


def main():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from tenstream_tpu.utils.hdf5reader import read_all

    d = read_all(SRC)
    keep = {k: np.asarray(v) for k, v in d.items() if not k.endswith(tuple(f"_dim{i}" for i in (1, 2)))}
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    np.savez_compressed(DST, **keep)
    print(f"wrote {DST}: " + ", ".join(f"{k}{v.shape}" for k, v in keep.items()))


if __name__ == "__main__":
    main()
