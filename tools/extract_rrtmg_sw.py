#!/usr/bin/env python
"""Extract the RRTMG_SW k-distribution tables into an npz archive.

The reference vendors the original 224-gpoint shortwave coefficients as
Fortran data statements (`rrtmg/rrtm_sw/rrtmg_sw_k_g.f90`, subroutines
`sw_kgb16..29`) and reduces them to the production 112-gpoint set at
initialization (`rrtmg/rrtm_sw/rrtmg_sw_init.f90`, `cmbgb16s..29`):
absorption-type arrays combine with the renormalized quadrature weights
rwgt = wt(ig)/sum(wt over the combined group), solar-source arrays
combine by plain summation (`:488`, `cmbgb23` shown at `:1074-1125`).

This tool parses the data statements, performs the same reduction in
numpy, and stores per-band arrays:

  b{16..29}/ka        (9|-,5,13,ng)   lower-atmosphere k, eta-resolved
  b{16..29}/kb        ([5|5x5],47,ng) upper-atmosphere k
  b{16..29}/selfref   (10,ng)         water self-continuum
  b{16..29}/forref    (3|4,ng)        water foreign-continuum
  b{16..29}/sfluxref  (ng[,5|9])      Kurucz solar source per gpoint
  b{16..29}/rayl*     scalar or (ng[,9])
  b{16..29}/abs*      (ng,)           minor-gas cross sections
  pref/preflog/tref   (59,)           reference pressure/temperature
                                      grids (`rrtmg_sw_setcoef.f90:298`)

Numeric tables are physical constants (AER's published RRTMG data);
only their container format changes here.

Usage: python tools/extract_rrtmg_sw.py [--ref /root/reference] [--out data/rrtmg/rrtmg_sw_112.npz]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

# ---- g-point reduction metadata (rrtmg_sw_init.f90:270-314) ------------
NGC = [6, 12, 8, 8, 10, 10, 2, 10, 8, 6, 6, 8, 6, 12]
NGN = {
    16: [2, 2, 2, 2, 4, 4],
    17: [1, 1, 1, 1, 1, 2, 1, 2, 1, 2, 1, 2],
    18: [1, 1, 1, 1, 2, 2, 4, 4],
    19: [1, 1, 1, 1, 2, 2, 4, 4],
    20: [1, 1, 1, 1, 1, 1, 1, 1, 2, 6],
    21: [1, 1, 1, 1, 1, 1, 1, 1, 2, 6],
    22: [8, 8],
    23: [2, 2, 1, 1, 1, 1, 1, 1, 2, 4],
    24: [2, 2, 2, 2, 2, 2, 2, 2],
    25: [1, 1, 2, 2, 4, 6],
    26: [1, 1, 2, 2, 4, 6],
    27: [1, 1, 1, 1, 1, 1, 4, 6],
    28: [1, 1, 2, 2, 4, 6],
    29: [1, 1, 1, 1, 2, 2, 2, 2, 1, 1, 1, 1],
}
# RRTM 16-point quadrature weights (rrtmg_sw_init.f90:363-368)
WT = np.array([
    0.1527534276, 0.1491729617, 0.1420961469, 0.1316886544, 0.1181945205,
    0.1019300893, 0.0832767040, 0.0626720116, 0.0424925000, 0.0046269894,
    0.0038279891, 0.0030260086, 0.0022199750, 0.0014140010, 0.0005330000,
    0.0000750000,
])
# band wavenumber bounds [cm-1] (rrsw_wvn / rrtmg docs, bands 16..29)
WAVENUM = [
    (2600, 3250), (3250, 4000), (4000, 4650), (4650, 5150), (5150, 6150),
    (6150, 7700), (7700, 8050), (8050, 12850), (12850, 16000),
    (16000, 22650), (22650, 29000), (29000, 38000), (38000, 50000),
    (820, 2600),
]

_NUM = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?(?=_rb)")
_ASSIGN = re.compile(r"^\s*(\w+)\(([^)]*)\)\s*=\s*\(/", re.M)
_SCALAR = re.compile(r"^\s*(\w+)\s*=\s*([+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?)_rb\s*$", re.M)


def _floats(text: str) -> np.ndarray:
    return np.array([float(m.group(0).replace("d", "e").replace("D", "E"))
                     for m in _NUM.finditer(text)])


def _parse_block(text: str):
    """All array assignments `name(idx) = (/ ... /)` and scalars."""
    # drop comment lines (some contain stray "/)" that would truncate
    # the value scan, e.g. sw_kgb26's commented-out sfluxrefo)
    text = "\n".join(l for l in text.splitlines() if not l.lstrip().startswith("!"))
    arrays: dict = {}
    for m in _ASSIGN.finditer(text):
        name = m.group(1)
        idx = tuple(s.strip() for s in m.group(2).split(","))
        end = text.index("/)", m.end())
        vals = _floats(text[m.end():end])
        arrays.setdefault(name, []).append((idx, vals))
    scalars = {m.group(1): float(m.group(2).replace("d", "e"))
               for m in _SCALAR.finditer(text)}
    return arrays, scalars


def _assemble(entries) -> np.ndarray:
    """Build an ndarray from slice assignments (one ':' per entry)."""
    rank = len(entries[0][0])
    vec_dim = entries[0][0].index(":")
    vec_len = len(entries[0][1])
    fixed = [d for d in range(rank) if d != vec_dim]
    lo = {d: min(int(e[0][d]) for e in entries) for d in fixed}
    hi = {d: max(int(e[0][d]) for e in entries) for d in fixed}
    shape = [0] * rank
    shape[vec_dim] = vec_len
    for d in fixed:
        shape[d] = hi[d] - lo[d] + 1
    out = np.full(shape, np.nan)
    for idx, vals in entries:
        assert len(vals) == vec_len, (idx, len(vals), vec_len)
        sl = tuple(slice(None) if d == vec_dim else int(idx[d]) - lo[d]
                   for d in range(rank))
        out[sl] = vals
    assert np.isfinite(out).all(), "missing assignments"
    return out


# names whose g axis is the LAST dimension (all others: first/only)
_G_LAST = {"kao", "kbo", "selfrefo", "forrefo"}
# solar sources combine unweighted (sum); everything else rwgt-weighted
_RAW_SUM = {"sfluxrefo"}


def _reduce_band(band: int, arrays: dict, scalars: dict) -> dict:
    ngn = NGN[band]
    groups = []
    i = 0
    for n in ngn:
        groups.append(list(range(i, i + n)))
        i += n
    assert i == 16

    out = dict(scalars)
    for name, entries in arrays.items():
        arr = _assemble(entries)
        g_axis = arr.ndim - 1 if name in _G_LAST else 0
        arr = np.moveaxis(arr, g_axis, -1)  # (..., 16)
        assert arr.shape[-1] == 16, (name, arr.shape)
        cols = []
        for grp in groups:
            if name in _RAW_SUM:
                cols.append(arr[..., grp].sum(-1))
            else:
                rw = WT[grp] / WT[grp].sum()
                cols.append((arr[..., grp] * rw).sum(-1))
        red = np.stack(cols, axis=-1)
        red = np.moveaxis(red, -1, g_axis)
        out[name[:-1] if name.endswith("o") else name] = red
    return out


def extract(ref_root: str) -> dict:
    kg = open(os.path.join(ref_root, "rrtmg/rrtm_sw/rrtmg_sw_k_g.f90")).read()
    store: dict = {}
    for bi, band in enumerate(range(16, 30)):
        m = re.search(rf"subroutine sw_kgb{band}\b(.*?)end subroutine", kg, re.S)
        assert m, band
        arrays, scalars = _parse_block(m.group(1))
        red = _reduce_band(band, arrays, scalars)
        for k, v in red.items():
            store[f"b{band}/{k}"] = np.asarray(v, np.float32)
        store[f"b{band}/wavenum"] = np.asarray(WAVENUM[bi], np.float32)

    setcoef = open(
        os.path.join(ref_root, "rrtmg/rrtm_sw/rrtmg_sw_setcoef.f90")
    ).read()
    arrays, _ = _parse_block(setcoef)
    for name in ("pref", "preflog", "tref"):
        store[name] = np.asarray(_assemble(arrays[name]), np.float64)
    store["ngc"] = np.asarray(NGC, np.int32)
    return store


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "rrtmg", "rrtmg_sw_112.npz"))
    args = ap.parse_args()
    store = extract(args.ref)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **store)
    # each eta column of a 2-D sfluxref is a complete partition of the
    # band's solar source, so sum column 0 only
    tsi = 0.0
    for b in range(16, 30):
        sf = store[f"b{b}/sfluxref"]
        tsi += sf.sum() if sf.ndim == 1 else sf[:, 0].sum()
    print(f"wrote {args.out}: {len(store)} arrays, "
          f"total solar source {tsi:.2f} W/m2 (expect ~1366.4)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
