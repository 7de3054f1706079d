"""Fu ice-cloud optical properties.

Parity: reference `repwvl/fu_ice.F90` — the Fu (1996) solar and Fu et
al. (1998) thermal band parameterizations (`fu_ice_optprop_solar_index
:308`, `_thermal_index`), with the IFS/ecRad effective-diameter
conversion De = reff / 0.64952, plus the wavenumber-resolved
Fu-Muskatel table used by the ecCKD coupling.

Inputs follow this framework's cloud conventions: iwc in [g/m3],
reice in [um], dz in [m]; tau = kext * iwc * dz with kext in
[1/m per (g/m3)].
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_MAX_DE = 155.0  # um (reference MaxEffectiveRadius bound on De)
_MAX_G = 0.99

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "repwvl",
)


def _load():
    return np.load(os.path.join(_DIR, "fu_ice_general.npz"))


def fu_ice_coeffs(wvl_um: np.ndarray, solar: bool):
    """Band coefficients at the requested wavelengths (nearest band,
    like the reference's `find_real_location` + floor lookup)."""
    z = _load()
    if solar:
        wb = z["fu96_wvl"]
        idx = np.clip(np.searchsorted(wb, wvl_um) - 1, 0, wb.size - 1)
        return z["fu96_ext"][idx], z["fu96_ssa"][idx], z["fu96_asy"][idx], None
    wb = z["fu98_wvl"]
    idx = np.clip(np.searchsorted(wb, wvl_um) - 1, 0, wb.size - 1)
    return z["fu98_ext"][idx], None, z["fu98_asy"][idx], z["fu98_abs"][idx]


def fu_ice_optprop(wvl_um, reice_um, solar: bool) -> Tuple[np.ndarray, ...]:
    """(kext [1/m per g/m3], w0, g) with shapes (nwvl, *reice.shape).

    Solar: Fu96 eq. 3.9a-c; thermal: Fu98 (`fu_ice.F90:332-378,
    423-460`)."""
    wvl_um = np.atleast_1d(np.asarray(wvl_um, np.float64))
    de = np.minimum(np.asarray(reice_um, np.float64) / 0.64952, _MAX_DE)
    de = np.maximum(de, 1e-3)
    ext, ssa, asy, ab = fu_ice_coeffs(wvl_um, solar)
    sh = (wvl_um.size,) + (1,) * np.ndim(de)
    deb = de[None]

    def poly3(c):
        c = c.reshape(c.shape[:1] + (1,) * np.ndim(de) + (4,))
        return c[..., 0] + deb * (c[..., 1] + deb * (c[..., 2] + deb * c[..., 3]))

    if solar:
        kext = ext[:, 0].reshape(sh) + ext[:, 1].reshape(sh) / deb
        w0 = 1.0 - poly3(ssa)
    else:
        inv = 1.0 / deb
        kext = (ext[:, 0].reshape(sh)
                + inv * (ext[:, 1].reshape(sh) + inv * ext[:, 2].reshape(sh)))
        w0 = 1.0 - inv * poly3(ab)
    g = np.minimum(poly3(asy), _MAX_G)
    return np.maximum(kext, 0.0), np.clip(w0, 0.0, 1.0), np.clip(g, 0.0, _MAX_G)
