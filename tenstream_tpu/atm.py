"""Atmosphere input layer: background profiles, grid merging, heating rates.

Parity: reference `src/tenstr_atm.F90` (`setup_tenstr_atm`:136,
`load_atmfile`:776, `merge_dyn_rad_grid`:403, `hydrostat_lev`:875,
`abso2hr`:999).  The reference reads libRadtran background-profile ASCII
files (z, p, T, air, o3, o2, h2o, co2, no2 columns); those data files are
not vendored, so this module generates the background from the analytic
U.S. Standard Atmosphere 1976 plus standard trace-gas profile shapes.
A `load_atmfile` for the same ASCII format is provided for users who have
libRadtran profiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import CP_DRY_AIR, GRAV, K_BOLTZMANN, R_DRY_AIR, ireals

# U.S. Standard Atmosphere 1976 layer structure (geopotential km, lapse K/km)
_USSA_H = np.array([0.0, 11.0, 20.0, 32.0, 47.0, 51.0, 71.0, 84.852])
_USSA_LAPSE = np.array([-6.5, 0.0, 1.0, 2.8, 0.0, -2.8, -2.0])
_T0 = 288.15
_P0 = 101325.0


def us_standard_atmosphere(z_m: np.ndarray) -> Dict[str, np.ndarray]:
    """Analytic USSA76 p [Pa], T [K], air number density [1/m3] at z [m]."""
    z = np.asarray(z_m, np.float64) / 1000.0
    T = np.empty_like(z)
    p = np.empty_like(z)
    Tb, pb = _T0, _P0
    bounds = _USSA_H
    for i, zi in enumerate(z):
        Tb, pb = _T0, _P0
        for b in range(len(_USSA_LAPSE)):
            h0, h1, L = bounds[b], bounds[b + 1], _USSA_LAPSE[b]
            htop = min(zi, h1)
            dh = max(htop - h0, 0.0)
            if dh > 0:
                Tn = Tb + L * dh
                if abs(L) > 1e-12:
                    pn = pb * (Tn / Tb) ** (-GRAV / (R_DRY_AIR * L * 1e-3))
                else:
                    pn = pb * np.exp(-GRAV * dh * 1000.0 / (R_DRY_AIR * Tb))
                Tb, pb = Tn, pn
            if zi <= h1:
                break
        T[i] = Tb
        p[i] = pb
    air = p / (K_BOLTZMANN * T)
    return {"z": np.asarray(z_m, np.float64), "p": p, "T": T, "air": air}


def standard_trace_gases(z_m: np.ndarray, p: np.ndarray) -> Dict[str, np.ndarray]:
    """Volume mixing ratios of the standard gases (approximate standard
    mid-latitude shapes; parity with the afglus column set)."""
    z = np.asarray(z_m, np.float64) / 1000.0
    co2 = np.full_like(z, 415e-6)
    o2 = np.full_like(z, 0.2095)
    ch4 = 1.8e-6 * np.exp(-np.maximum(z - 15.0, 0.0) / 30.0)
    n2o = 0.33e-6 * np.exp(-np.maximum(z - 12.0, 0.0) / 20.0)
    # water vapour: ~78% RH-ish exponential decay in the troposphere
    h2o = 7.8e-3 * np.exp(-z / 2.1)
    h2o = np.maximum(h2o, 3e-6)
    # ozone: Chapman-like layer peaked near 23 km
    o3 = 7.0e-6 * np.exp(-0.5 * ((z - 23.0) / 6.0) ** 2) + 3e-8
    return {"h2o": h2o, "co2": co2, "o3": o3, "o2": o2, "ch4": ch4, "n2o": n2o}


def load_atmfile(path: str) -> Dict[str, np.ndarray]:
    """Read a libRadtran background profile ASCII file
    (reference `load_atmfile`, `src/tenstr_atm.F90:776`:
    columns z[km] p[hPa] T[K] air[1/cm3] o3 o2 h2o co2 no2 [1/cm3])."""
    raw = np.loadtxt(path, comments="#")
    cols = ["z", "p", "T", "air", "o3", "o2", "h2o", "co2", "no2", "n2o", "ch4"]
    out = {}
    for i, c in enumerate(cols[: raw.shape[1]]):
        out[c] = raw[:, i]
    out["z"] = out["z"] * 1e3  # km -> m
    out["p"] = out["p"] * 1e2  # hPa -> Pa
    for gas in ("o3", "o2", "h2o", "co2", "no2", "n2o", "ch4"):
        if gas in out:
            out[gas] = out[gas] / out["air"]  # number density -> vmr
    out["air"] = out["air"] * 1e6  # 1/cm3 -> 1/m3
    return out


def hydrostat_lev(plev: np.ndarray, tlay: np.ndarray, z_srfc: float = 0.0) -> np.ndarray:
    """Hydrostatic level heights from pressure levels and layer temps
    (reference `hydrostat_lev`, `src/tenstr_atm.F90:875`).  plev/tlay
    ordered TOA..surface like the solver's z axis? No — input ordered
    surface..TOA ascending height; plev (N+1,), tlay (N,)."""
    z = np.empty(plev.shape[0])
    z[0] = z_srfc
    for k in range(tlay.shape[0]):
        rho = 0.5 * (plev[k] + plev[k + 1]) / (R_DRY_AIR * tlay[k])
        dz = (plev[k] - plev[k + 1]) / (rho * GRAV)
        z[k + 1] = z[k] + dz
    return z


@dataclass
class Atmosphere:
    """Merged dynamics+background column set for the spectral drivers.

    All arrays ordered TOA -> surface along axis 0 (solver z convention):
      plev, tlev, zlev: (Nz+1, ...) ; play, tlay, dz: (Nz, ...)
      gas vmr dicts: (Nz, ...)
    """

    plev: np.ndarray
    tlev: np.ndarray
    zlev: np.ndarray
    gases: Dict[str, np.ndarray]
    lwc: Optional[np.ndarray] = None  # cloud liquid water content [g/m3]
    reliq: Optional[np.ndarray] = None  # effective radius [um]
    iwc: Optional[np.ndarray] = None
    reice: Optional[np.ndarray] = None

    @property
    def play(self) -> np.ndarray:
        return 0.5 * (self.plev[:-1] + self.plev[1:])

    @property
    def tlay(self) -> np.ndarray:
        return 0.5 * (self.tlev[:-1] + self.tlev[1:])

    @property
    def dz(self) -> np.ndarray:
        return self.zlev[:-1] - self.zlev[1:]

    @property
    def nlay(self) -> int:
        return self.plev.shape[0] - 1

    def air_molecules_per_m2(self) -> np.ndarray:
        """Column air molecules per layer [1/m2] from hydrostatics
        (plev is ordered TOA -> surface, so plev[1:] > plev[:-1])."""
        AVOG = 6.02214076e23
        M_AIR = 28.9644e-3
        return (self.plev[1:] - self.plev[:-1]) / (GRAV * M_AIR) * AVOG

    def layer_air_density(self) -> np.ndarray:
        return self.play / (R_DRY_AIR * self.tlay)


def setup_standard_atmosphere(
    nlay: int = 40,
    ztop: float = 40e3,
    z_grid: Optional[np.ndarray] = None,
) -> Atmosphere:
    """Background atmosphere on a height grid, TOA->surface ordering."""
    if z_grid is None:
        # layer thicknesses in geometric progression, finest (~x20) near
        # the ground (LES-like), ordered TOA -> surface
        raw = np.geomspace(20.0, 1.0, nlay)
        dz = raw / raw.sum() * ztop
        zlev = ztop - np.concatenate([[0.0], np.cumsum(dz)])
        zlev[-1] = 0.0
    else:
        zlev = np.asarray(z_grid, np.float64)
    bg = us_standard_atmosphere(zlev)
    gases_lev = standard_trace_gases(zlev, bg["p"])
    gases = {k: 0.5 * (v[:-1] + v[1:]) for k, v in gases_lev.items()}
    return Atmosphere(plev=bg["p"], tlev=bg["T"], zlev=zlev, gases=gases)


def merge_dyn_rad_grid(
    atm_bg: Atmosphere,
    zlev_dyn: np.ndarray,
    tlev_dyn: np.ndarray,
) -> Tuple[Atmosphere, int]:
    """Stack the background atmosphere above the dynamics grid.

    Parity: `merge_dyn_rad_grid` (`src/tenstr_atm.F90:403`).  zlev_dyn is
    TOA->surface within the model domain; returns the merged column and
    the index where the dynamics grid starts.
    """
    z_top_dyn = float(np.max(zlev_dyn))
    keep = atm_bg.zlev > z_top_dyn + 1.0
    zlev = np.concatenate([atm_bg.zlev[keep], zlev_dyn])
    bg = us_standard_atmosphere(zlev)
    tlev = np.concatenate([atm_bg.tlev[keep], np.asarray(tlev_dyn)])
    gases_lev = standard_trace_gases(zlev, bg["p"])
    gases = {k: 0.5 * (v[:-1] + v[1:]) for k, v in gases_lev.items()}
    return (
        Atmosphere(plev=bg["p"], tlev=tlev, zlev=zlev, gases=gases),
        int(keep.sum()),
    )


def abso2hr(abso_w_m3: jnp.ndarray, play: jnp.ndarray, tlay: jnp.ndarray) -> jnp.ndarray:
    """Absorbed power density [W/m3] -> heating rate [K/day]
    (reference `abso2hr`, `src/tenstr_atm.F90:999`)."""
    rho = jnp.asarray(play, ireals) / (R_DRY_AIR * jnp.asarray(tlay, ireals))
    return abso_w_m3 / (rho * CP_DRY_AIR) * 86400.0
