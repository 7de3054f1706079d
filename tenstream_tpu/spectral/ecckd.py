"""ecCKD gas optics backend: the reference's modern correlated-k scheme.

Parity: reference `ecckd/ecckd_base.F90` (table loading),
`ecckd/ecckd_optprop.F90` (`ecckd_dtau`:290 — per-gas molar absorption
interpolated bilinearly in (log p, T) with concentration-dependence codes
None/Linear/RelativeLinear/LUT; `ecckd_planck`:~460 — Planck flux table
over temperature, returned / pi as radiance) and the `ecckd_pprts` driver.

Tables come from `data/ecckd/*.npz`, extracted from the ecCKD 1.0
CKD-definition NetCDF files (R. Hogan / ECMWF) vendored by the reference
(`ecckd/data/`); see `tools/extract_ecckd.py` for provenance.

TPU-first: the whole (gpt, layer) tau tensor is built in one vectorized
pass instead of the reference's per-(cell, gpt) scalar calls.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import GRAV, PI, ireals
from tenstream_tpu.spectral.gasoptics import SpectralOptProps

MOLMASS_AIR = 28.9644e-3  # [kg/mol] (reference MOLMASSAIR)

# conc dependence codes (reference ecckd_base.F90:77-80:
# None=0, Linear=1, LUT=2, RelativeLinear=3)
_NONE, _LINEAR, _LUT, _RELATIVE_LINEAR = 0, 1, 2, 3

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data", "ecckd")


def _frac_index(grid: np.ndarray, x: np.ndarray):
    i = np.clip(np.searchsorted(grid, x, side="right") - 1, 0, len(grid) - 2)
    w = (x - grid[i]) / (grid[i + 1] - grid[i])
    return i, np.clip(w, 0.0, 1.0)


@dataclass
class _CkdTables:
    z: Dict[str, np.ndarray]

    @property
    def ngpt(self) -> int:
        return self.z["composite_mabs"].shape[-1]


@lru_cache(maxsize=8)
def _load(kind: str, n_gpt: int, data_dir: str) -> _CkdTables:
    name = {
        ("sw", 16): "ecckd-1.0_sw_climate_rgb-16.npz",
        ("sw", 32): "ecckd-1.0_sw_climate_rgb-32.npz",
        ("lw", 16): "ecckd-1.0_lw_climate_fsck-16.npz",
        ("lw", 32): "ecckd-1.0_lw_climate_fsck-32.npz",
    }[(kind, n_gpt)]
    path = os.path.join(data_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — run tools/extract_ecckd.py to generate the "
            "ecCKD table artifacts"
        )
    return _CkdTables(dict(np.load(path, allow_pickle=True)))


class EcckdGasOptics:
    """Drop-in gas-optics backend for `specint_pprts(specint='ecckd')`."""

    def __init__(self, n_gpt: int = 32, data_dir: Optional[str] = None):
        self.n_gpt = n_gpt
        self.data_dir = os.path.abspath(data_dir or _DEFAULT_DIR)

    # -- core tau computation -------------------------------------------
    def _gas_tau(self, tb: _CkdTables, atm: Atmosphere) -> np.ndarray:
        """(ngpt, nlay[, nx, ny]) gas optical depth (reference
        `ecckd_dtau`).  Per-(x, y)-column atmospheres flatten to pseudo
        columns through the same interpolation."""
        z = tb.z
        play = np.asarray(atm.play, np.float64)
        grid_shape = play.shape  # (nlay[, nx, ny])
        play = play.ravel()
        tlay = np.asarray(atm.tlay, np.float64).ravel()
        dP = np.asarray(atm.plev[1:] - atm.plev[:-1], np.float64).ravel()  # >0 TOA->sfc
        M = play.shape[0]

        def flat_gas(gas, default=0.0):
            v = atm.gases.get(gas)
            if v is None:
                return np.full(M, default, np.float64)
            return np.broadcast_to(
                np.asarray(v, np.float64).reshape(
                    (grid_shape[0],) + (1,) * (len(grid_shape) - 1)
                ) if np.asarray(v).ndim == 1 else np.asarray(v, np.float64),
                grid_shape,
            ).ravel()

        logp = np.log(z["pressure"])  # (53,)
        ip, wp = _frac_index(logp, np.log(np.clip(play, z["pressure"][0], z["pressure"][-1])))

        # temperature grid depends on the pressure index (reference uses
        # the ip0 row): (6, 53) -> per-layer rows
        tgrid = z["temperature"][:, ip]  # (6, M)
        it = np.clip((tgrid <= tlay[None, :]).sum(0) - 1, 0, tgrid.shape[0] - 2)
        t0 = np.take_along_axis(tgrid, it[None], 0)[0]
        t1 = np.take_along_axis(tgrid, (it + 1)[None], 0)[0]
        wt = np.clip((tlay - t0) / np.maximum(t1 - t0, 1e-30), 0.0, 1.0)

        mult = dP / (MOLMASS_AIR * GRAV)  # [mol/m2]

        def interp_pt(mabs):  # mabs (6, 53, ngpt) -> (M, ngpt)
            v00 = mabs[it, ip]
            v01 = mabs[it, ip + 1]
            v10 = mabs[it + 1, ip]
            v11 = mabs[it + 1, ip + 1]
            w = wp[:, None]
            return (1 - wt[:, None]) * ((1 - w) * v00 + w * v01) + wt[:, None] * (
                (1 - w) * v10 + w * v11
            )

        def interp_pt_4(mabs4, icsel):  # mabs4 (12, 6, 53, ngpt)
            sel = mabs4[icsel]  # (M, 6, 53, ngpt)
            v00 = sel[np.arange(M), it, ip]
            v01 = sel[np.arange(M), it, ip + 1]
            v10 = sel[np.arange(M), it + 1, ip]
            v11 = sel[np.arange(M), it + 1, ip + 1]
            w = wp[:, None]
            return (1 - wt[:, None]) * ((1 - w) * v00 + w * v01) + wt[:, None] * (
                (1 - w) * v10 + w * v11
            )

        tau = np.zeros((M, tb.ngpt))
        for gas in z["gases"]:
            gas = str(gas)
            code = int(z[f"{gas}_code"])
            mabs = z[f"{gas}_mabs"]
            if code == _NONE:
                tau += mult[:, None] * interp_pt(mabs)
            elif code == _LINEAR:
                vmr = flat_gas(gas)
                tau += (mult * vmr)[:, None] * interp_pt(mabs)
            elif code == _RELATIVE_LINEAR:
                vmr = flat_gas(gas)
                ref = float(z[f"{gas}_ref_vmr"])
                tau += (mult * (vmr - ref))[:, None] * interp_pt(mabs)
            elif code == _LUT:
                vmr = flat_gas(gas, default=1e-9)
                frac_grid = np.log(z[f"{gas}_mole_fraction"])  # (12,)
                ic, wc = _frac_index(frac_grid, np.log(np.clip(vmr, np.exp(frac_grid[0]), np.exp(frac_grid[-1]))))
                lo = interp_pt_4(mabs, ic)
                hi = interp_pt_4(mabs, ic + 1)
                tau += (mult * vmr)[:, None] * ((1 - wc[:, None]) * lo + wc[:, None] * hi)

        tau = np.maximum(tau, 0.0)
        return np.moveaxis(tau.reshape(grid_shape + (tb.ngpt,)), -1, 0)

    # -- public API ------------------------------------------------------
    @property
    def n_gpt_solar(self) -> int:
        return self.n_gpt

    @property
    def n_gpt_thermal(self) -> int:
        return self.n_gpt

    def solar(self, atm: Atmosphere) -> SpectralOptProps:
        tb = _load("sw", self.n_gpt, self.data_dir)
        tau_gas = self._gas_tau(tb, atm)
        # Rayleigh: molar scattering coefficient per gpt [m2/mol]
        moles = (np.asarray(atm.plev[1:] - atm.plev[:-1], np.float64)) / (MOLMASS_AIR * GRAV)
        coeff = tb.z["rayleigh_molar_scattering_coeff"]
        tau_ray = coeff.reshape((tb.ngpt,) + (1,) * moles.ndim) * moles[None]
        tau = tau_gas + tau_ray
        w0 = tau_ray / np.maximum(tau, 1e-30)
        return SpectralOptProps(
            tau=jnp.asarray(tau, ireals),
            w0=jnp.asarray(w0, ireals),
            g=jnp.zeros_like(jnp.asarray(tau, ireals)),
            weight=jnp.asarray(tb.z["solar_irradiance"], ireals),
        )

    # -- per-gpoint cloud optics ----------------------------------------
    @lru_cache(maxsize=4)
    def _cloud_tables(self, kind: str):
        """(reff_grid, kext, w0, g) with spectral shape (ngpt, nreff).

        Parity: reference ecckd cloud optics from the Mie droplet table
        spectrally averaged with `gpoint_fraction`
        (`ecckd/ecckd_optprop.F90:181-288`).  Averages use extinction
        (and scattering) weighting: w0_g = <k w0>/<k>, g_g = <k w0 g>/<k w0>.
        """
        tb = _load(kind, self.n_gpt, self.data_dir)
        mie = np.load(os.path.join(self.data_dir, "mie_droplet_scattering.npz"))
        wvn_mid = 0.5 * (tb.z["wavenumber1"] + tb.z["wavenumber2"])  # (nint,)
        gfrac = tb.z["gpoint_fraction"]  # (ngpt, nint)
        wnorm = gfrac / np.maximum(gfrac.sum(1, keepdims=True), 1e-30)

        mw = mie["wavenumber"]
        order = np.argsort(mw)

        def onto_intervals(arr2):  # (nreff, n_mie_wvn) -> (nreff, nint)
            return np.stack(
                [np.interp(wvn_mid, mw[order], row[order]) for row in arr2], 0
            )

        kext = onto_intervals(mie["mass_extinction_coefficient"])
        w0 = onto_intervals(mie["single_scattering_albedo"])
        g = onto_intervals(mie["asymmetry_factor"])

        kext_g = wnorm @ kext.T  # (ngpt, nreff)
        ksca_g = wnorm @ (kext * w0).T
        kscg_g = wnorm @ (kext * w0 * g).T
        w0_g = ksca_g / np.maximum(kext_g, 1e-30)
        g_g = kscg_g / np.maximum(ksca_g, 1e-30)
        return (
            mie["effective_radius"] * 1e6,  # [um]
            kext_g.astype(np.float32),
            w0_g.astype(np.float32),
            g_g.astype(np.float32),
        )

    def cloud_optprops_gpt(self, kind: str, lwc_gm3, reff_um, dz_m, gsel: slice = slice(None)):
        """Per-gpoint water-cloud (tau, w0, g), shapes (ngpt, *grid)."""
        reff_grid, kext_g, w0_g, g_g = self._cloud_tables(kind)
        lwp = jnp.asarray(lwc_gm3, ireals) * 1e-3 * jnp.asarray(dz_m, ireals)  # kg/m2
        from tenstream_tpu.ops.interp import fractional_index

        fr = fractional_index(jnp.asarray(reff_grid, ireals), jnp.asarray(reff_um, ireals))
        i0 = jnp.clip(jnp.floor(fr), 0, len(reff_grid) - 2).astype(jnp.int32)
        w = (fr - i0)[None]

        def gi(tbl):
            t = jnp.asarray(tbl, ireals)[gsel]
            return t[:, i0] * (1 - w) + t[:, i0 + 1] * w  # (ngpt_sel, *grid)

        tau = gi(kext_g) * lwp[None]
        return tau, gi(w0_g), gi(g_g)

    def _ice_tables(self, kind: str):
        """(reff_grid [um], kext, w0, g) per gpt from the Fu-Muskatel
        rough-ice table, spectrally averaged with `gpoint_fraction`
        exactly like the droplet path (`_cloud_tables`)."""
        cache = getattr(self, "_ice_cache", {})
        if kind in cache:
            return cache[kind]
        tb = _load(kind, self.n_gpt, self.data_dir)
        mie = np.load(os.path.join(self.data_dir, "fu-muskatel-rough_ice_scattering.npz"))
        wvn_mid = 0.5 * (tb.z["wavenumber1"] + tb.z["wavenumber2"])
        gfrac = tb.z["gpoint_fraction"]
        wnorm = gfrac / np.maximum(gfrac.sum(1, keepdims=True), 1e-30)

        mw = mie["wavenumber"]
        order = np.argsort(mw)

        def onto(arr2):
            return np.stack(
                [np.interp(wvn_mid, mw[order], row[order]) for row in arr2], 0
            )

        kext = onto(mie["mass_extinction_coefficient"])
        w0 = onto(mie["single_scattering_albedo"])
        g = onto(mie["asymmetry_factor"])
        kext_g = wnorm @ kext.T
        ksca_g = wnorm @ (kext * w0).T
        kscg_g = wnorm @ (kext * w0 * g).T
        w0_g = ksca_g / np.maximum(kext_g, 1e-30)
        g_g = kscg_g / np.maximum(ksca_g, 1e-30)
        out = (
            mie["effective_radius"] * 1e6,
            kext_g.astype(np.float32), w0_g.astype(np.float32),
            g_g.astype(np.float32),
        )
        cache[kind] = out
        self._ice_cache = cache
        return out

    def ice_optprops_gpt(self, kind: str, iwc_gm3, reice_um, dz_m, gsel: slice = slice(None)):
        """Per-gpoint ice-cloud (tau, w0, g), shapes (ngpt, *grid)."""
        reff_grid, kext_g, w0_g, g_g = self._ice_tables(kind)
        iwp = jnp.asarray(iwc_gm3, ireals) * 1e-3 * jnp.asarray(dz_m, ireals)  # kg/m2
        from tenstream_tpu.ops.interp import fractional_index

        fr = fractional_index(jnp.asarray(reff_grid, ireals), jnp.asarray(reice_um, ireals))
        i0 = jnp.clip(jnp.floor(fr), 0, len(reff_grid) - 2).astype(jnp.int32)
        w = (fr - i0)[None]

        def gi(tbl):
            t = jnp.asarray(tbl, ireals)
            return t[:, i0] * (1 - w) + t[:, i0 + 1] * w

        tau = gi(kext_g) * iwp[None]
        return tau, gi(w0_g), gi(g_g)

    def planck_at(self, T) -> np.ndarray:
        """Per-g-point Planck emission [W/m2/sr] at temperature(s) `T`
        (scalar or array), shape (ngpt,) + shape(T).

        Parity: reference `ecckd_planck` (`ecckd/ecckd_optprop.F90`), used
        per band to set building-face emission
        (`ecckd/ecckd_pprts.F90:404-412`)."""
        tb = _load("lw", self.n_gpt, self.data_dir)
        tp = tb.z["temperature_planck"]  # (231,)
        pf = tb.z["planck_function"]  # (231, ngpt) [W/m2]
        Ta = np.asarray(T, np.float64)
        shape = Ta.shape
        itv, wtv = _frac_index(tp, np.clip(Ta.ravel(), tp[0], tp[-1]))
        B = ((1 - wtv[:, None]) * pf[itv] + wtv[:, None] * pf[itv + 1]) / PI
        return np.moveaxis(B.reshape(shape + (tb.ngpt,)), -1, 0).astype(np.float32)

    def thermal(self, atm: Atmosphere) -> SpectralOptProps:
        tb = _load("lw", self.n_gpt, self.data_dir)
        tau = self._gas_tau(tb, atm)
        tp = tb.z["temperature_planck"]  # (231,)
        pf = tb.z["planck_function"]  # (231, ngpt) [W/m2]
        tlev = np.asarray(atm.tlev, np.float64)
        lev_shape = tlev.shape
        itv, wtv = _frac_index(tp, np.clip(tlev.ravel(), tp[0], tp[-1]))
        planck = ((1 - wtv[:, None]) * pf[itv] + wtv[:, None] * pf[itv + 1]) / PI
        planck = np.moveaxis(planck.reshape(lev_shape + (tb.ngpt,)), -1, 0)
        z = jnp.zeros_like(jnp.asarray(tau, ireals))
        return SpectralOptProps(
            tau=jnp.asarray(tau, ireals),
            w0=z,
            g=z,
            weight=jnp.ones((tb.ngpt,), ireals),
            planck=jnp.asarray(planck, ireals),  # (ngpt, nlev[, nx, ny])
        )
