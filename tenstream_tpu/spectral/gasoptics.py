"""Gas optics backends: per-g-point optical properties of the gas column.

Parity: reference spectral integration backends — RRTMG correlated-k
(140 LW + 112 SW g-points, `rrtmg/`), ecCKD (`ecckd/`) and representative
wavelengths (`repwvl/`), all dispatched through a common facade
(`specint/specint_pprts.F90:163-210`).

TPU-first: a backend returns WHOLE TENSORS over (ngpt, nlay[, nx, ny]) in
one call — tables are gathered/interpolated for all g-points and all
cells at once, and the band loop of the reference
(`rrtmg/rrtmg/pprts_rrtmg.F90:214-268`) becomes a batched solve.

Backends in this module:
  * `GrayGasOptics`  — one gray g-point per spectral region (smoke tests)
  * `SyntheticCKD`   — a structured correlated-k model with
    Malkmus-band-style k-distributions for H2O/CO2/O3 with
    pressure/temperature scaling.  It reproduces the SHAPE of a real CKD
    scheme (bands x g-points, Planck fractions, solar source weights) so
    the whole spectral pipeline and its performance are real; the
    spectroscopy itself is a placeholder until the RRTMG k-table port
    (data extraction from `rrtmg/rrtm_sw/rrtmg_sw_k_g.f90` etc.) lands.

All backends return layer optical depths for the GAS only; cloud and
aerosol optics are merged by the specint driver.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import PI, SOLAR_CONSTANT, STEFAN_BOLTZMANN, ireals
from tenstream_tpu.ops.planck import planck_radiance_wavenumber


class SpectralOptProps(NamedTuple):
    """Per-gpoint gas optical properties.

    tau:    (ngpt, nlay, ...) gas optical depth
    w0:     (ngpt, nlay, ...) single-scatter albedo (Rayleigh)
    g:      (ngpt, nlay, ...) asymmetry (0 for gas)
    weight: (ngpt,) TOA solar flux [W/m2] per gpt (solar) or band Planck
            fraction weights (thermal)
    planck: optional (ngpt, nlev, ...) Planck radiance per gpt [W/m2/sr]
    planck_srfc: optional (ngpt, ...) surface Planck radiance per gpt
    """

    tau: jnp.ndarray
    w0: jnp.ndarray
    g: jnp.ndarray
    weight: jnp.ndarray
    planck: Optional[jnp.ndarray] = None
    planck_srfc: Optional[jnp.ndarray] = None


def rayleigh_optical_depth(plev_pa: np.ndarray, wavelength_um: float) -> np.ndarray:
    """Per-layer Rayleigh scattering optical depth (Bodhaine-style fit;
    parity: `repwvl/rayleigh.F90`)."""
    lam = wavelength_um
    # total column tau at p0 (Hansen & Travis style approximation)
    tau_total = 0.008569 * lam**-4 * (1.0 + 0.0113 * lam**-2 + 0.00013 * lam**-4)
    dp = (plev_pa[1:] - plev_pa[:-1]) / 101325.0
    return tau_total * dp


@dataclass
class GrayGasOptics:
    """Single gray g-point per spectral region."""

    tau_solar_column: float = 0.2
    tau_thermal_column: float = 4.0

    n_gpt_solar = 1
    n_gpt_thermal = 1

    def solar(self, atm: Atmosphere) -> SpectralOptProps:
        dp = (atm.plev[1:] - atm.plev[:-1]) / (atm.plev[-1] - atm.plev[0])
        tau = jnp.asarray(self.tau_solar_column * dp, ireals)[None]
        ray = jnp.asarray(rayleigh_optical_depth(atm.plev, 0.55), ireals)[None]
        tau_tot = tau + ray
        w0 = ray / jnp.maximum(tau_tot, 1e-30)
        return SpectralOptProps(
            tau=tau_tot,
            w0=w0,
            g=jnp.zeros_like(tau_tot),
            weight=jnp.asarray([SOLAR_CONSTANT], ireals),
        )

    def thermal(self, atm: Atmosphere) -> SpectralOptProps:
        dp = (atm.plev[1:] - atm.plev[:-1]) / (atm.plev[-1] - atm.plev[0])
        tau = jnp.asarray(self.tau_thermal_column * dp, ireals)[None]
        B = STEFAN_BOLTZMANN * jnp.asarray(atm.tlev, ireals) ** 4 / PI
        return SpectralOptProps(
            tau=tau,
            w0=jnp.zeros_like(tau),
            g=jnp.zeros_like(tau),
            weight=jnp.asarray([1.0], ireals),
            planck=B[None],
        )


# ---------------------------------------------------------------------------
# Synthetic correlated-k scheme
# ---------------------------------------------------------------------------

# (band lo, band hi [cm-1], active gas, band-mean mass absorption strength
#  [m2/kg] at reference conditions, k-distribution log-width)
_SW_BANDS = [
    (2600.0, 3250.0, "h2o", 2e-2, 2.5),
    (3250.0, 4000.0, "h2o", 5e-2, 2.5),
    (4000.0, 4650.0, "h2o", 3e-2, 2.5),
    (4650.0, 5150.0, "co2", 2e-2, 2.0),
    (5150.0, 6150.0, "h2o", 8e-2, 2.5),
    (6150.0, 7700.0, "h2o", 2e-2, 2.5),
    (7700.0, 8050.0, "h2o", 1e-2, 2.0),
    (8050.0, 12850.0, "h2o", 4e-3, 2.0),
    (12850.0, 16000.0, "h2o", 1e-3, 1.5),
    (16000.0, 22650.0, "o3", 1e-1, 1.0),
    (22650.0, 29000.0, "o3", 5e-1, 1.0),
    (29000.0, 38000.0, "o3", 5e1, 1.0),
    (38000.0, 50000.0, "o3", 5e2, 1.0),
    (820.0, 2600.0, "h2o", 2e-1, 2.5),
]

_LW_BANDS = [
    (10.0, 350.0, "h2o", 5e0, 2.5),
    (350.0, 500.0, "h2o", 2e0, 2.5),
    (500.0, 630.0, "h2o", 5e-1, 2.5),
    (630.0, 700.0, "co2", 3e1, 2.0),
    (700.0, 820.0, "co2", 8e0, 2.0),
    (820.0, 980.0, "h2o", 2e-2, 2.0),
    (980.0, 1080.0, "o3", 2e1, 1.5),
    (1080.0, 1180.0, "h2o", 3e-2, 2.0),
    (1180.0, 1390.0, "h2o", 3e-1, 2.5),
    (1390.0, 1480.0, "h2o", 3e0, 2.5),
    (1480.0, 1800.0, "h2o", 8e0, 2.5),
    (1800.0, 2080.0, "h2o", 1e0, 2.5),
    (2080.0, 2250.0, "h2o", 5e-1, 2.0),
    (2250.0, 2380.0, "co2", 1e1, 2.0),
    (2380.0, 2600.0, "h2o", 2e-1, 2.0),
    (2600.0, 3250.0, "h2o", 1e-1, 2.5),
]

_MOLMASS = {"h2o": 18.0153e-3, "co2": 44.01e-3, "o3": 47.998e-3, "o2": 32.0e-3,
            "ch4": 16.04e-3, "n2o": 44.013e-3}


@dataclass
class SyntheticCKD:
    """Correlated-k with Malkmus-style g-point distributions.

    Each band gets `n_gpt_per_band` Gauss-Legendre g-points; the
    absorption coefficient at cumulative probability point g is
    k(g) = k_mean * exp(sigma * probit-ish spread), with linear pressure
    scaling (collision broadening) and a weak T dependence.  The solar
    source per g-point is the 5777 K Planck fraction of the band; thermal
    Planck radiances are band-integrated at the local temperature.
    """

    n_gpt_per_band: int = 8

    @property
    def n_gpt_solar(self) -> int:
        return len(_SW_BANDS) * self.n_gpt_per_band

    @property
    def n_gpt_thermal(self) -> int:
        return len(_LW_BANDS) * self.n_gpt_per_band

    def _gpt_nodes(self):
        x, w = np.polynomial.legendre.leggauss(self.n_gpt_per_band)
        return 0.5 * (x + 1.0), 0.5 * w  # nodes/weights on (0,1)

    def _band_tau(self, atm: Atmosphere, bands):
        """(ngpt, nlay, ...) tau and (ngpt,) quad weights + band ids."""
        gnodes, gweights = self._gpt_nodes()
        # layer gas mass paths [kg/m2]
        nmol = atm.air_molecules_per_m2()  # (nlay, ...)
        taus, weights, bidx = [], [], []
        p_scale = np.clip(atm.play / 5e4, 0.05, 2.0)
        t_scale = np.clip(atm.tlay / 250.0, 0.5, 2.0) ** 0.5
        for ib, (lo, hi, gas, kmean, sigma) in enumerate(bands):
            vmr = atm.gases.get(gas, np.zeros_like(atm.play))
            mpath = nmol * vmr * _MOLMASS[gas] / 6.02214076e23  # kg/m2
            for gi, (gn, gw) in enumerate(zip(gnodes, gweights)):
                # log-spaced k across the distribution: quantile mapping
                spread = np.exp(sigma * (2.0 * gn - 1.0) * 2.0)
                k = kmean * spread * p_scale * t_scale
                taus.append(k * mpath)
                weights.append(gw)
                bidx.append(ib)
        return (
            np.stack(taus, 0).astype(np.float32),
            np.asarray(weights, np.float32),
            np.asarray(bidx, np.int32),
        )

    def solar(self, atm: Atmosphere) -> SpectralOptProps:
        tau, qw, bidx = self._band_tau(atm, _SW_BANDS)
        # solar flux per band: 5777 K Planck fraction of the solar constant
        T_sun = 5777.0
        bb = np.array(
            [float(planck_radiance_wavenumber(lo, hi, T_sun)) for lo, hi, *_ in _SW_BANDS]
        )
        frac = bb / bb.sum()
        w = (SOLAR_CONSTANT * frac[bidx] * qw).astype(np.float32)
        # Rayleigh per band at the band-center wavelength
        ray = np.stack(
            [
                rayleigh_optical_depth(atm.plev, 1e4 / (0.5 * (lo + hi)))
                for lo, hi, *_ in _SW_BANDS
            ],
            0,
        )[bidx].astype(np.float32)
        tau_tot = tau + ray
        w0 = ray / np.maximum(tau_tot, 1e-30)
        z = jnp.zeros_like(jnp.asarray(tau_tot, ireals))
        return SpectralOptProps(
            tau=jnp.asarray(tau_tot, ireals),
            w0=jnp.asarray(w0, ireals),
            g=z,
            weight=jnp.asarray(w, ireals),
        )

    def thermal(self, atm: Atmosphere) -> SpectralOptProps:
        tau, qw, bidx = self._band_tau(atm, _LW_BANDS)
        planck_bands = np.stack(
            [
                np.asarray(planck_radiance_wavenumber(lo, hi, jnp.asarray(atm.tlev, ireals)))
                for lo, hi, *_ in _LW_BANDS
            ],
            0,
        )  # (nband, nlev, ...)
        planck = (planck_bands[bidx].T * qw).T.astype(np.float32)
        z = jnp.zeros_like(jnp.asarray(tau, ireals))
        return SpectralOptProps(
            tau=jnp.asarray(tau, ireals),
            w0=z,
            g=z,
            weight=jnp.asarray(qw, ireals),
            planck=jnp.asarray(planck, ireals),
        )


def cloud_optprops(
    lwc_gm3: jnp.ndarray, reff_um: jnp.ndarray, dz_m: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Water-cloud optical properties from LWC and effective radius.

    Geometric-optics limit (parity: the mie tables of
    `repwvl/mie_tables.F90` / `ecckd` droplet tables):
      tau = 3 LWP / (2 rho_w reff),  w0 ~ 1, g ~ 0.86.
    """
    lwp = lwc_gm3 * 1e-3 * dz_m  # kg/m2
    reff = jnp.maximum(reff_um, 2.0) * 1e-6
    tau = 1.5 * lwp / (1000.0 * reff)
    w0 = jnp.full_like(tau, 0.9985)
    g = jnp.full_like(tau, 0.86)
    return tau, w0, g
