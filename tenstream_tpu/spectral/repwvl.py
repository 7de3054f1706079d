"""repwvl: representative-wavelength spectral integration backend.

Parity: reference `repwvl/` — a small set of trained monochromatic
wavelengths with weights replaces the band/k-distribution loop
(`repwvl_base.F90` table layout, `repwvl_optprop.F90:repwvl_dtau:240`
cross-section interpolation, `rayleigh.F90` Bodhaine Rayleigh,
`repwvl_pprts.F90:405,606` thermal/solar weighting).

Tables come from `tools/extract_repwvl.py` (read straight from the
reference's netCDF4 files with the in-repo minimal HDF5 reader).

Conventions:
  * solar weights are TOA irradiances [W/m2] per wavelength
    (sum = 1368.6, the built-in solar constant);
  * thermal weights multiply the Planck spectral radiance; the stored
    weights are per-nm, so B_gpt = wgt * 1e-9 * B_lambda(wvl, T)
    [W/m2/sr] (validated: pi * sum = sigma*T^4 to 0.2% over
    220..310 K — the reference feeds the same product to its solver).
  * tracer order (tracernames): (H2O-SelfCont [quadratic in vmr], H2O,
    CO2, O3, N2O, CO, CH4, O2, HNO3, N2) with CO/HNO3 fixed at 1e-9
    and N2 at 0.78102 (`repwvl_optprop.F90:52-54`).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import GRAV

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "repwvl",
)
_AVOGADRO = 6.02214076e23
MOLMASS_AIR = 28.9644e-3  # [kg/mol]
_H, _C, _KB = 6.62607015e-34, 2.99792458e8, 1.380649e-23
_R_DRY = 287.058


def _planck_lambda(lam_m, T):
    """B_lambda [W/m2/m/sr] (reference `planck`, `tenstr_atm.F90:987`)."""
    return 2.0 * _H * _C**2 / (
        lam_m**5 * (np.exp(_H * _C / (lam_m * _KB * T)) - 1.0)
    )


def rayleigh_bodhaine(lambda_um, co2_vmr):
    """Rayleigh cross section [cm2] (reference `rayleigh.F90:44-75`)."""
    lam = np.asarray(lambda_um, np.float64)
    co2 = co2_vmr * 1e-4  # ppv percent
    l2 = lam * lam
    lm2 = 1.0 / l2
    n_300 = (8060.51 + 2480990.0 / (132.274 - lm2)
             + 17455.7 / (39.32957 - lm2)) * 1e-8
    n = (1.0 + 0.54 * (co2_vmr * 1e-6 - 0.0003)) * n_300 + 1.0
    n2 = n * n
    ref_ratio = (n2 - 1.0) ** 2 / (n2 + 2.0) ** 2
    F_N2 = 1.034 + 3.17e-4 / l2
    F_O2 = 1.096 + 1.385e-3 / l2 + 1.448e-4 / (l2 * l2)
    F_air = (78.084 * F_N2 + 20.946 * F_O2 + 0.934 + co2 * 1.15) / (
        78.084 + 20.946 + 0.934 + co2
    )
    N_s = 2.546899e19
    ray_const = 24.0 * np.pi**3 / N_s / N_s
    lambda_cm = lam * 1e-4
    return ray_const / lambda_cm**4 * ref_ratio * F_air


class RepwvlOptics:
    """Drop-in backend for `specint_pprts(specint='repwvl')`."""

    def __init__(self, n_wvl: int = 15, data_dir: Optional[str] = None):
        self.n_wvl = n_wvl
        self.data_dir = data_dir or _DIR
        self._cache: Dict[str, dict] = {}

    def _load(self, band: str) -> dict:
        if band not in self._cache:
            z = np.load(os.path.join(self.data_dir, f"repwvl_{band}_{self.n_wvl}.npz"),
                        allow_pickle=False)
            self._cache[band] = {k: z[k] for k in z.files if z[k].dtype.kind == "f"}
        return self._cache[band]

    # ------------------------------------------------------------------
    def _gas_tau(self, tb: dict, atm: Atmosphere) -> np.ndarray:
        """(nwvl, nlay) optical depth (reference `repwvl_dtau:240`)."""
        play = np.asarray(atm.play, np.float64)  # [Pa]
        tlay = np.asarray(atm.tlay, np.float64)
        dP = np.asarray(atm.plev[1:] - atm.plev[:-1], np.float64)
        g = atm.gases
        nlay = play.size
        zero = np.zeros(nlay)

        def vmr(name, default=None):
            if name in g:
                return np.broadcast_to(np.asarray(g[name], np.float64), (nlay,))
            return np.full(nlay, default) if default is not None else zero

        # tracer order per tracernames (module docstring)
        h2o = vmr("h2o")
        VMRS = np.stack([
            h2o, h2o, vmr("co2"), vmr("o3"), vmr("n2o"),
            np.full(nlay, 1e-9), vmr("ch4"), vmr("o2", 0.20942),
            np.full(nlay, 1e-9), np.full(nlay, 0.78102),
        ])  # (10, nlay)

        num_dens = dP * _AVOGADRO / MOLMASS_AIR / GRAV  # [molec/m2]

        p_ref = tb["p_ref"]  # (41,) descending? (starts 110000)
        # fractional index along p_ref (monotone decreasing in the file)
        order = np.argsort(p_ref)
        pr = p_ref[order]
        wp = np.interp(play, pr, np.arange(pr.size))
        ip0s = np.clip(np.floor(wp).astype(int), 0, pr.size - 2)
        wgt_p = wp - ip0s
        # map back to original (descending) indexing
        ip0 = order[ip0s]
        ip1 = order[np.clip(ip0s + 1, 0, pr.size - 1)]

        t_ref = tb["t_ref"]
        t_pert = tb["t_pert"]  # (9,) e.g. -40..+40
        tgrid = t_pert[None, :] + t_ref[ip0][:, None]  # (nlay, 9)
        wt = np.clip(
            np.array([np.interp(tlay[k], tgrid[k], np.arange(t_pert.size))
                      for k in range(nlay)]),
            0, t_pert.size - 1 - 1e-6,
        )
        it0 = np.floor(wt).astype(int)
        wgt_t = wt - it0

        xsec = tb["xsec"]  # (Nt_pert, Ntracer, Nwvl, Np)
        vref = tb["vmrs_ref"]  # (Ntracer, Np)
        ntracer, nwvl = xsec.shape[1], xsec.shape[2]
        _tr = np.arange(ntracer)[None, :, None]
        _wv = np.arange(nwvl)[None, None, :]

        def x_at(itx, ipx):  # -> (ntracer, nwvl, nlay)
            out = xsec[itx[:, None, None], _tr, _wv, ipx[:, None, None]]
            return np.moveaxis(out, 0, -1)

        xs0 = (x_at(it0, ip0) * (1 - wgt_t) + x_at(it0 + 1, ip0) * wgt_t)
        xs1 = (x_at(it0, ip1) * (1 - wgt_t) + x_at(it0 + 1, ip1) * wgt_t)
        # H2O self-continuum: cross sections normalized by the reference
        # vmr, entering quadratically (`repwvl_dtau:296-303`)
        xs0 = xs0.copy()
        xs1 = xs1.copy()
        xs0[0] = xs0[0] / np.maximum(vref[0, ip0], 1e-30)
        xs1[0] = xs1[0] / np.maximum(vref[0, ip1], 1e-30)
        xs = xs0 * (1 - wgt_p) + xs1 * wgt_p  # (ntracer, nwvl, nlay)

        V = VMRS.copy()
        V[0] = V[0] ** 2
        tau = np.einsum("swk,sk->wk", xs, V * num_dens[None, :])

        # Bremen O3/NO2 quadratic cross sections (`repwvl_dtau:322-334`)
        for key, v in (("crs_o3", VMRS[3]), ("crs_no2", zero)):
            if key in tb and tb[key].size:
                c = tb[key]  # (nwvl, 3)
                dT = tlay - 273.15
                sigma = np.maximum(
                    0.0, c[:, 0][:, None] + c[:, 1][:, None] * dT[None]
                    + c[:, 2][:, None] * dT[None] ** 2
                ) * 1e-20
                rho = play / (_R_DRY * tlay)
                dz = dP / (rho * GRAV)
                N = play / (_KB * tlay) * 1e-4 * dz  # [molec/cm2... per ref]
                tau = tau + v[None, :] * N[None, :] * sigma
        return np.maximum(tau, 0.0)

    def _rayleigh_tau(self, tb, atm) -> np.ndarray:
        dP = np.asarray(atm.plev[1:] - atm.plev[:-1], np.float64)
        co2 = float(np.mean(np.asarray(atm.gases.get("co2", 400e-6)))) * 1e6
        xs = rayleigh_bodhaine(tb["wvl"] * 1e-3, co2)  # [cm2] per wvl
        N = dP * _AVOGADRO / GRAV / MOLMASS_AIR  # [molec/m2]
        return xs[:, None] * 1e-4 * N[None, :]

    # ------------------------------------------------------------------
    def solar(self, atm: Atmosphere):
        import jax.numpy as jnp

        from tenstream_tpu.core.types import ireals
        from tenstream_tpu.spectral.gasoptics import SpectralOptProps

        tb = self._load("sw")
        tau_g = self._gas_tau(tb, atm)
        tau_r = self._rayleigh_tau(tb, atm)
        tau = tau_g + tau_r
        w0 = tau_r / np.maximum(tau, 1e-30)
        return SpectralOptProps(
            tau=jnp.asarray(tau, ireals),
            w0=jnp.asarray(w0, ireals),
            g=jnp.zeros_like(jnp.asarray(tau, ireals)),
            weight=jnp.asarray(tb["wgts"], ireals),
            planck=None, planck_srfc=None,
        )

    def thermal(self, atm: Atmosphere):
        import jax.numpy as jnp

        from tenstream_tpu.core.types import ireals
        from tenstream_tpu.spectral.gasoptics import SpectralOptProps

        tb = self._load("lw")
        tau_g = self._gas_tau(tb, atm)
        tlev = np.asarray(atm.tlev, np.float64)
        # weights are per-nm: wgt*1e-9 * B_lambda integrates to sigma T^4
        B = (tb["wgts"][:, None] * 1e-9
             * _planck_lambda(tb["wvl"][:, None] * 1e-9, tlev[None, :]))
        return SpectralOptProps(
            tau=jnp.asarray(tau_g, ireals),
            w0=jnp.zeros_like(jnp.asarray(tau_g, ireals)),
            g=jnp.zeros_like(jnp.asarray(tau_g, ireals)),
            weight=jnp.ones((tau_g.shape[0],), ireals),
            planck=jnp.asarray(B, ireals),
            planck_srfc=None,
        )

    # ------------------------------------------------------------------
    def cloud_optprops_gpt(self, kind: str, lwc_gm3, reff_um, dz_m, gsel: slice = slice(None)):
        """Per-wavelength Mie water-cloud optics from the repwvl mie
        table (`mie_tables.F90`; ext in [km^-1/(g/m^3)])."""
        import jax.numpy as jnp

        from tenstream_tpu.core.types import ireals
        from tenstream_tpu.ops.interp import fractional_index

        mie = np.load(os.path.join(self.data_dir, "mie_wc_table.npz"))
        tb = self._load("sw" if kind == "sw" else "lw")
        wvls = tb["wvl"] * 1e-3  # [nm] -> [um]
        mw = mie["wvl"]  # [um]
        iw = np.clip(np.interp(wvls, mw, np.arange(mw.size)), 0, mw.size - 1)
        i0 = np.floor(iw).astype(int)
        f = (iw - i0)[:, None]
        i1 = np.minimum(i0 + 1, mw.size - 1)
        ext = mie["ext"][i0] * (1 - f) + mie["ext"][i1] * f  # (nwvl, nreff)
        ssa = mie["ssa"][i0] * (1 - f) + mie["ssa"][i1] * f
        gg = mie["g"][i0] * (1 - f) + mie["g"][i1] * f
        reff_grid = mie["reff"]

        fr = fractional_index(jnp.asarray(reff_grid, ireals), jnp.asarray(reff_um, ireals))
        j0 = jnp.clip(jnp.floor(fr), 0, len(reff_grid) - 2).astype(jnp.int32)
        w = (fr - j0)[None]

        def gi(t):
            t = jnp.asarray(t, ireals)[gsel]
            return t[:, j0] * (1 - w) + t[:, j0 + 1] * w

        # ext [km^-1/(g/m^3)] * lwc [g/m3] * dz [m] * 1e-3
        tau = gi(ext) * jnp.asarray(lwc_gm3, ireals)[None] * jnp.asarray(dz_m, ireals)[None] * 1e-3
        return tau, gi(ssa), gi(gg)

    def ice_optprops_gpt(self, kind: str, iwc_gm3, reice_um, dz_m, gsel: slice = slice(None)):
        """Per-wavelength Fu ice optics (reference couples Fu96/Fu98 the
        same way, `repwvl_optprop.F90:164-181`)."""
        import jax.numpy as jnp

        from tenstream_tpu.core.types import ireals
        from tenstream_tpu.spectral.fu_ice import fu_ice_optprop

        tb = self._load("sw" if kind == "sw" else "lw")
        kext, w0, g = fu_ice_optprop(
            tb["wvl"] * 1e-3, np.asarray(reice_um), solar=(kind == "sw")
        )
        tau = (jnp.asarray(kext, ireals)[gsel]
               * jnp.asarray(iwc_gm3, ireals)[None]
               * jnp.asarray(dz_m, ireals)[None])
        return tau, jnp.asarray(w0, ireals)[gsel], jnp.asarray(g, ireals)[gsel]
