"""Planck emission helpers: effective emission temperature across a layer.

Parity: reference `src/schwarzschild.F90:36-79` (`B_eff`, `B_eff_mu`,
`schwarzschild_radiance`) and the Planck function used by the spectral
drivers.  B values here are band-integrated radiances [W/m2/sr] as in the
reference driver convention (`rrtmg/rrtmg/pprts_rrtmg.F90`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import (
    C_SPEED_OF_LIGHT,
    H_PLANCK,
    K_BOLTZMANN,
    PI,
    STEFAN_BOLTZMANN,
    ireals,
)


def gauss_legendre_01(n: int):
    """Gauss-Legendre nodes/weights on (0, 1) (reference `dgauss`,
    `src/schwarzschild.F90:173-303`)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (0.5 * (x + 1.0)).astype(np.float64), (0.5 * w).astype(np.float64)


def b_eff_mu(b_far, b_near, tau, mu):
    """Effective Planck emission along a slanted path, reference :55-66."""
    dtau = tau / mu
    thin = dtau < 1e-3
    dtau_safe = jnp.where(thin, 1.0, dtau)
    tau_safe = jnp.where(thin, 1.0, tau)
    tm1 = jnp.expm1(-dtau_safe)
    full = (-b_near + b_far * (tm1 + 1.0)) / tm1 + (b_far - b_near) * mu / tau_safe
    lin = 0.5 * (b_far + b_near)
    return jnp.where(thin, lin, full)


def b_eff(b_far, b_near, tau, nmu: int = 2):
    """Angle-integrated effective Planck emission of a layer (:36-53).

    b_far is the Planck value at the far end of the path, b_near at the
    emission-side boundary; returns the effective isotropic emission value
    such that  B * (1 - T) integrates the source along the path.
    """
    pts, wts = gauss_legendre_01(nmu)
    b = jnp.zeros_like(jnp.asarray(b_far, ireals) + jnp.asarray(b_near, ireals) + jnp.asarray(tau, ireals))
    for mu, w in zip(pts, wts):
        b = b + b_eff_mu(b_far, b_near, tau, ireals(mu)) * ireals(mu) * ireals(w)
    return b * 2.0


def schwarzschild_radiance_step(L, tau, b_near, b_far):
    """Update radiance L across a layer of optical depth tau (slant),
    reference `schwarzschild_radiance` :69-79.  b_near is the Planck value
    at the entry side, b_far at the exit side of the propagation."""
    thin = tau < 1e-3
    tau_safe = jnp.where(thin, 1.0, tau)
    tm1 = jnp.expm1(-tau_safe)
    full = L * (tm1 + 1.0) + (b_far - b_near) - (b_near - (b_far - b_near) / tau_safe) * tm1
    lin = 0.5 * (b_near + b_far) * tau + L * (1.0 - tau)
    return jnp.where(thin, lin, full)


def planck_radiance_wavenumber(wvn_lo_cm, wvn_hi_cm, T, n_quad: int = 16):
    """Band-integrated Planck radiance [W/m2/sr] between two wavenumbers
    [1/cm], by fixed-order quadrature over wavenumber.  Used by the
    spectral integration drivers (parity with RRTMG's Planck tables)."""
    T = jnp.asarray(T, ireals)
    nu_lo = wvn_lo_cm * 100.0  # [1/m]
    nu_hi = wvn_hi_cm * 100.0
    x, w = np.polynomial.legendre.leggauss(n_quad)
    nu = 0.5 * (nu_hi + nu_lo) + 0.5 * (nu_hi - nu_lo) * x  # [1/m]
    wq = 0.5 * (nu_hi - nu_lo) * w
    c1 = 2.0 * H_PLANCK * C_SPEED_OF_LIGHT**2
    c2 = H_PLANCK * C_SPEED_OF_LIGHT / K_BOLTZMANN
    out = jnp.zeros_like(T)
    for nui, wi in zip(nu, wq):
        # spectral radiance per wavenumber: B_nu = c1 nu^3 / (exp(c2 nu / T) - 1)
        out = out + ireals(wi * c1 * nui**3) / jnp.expm1(ireals(c2 * nui) / T)
    return out


def stefan_boltzmann_radiance(T):
    """Total blackbody radiance sigma T^4 / pi  [W/m2/sr]."""
    T = jnp.asarray(T, ireals)
    return STEFAN_BOLTZMANN * T**4 / PI
