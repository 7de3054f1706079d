"""Analytic delta-Eddington two-stream layer coefficients, vectorized.

Parity: reference `src/eddington.F90` — variants `eddington_coeff_zdun`
(:36, Zdunkowski), `eddington_coeff_ec` (:184, the production default used
by `m_twostream` and the 1-D fallback `src/optprop.F90:455-459`).

All functions are elementwise over arbitrarily-shaped arrays (the
reference is `pure elemental`); on TPU they vectorize over whole
(Nz, Nx, Ny) fields at once.

Returned coefficient meaning (per layer, given dtau, w0, g, mu0):
  a11 : diffuse transmission        (T)
  a12 : diffuse reflection          (R)
  a13 : direct -> diffuse upward    (Rdir), per unit direct flux on the
        horizontal plane (reference divides Roberts' coeffs by mu0)
  a23 : direct -> diffuse downward  (Sdir)
  a33 : direct transmission         (Tdir = exp(-dtau/mu0))
"""

from __future__ import annotations

import jax.numpy as jnp

from tenstream_tpu.core.types import ireals

_MAX_EXP = 80.0  # exp clamp, cf. reference max_exponential


def eddington_coeff_ec(dtau, w0, g, mu0):
    """Production variant, reference `src/eddington.F90:184-242`.

    Returns (a11, a12, a13, a23, a33) broadcast over inputs.
    """
    dtau = jnp.asarray(dtau, ireals)
    w0 = jnp.asarray(w0, ireals)
    g = jnp.asarray(g, ireals)
    mu0 = jnp.asarray(mu0, ireals)
    dtau, w0, g, mu0 = jnp.broadcast_arrays(dtau, w0, g, mu0)

    eps = jnp.finfo(ireals).eps
    # conservative-scattering guard: at w0 == 1 exactly, g1 - g2 = 0 and
    # the two-stream eigenvalue degenerates (A -> 0), poisoning the
    # thick-branch coefficients (observed: a11 = 0.987, a12 = 0 for a
    # nearly transparent layer).  The reference relies on the same kind
    # of clip in its callers.
    w0 = jnp.clip(w0, 0.0, 1.0 - 1e-6)

    f = 0.75 * g
    g1 = 2.0 - w0 * (1.25 + f)
    g2 = w0 * (0.75 - f)
    g3 = 0.5 - mu0 * f
    g4 = 1.0 - g3

    mu0_safe = jnp.maximum(jnp.sqrt(jnp.finfo(ireals).tiny), mu0)
    dtau_slant = jnp.maximum(dtau / mu0_safe, 0.0)

    thick = dtau_slant > 1e-6

    # ---- thick branch -----------------------------------------------------
    alpha1 = g1 * g4 + g2 * g3
    alpha2 = g1 * g3 + g2 * g4
    A = jnp.sqrt(jnp.maximum((g1 - g2) * (g1 + g2), 1e-12))
    k_mu0 = A * mu0
    # avoid the resonance k*mu0 == 1 (reference :219-221)
    k_mu0 = jnp.where(jnp.abs(k_mu0 - 1.0) < 10 * eps, 1.0 - 10 * eps, k_mu0)
    k_g3 = A * g3
    k_g4 = A * g4

    e0 = jnp.exp(-jnp.minimum(dtau_slant, _MAX_EXP))
    e = jnp.exp(-jnp.minimum(A * dtau, _MAX_EXP))
    e2 = e * e
    k_2_e = 2.0 * A * e

    beta = 1.0 / (A + g1 + (A - g1) * e2)
    r_thick = g2 * (1.0 - e2) * beta
    t_thick = k_2_e * beta

    beta_dir = w0 * beta / (1.0 - k_mu0 * k_mu0)
    sdir_thick = beta_dir * (
        k_2_e * (g4 + alpha1 * mu0)
        - e0 * ((1.0 + k_mu0) * (alpha1 + k_g4) - (1.0 - k_mu0) * (alpha1 - k_g4) * e2)
    )
    rdir_thick = beta_dir * (
        (1.0 - k_mu0) * (alpha2 + k_g3)
        - (1.0 + k_mu0) * (alpha2 - k_g3) * e2
        - k_2_e * (g3 - alpha2 * mu0) * e0
    )

    # ---- optically-thin branch (series expansion, :235-241) ---------------
    t_thin = 1.0 - g1 * dtau
    r_thin = g2 * dtau
    sdir_thin = (1.0 - g3) * w0 * dtau
    rdir_thin = g3 * w0 * dtau
    e0_thin = 1.0 - dtau_slant

    a11 = jnp.where(thick, t_thick, t_thin)
    a12 = jnp.where(thick, r_thick, r_thin)
    a13 = jnp.where(thick, rdir_thick, rdir_thin)
    a23 = jnp.where(thick, sdir_thick, sdir_thin)
    a33 = jnp.where(thick, e0, e0_thin)

    # keep transfer coefficients physical; f32 roundoff can push slightly out
    a11 = jnp.clip(a11, 0.0, 1.0)
    a12 = jnp.clip(a12, 0.0, 1.0)
    a13 = jnp.maximum(a13, 0.0)
    a23 = jnp.maximum(a23, 0.0)
    a33 = jnp.clip(a33, 0.0, 1.0)
    # ENERGY inequalities, strictly: at w0 -> 1 with tiny tau, f32 noise
    # can give a11 + a12 = 1 + O(1e-5); the layered reflection recurrence
    # then has a fixed point beyond 1 and diverges (observed as Edn >
    # incoming on near-transparent conservative columns).  Normalize the
    # pair proportionally (preserves the transmission/reflection ratio);
    # same for the direct source split against 1 - a33.
    tiny = jnp.finfo(a11.dtype).tiny
    s = a11 + a12
    norm = jnp.minimum(1.0, 1.0 / jnp.maximum(s, tiny))
    a11 = a11 * norm
    a12 = a12 * norm
    sd = a13 + a23
    normd = jnp.minimum(1.0, (1.0 - a33) / jnp.maximum(sd, tiny))
    a13 = a13 * normd
    a23 = a23 * normd

    # zero direct coefficients when the sun is below the horizon
    sun_up = mu0 > eps
    a13 = jnp.where(sun_up, a13, 0.0)
    a23 = jnp.where(sun_up, a23, 0.0)
    a33 = jnp.where(sun_up, a33, 0.0)
    return a11, a12, a13, a23, a33


def eddington_coeff_zdun(dtau, w0, g, mu0):
    """Zdunkowski variant, reference `src/eddington.F90:36-144`."""
    dtau = jnp.asarray(dtau, ireals)
    w0 = jnp.asarray(w0, ireals)
    g = jnp.asarray(g, ireals)
    mu0 = jnp.asarray(mu0, ireals)
    dtau, w0, g, mu0 = jnp.broadcast_arrays(dtau, w0, g, mu0)

    eps = jnp.finfo(ireals).eps
    eps_res = 1e-6  # resonance guard (reference uses 1e-8 in f64)

    dtau = jnp.clip(dtau, eps, 500.0)
    g = jnp.maximum(1e-6, g)
    w0 = jnp.clip(w0, eps, 1.0 - eps_res)

    b_minus_mu0 = 0.5 - 0.75 * g * mu0

    bscr = 0.5 - 0.375 * g
    alpha_1 = 2.0 * (1.0 - w0 * (1.0 - bscr)) - 0.25
    alpha_2 = 2.0 * w0 * bscr - 0.25
    lam = jnp.sqrt(alpha_1**2 - alpha_2**2)

    e1 = jnp.exp(jnp.minimum(_MAX_EXP, lam * dtau))
    e2 = jnp.exp(-jnp.minimum(_MAX_EXP, lam * dtau))

    def _sgn_eps(x):
        return jnp.where(jnp.abs(x) < eps, jnp.where(x >= 0, eps, -eps), x)

    a1m = _sgn_eps(alpha_1 - lam)
    a1p = _sgn_eps(alpha_1 + lam)

    A = 1.0 / (alpha_2 / a1m * e1 - alpha_2 / a1p * e2)

    beta11 = A * alpha_2 / a1m
    beta21 = -A * alpha_2 / a1p
    beta12 = -A * e2
    beta22 = A * e1

    gamma12 = alpha_2 / a1p * e1
    gamma22 = alpha_2 / a1m * e2

    a11 = jnp.clip(beta11 + beta21, 0.0, 1.0)
    a12 = jnp.clip(beta12 + beta22, 0.0, 1.0)

    mu0_safe = jnp.maximum(mu0, eps)
    a33 = jnp.exp(-jnp.minimum(_MAX_EXP, dtau / mu0_safe))

    alpha_3 = -w0 * b_minus_mu0
    alpha_4 = w0 * (1.0 - b_minus_mu0)

    den = (1.0 / mu0_safe) ** 2 - lam**2
    den_fix = jnp.where(
        mu0 > 0.5,
        1.0 / jnp.maximum(mu0_safe**2 - eps_res, eps) - lam**2,
        1.0 / (mu0_safe**2 + eps_res) - lam**2,
    )
    den = jnp.where(jnp.abs(den) <= eps_res, den_fix, den)

    alpha_5 = ((alpha_1 - 1.0 / mu0_safe) * alpha_3 - alpha_2 * alpha_4) / den
    alpha_6 = (alpha_2 * alpha_3 - (alpha_1 + 1.0 / mu0_safe) * alpha_4) / den

    beta13 = -beta11 * alpha_5 * a33 - beta12 * alpha_6
    beta23 = -beta21 * alpha_5 * a33 - beta22 * alpha_6

    a13 = (beta13 + beta23 + alpha_5) / mu0_safe
    a23 = (beta13 * gamma12 + beta23 * gamma22 + alpha_6 * a33) / mu0_safe
    a13 = jnp.maximum(0.0, a13)
    a23 = jnp.maximum(0.0, a23)

    sun_up = mu0 > eps
    a13 = jnp.where(sun_up, a13, 0.0)
    a23 = jnp.where(sun_up, a23, 0.0)
    a33 = jnp.where(sun_up, a33, 0.0)
    return a11, a12, a13, a23, a33
