"""Delta-Eddington two-stream column solver, batched over columns.

Parity: reference `src/twostream.F90:50-184` (`delta_eddington_twostream`)
which assembles a banded linear system for interleaved (Eup, Edn) levels
and solves it with LAPACK *GBSV.  Here the same block-tridiagonal system
is solved exactly with an O(Nz) backward/forward substitution expressed as
two `lax.scan`s — the classic reflection/transmission elimination.  All
operations carry trailing batch dimensions, so the whole (Nx, Ny) grid of
columns solves in one fused call (no LAPACK, no per-column loop).

System per column (k = 0..Nz-1 layers, levels 0..Nz):
    Edn[0]    = 0
    Eup[k]    = a11[k] Eup[k+1] + a12[k] Edn[k]   + b_up[k]
    Edn[k+1]  = a11[k] Edn[k]   + a12[k] Eup[k+1] + b_dn[k]
    Eup[Nz]   = albedo Edn[Nz] + b_sfc
with solar sources b_up = S a13, b_dn = S a23 and thermal sources from
B_eff emission (reference :99-121).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.eddington import eddington_coeff_ec
from tenstream_tpu.ops.planck import b_eff


def delta_eddington_twostream(
    dtau,
    w0,
    g,
    mu0,
    incSolar,
    albedo,
    planck=None,
    planck_srfc=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Solve the two-stream system for all columns at once.

    Args:
      dtau, w0, g: (Nz, *batch) layer optical properties (already delta
        scaled if desired).
      mu0: scalar or (*batch,) cosine of solar zenith.
      incSolar: scalar or (*batch,) direct irradiance on the tilted plane
        at TOA (reference convention, `src/twostream.F90:87`).
      albedo: scalar or (*batch,).
      planck: optional (Nz+1, *batch) Planck radiance at levels.
      planck_srfc: optional (*batch,) surface Planck override.

    Returns:
      (S, Edn, Eup) each of shape (Nz+1, *batch); S is the direct beam.
    """
    dtau = jnp.asarray(dtau, ireals)
    w0 = jnp.asarray(w0, ireals)
    g = jnp.asarray(g, ireals)
    nz = dtau.shape[0]
    batch = dtau.shape[1:]

    mu0 = jnp.broadcast_to(jnp.asarray(mu0, ireals), batch)
    incSolar = jnp.broadcast_to(jnp.asarray(incSolar, ireals), batch)
    albedo = jnp.broadcast_to(jnp.asarray(albedo, ireals), batch)

    a11, a12, a13, a23, a33 = eddington_coeff_ec(dtau, w0, g, mu0[None])

    # direct beam: S[k+1] = S[k] * a33[k]
    sun_up = mu0 > 0
    S = jnp.concatenate(
        [jnp.ones((1,) + batch, ireals), jnp.cumprod(a33, axis=0)], axis=0
    ) * jnp.where(sun_up, incSolar, 0.0)[None]

    b_up = S[:-1] * a13
    b_dn = S[:-1] * a23
    b_sfc = S[-1] * albedo

    if planck is not None:
        planck = jnp.asarray(planck, ireals)
        emis = jnp.clip(1.0 - a11 - a12, 0.0, 1.0) * PI
        b_up = b_up + emis * b_eff(planck[1:], planck[:-1], dtau)
        b_dn = b_dn + emis * b_eff(planck[:-1], planck[1:], dtau)
        srfc_B = planck[-1] if planck_srfc is None else jnp.broadcast_to(jnp.asarray(planck_srfc, ireals), batch)
        b_sfc = b_sfc + srfc_B * (1.0 - albedo) * PI

    # Backward elimination:  Eup[k] = R[k] Edn[k] + Q[k]
    def back(carry, inp):
        R_next, Q_next = carry
        a11k, a12k, bupk, bdnk = inp
        D = 1.0 - a12k * R_next
        R = a12k + a11k * a11k * R_next / D
        Q = a11k * R_next * (a12k * Q_next + bdnk) / D + a11k * Q_next + bupk
        return (R, Q), (R_next, Q_next, D)

    (R0, Q0), (R_next, Q_next, D) = jax.lax.scan(
        back, (albedo, b_sfc), (a11, a12, b_up, b_dn), reverse=True
    )
    # R_next[k] = R[k+1], D[k] = 1 - a12[k] R[k+1]  (for layer k)

    # Forward substitution for Edn, then Eup = R Edn + Q.
    def fwd(edn_k, inp):
        a11k, a12k, bdnk, Qn, Dk = inp
        edn_next = (a11k * edn_k + a12k * Qn + bdnk) / Dk
        return edn_next, edn_next

    edn0 = jnp.zeros(batch, ireals)
    _, Edn_rest = jax.lax.scan(fwd, edn0, (a11, a12, b_dn, Q_next, D))
    Edn = jnp.concatenate([edn0[None], Edn_rest], axis=0)

    R_all = jnp.concatenate([R0[None], R_next], axis=0)  # R[0..Nz]
    Q_all = jnp.concatenate([Q0[None], Q_next], axis=0)
    Eup = R_all * Edn + Q_all

    return S, Edn, Eup
