"""No-scattering thermal radiance integration (Schwarzschild equation).

Parity: reference `src/schwarzschild.F90:81-171` — downward and upward
radiance integration over Nmu Gauss-Legendre angles, accumulated into
fluxes.  Vectorized: the per-angle work is batched over all columns via
trailing batch dimensions and the z-recursion is a `lax.scan`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.planck import gauss_legendre_01, schwarzschild_radiance_step


def schwarzschild(
    dtau,
    albedo,
    planck,
    nmu: int = 2,
    srfc_emission: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Thermal fluxes for all columns.

    Args:
      dtau: (Nz, *batch) layer optical depth (absorption only).
      albedo: scalar or (*batch,).
      planck: (Nz+1, *batch) Planck radiance at levels [W/m2/sr].
      nmu: number of Gauss angles (reference default 2 at call sites).
      srfc_emission: optional surface Planck override (reference
        `opt_srfc_emission`).

    Returns: (Edn, Eup) of shape (Nz+1, *batch) in [W/m2].
    """
    dtau = jnp.asarray(dtau, ireals)
    planck = jnp.asarray(planck, ireals)
    batch = dtau.shape[1:]
    albedo = jnp.broadcast_to(jnp.asarray(albedo, ireals), batch)
    bsrfc = planck[-1] if srfc_emission is None else jnp.broadcast_to(jnp.asarray(srfc_emission, ireals), batch)

    pts, wts = gauss_legendre_01(nmu)

    Edn = jnp.zeros((dtau.shape[0] + 1,) + batch, ireals)

    # downward pass per angle
    for mu, w in zip(pts, wts):
        def dn_step(L, inp):
            dtk, b_n, b_f = inp
            Ln = schwarzschild_radiance_step(L, dtk / ireals(mu), b_n, b_f)
            return Ln, Ln

        _, Ldn = jax.lax.scan(dn_step, jnp.zeros(batch, ireals), (dtau, planck[:-1], planck[1:]))
        Edn = Edn.at[1:].add(Ldn * ireals(mu * w))

    Eup = jnp.zeros_like(Edn)
    # surface boundary radiance: emission + reflection of downwelling
    # (reference :125: Lup = Bsrfc*(1-albedo) + albedo * Edn(ke1) * 2)
    Lup0 = bsrfc * (1.0 - albedo) + albedo * Edn[-1] * 2.0
    for mu, w in zip(pts, wts):
        def up_step(L, inp):
            dtk, b_n, b_f = inp
            Ln = schwarzschild_radiance_step(L, dtk / ireals(mu), b_n, b_f)
            return Ln, Ln

        _, Lup = jax.lax.scan(
            up_step, Lup0, (dtau, planck[1:], planck[:-1]), reverse=True
        )
        Eup = Eup.at[:-1].add(Lup * ireals(mu * w))
        Eup = Eup.at[-1].add(Lup0 * ireals(mu * w))

    return Edn * 2.0 * PI, Eup * 2.0 * PI
