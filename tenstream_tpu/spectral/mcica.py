"""McICA stochastic subcolumn generator for partial cloudiness.

Parity: reference `rrtmg/rrtm_lw/mcica_subcol_gen_lw.f90` /
`..._sw.f90` (Raisanen et al. 2004 generator): every g-point sees one
random binary subcolumn drawn from the layer cloud fractions with
maximum-random overlap, and the in-cloud condensate is the layer mean
scaled by 1/fraction.

TPU-first: the per-layer sequential overlap recursion runs as a
`lax.scan` over z; everything else is vectorized over
(gpt, nx, ny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tenstream_tpu.core.types import ireals


def mcica_subcolumns(
    key,
    cld_frac,  # (nlay, ...) in [0, 1]
    ngpt: int,
    overlap: str = "maxrand",
):
    """(ngpt, nlay, ...) boolean cloud masks.

    overlap: 'maxrand' (reference default, icld=2), 'max', or 'random'.
    """
    f = jnp.clip(jnp.asarray(cld_frac, ireals), 0.0, 1.0)
    nlay = f.shape[0]
    u = jax.random.uniform(key, (ngpt, nlay) + f.shape[1:], dtype=ireals)

    if overlap == "random":
        x = u
    elif overlap == "max":
        x = jnp.broadcast_to(u[:, :1], u.shape)
    elif overlap == "maxrand":
        # Raisanen eq. 14: correlated where the layer above is cloudy
        def step(x_prev, inp):
            u_k, f_above = inp
            x_k = jnp.where(
                x_prev > 1.0 - f_above,  # above is cloudy in this subcol
                x_prev,
                x_k_fresh(u_k, f_above),
            )
            return x_k, x_k

        def x_k_fresh(u_k, f_above):
            return u_k * (1.0 - f_above)

        f_above = jnp.concatenate([jnp.zeros_like(f[:1]), f[:-1]], axis=0)
        u_sc = jnp.moveaxis(u, 1, 0)  # (nlay, ngpt, ...)
        fa = f_above[:, None]
        _, xs = jax.lax.scan(step, u_sc[0], (u_sc, fa * jnp.ones_like(u_sc)))
        x = jnp.moveaxis(xs, 0, 1)
    else:
        raise ValueError(f"unknown overlap {overlap!r}")

    return x > (1.0 - f)[None]


def mcica_condensate(key, cld_frac, lwc, ngpt: int, overlap: str = "maxrand"):
    """Per-gpt condensate fields: layer-mean lwc scaled into the cloudy
    subcolumns (reference `generate_stochastic_clouds`: in-cloud value
    = grid mean / fraction)."""
    mask = mcica_subcolumns(key, cld_frac, ngpt, overlap)
    f = jnp.clip(jnp.asarray(cld_frac, ireals), 1e-6, 1.0)
    incloud = jnp.asarray(lwc, ireals) / f
    return jnp.where(mask, incloud[None], 0.0)
