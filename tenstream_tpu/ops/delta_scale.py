"""Delta scaling of optical properties (similarity transform).

Parity: reference `src/helper_functions.fypp:1622-1666`
(`delta_scale` / `delta_scale_optprop`).  Default forward-peak fraction
f = g**2; the alternative `max_g` mode rescales only layers with g >= max_g
(used via ``-pprts_delta_scale_f2 no`` with ``-pprts_delta_scale_max_g``,
`src/pprts.F90:1903-1924`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tenstream_tpu.core.types import ireals


def delta_scale_optprop(dtau, w0, g, f):
    """Scale (dtau, w0, g) with forward fraction f; returns new triple."""
    eps = jnp.finfo(ireals).eps
    g_is_one = g >= 1.0 - 10 * eps
    dtau_s = jnp.where(g_is_one, dtau * (1.0 - w0), dtau * (1.0 - w0 * f))
    g_s = jnp.where(g_is_one, 0.0, (g - f) / (1.0 - f))
    w0_s = jnp.where(g_is_one, 0.0, w0 * (1.0 - f) / (1.0 - f * w0))
    return dtau_s, w0_s, g_s


def delta_scale(kabs, ksca, g, f: Optional[jnp.ndarray] = None, max_g: Optional[float] = None):
    """Delta-scale extinction fields; returns (kabs', ksca', g')."""
    kabs = jnp.asarray(kabs, ireals)
    ksca = jnp.asarray(ksca, ireals)
    g = jnp.asarray(g, ireals)

    ff = g**2 if f is None else jnp.asarray(f, ireals)
    skip = jnp.zeros(jnp.broadcast_shapes(kabs.shape, ksca.shape, g.shape), dtype=bool)
    if max_g is not None:
        skip = skip | (g < max_g)
        ff = (max_g - g) / (max_g - 1.0)

    dtau = kabs + ksca
    tiny = dtau < jnp.finfo(ireals).eps
    skip = skip | tiny
    dtau_safe = jnp.maximum(dtau, jnp.finfo(ireals).tiny)
    w0 = ksca / dtau_safe

    dtau_s, w0_s, g_s = delta_scale_optprop(dtau, w0, g, ff)
    kabs_s = dtau_s * (1.0 - w0_s)
    ksca_s = dtau_s * w0_s

    kabs_out = jnp.where(skip, kabs, kabs_s)
    ksca_out = jnp.where(skip, ksca, ksca_s)
    g_out = jnp.where(skip, g, g_s)
    return kabs_out, ksca_out, g_out
