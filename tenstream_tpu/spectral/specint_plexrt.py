"""Spectral integration on the wedge-mesh (plexrt) solver.

Parity: reference `specint/specint_plexrt.F90` — the same user-facing
flow as `specint_pprts` but driving the triangle-mesh solver: per
g-point, broadcast the background-column gas optics onto the wedge
grid, merge 3-D clouds, solve, and accumulate weighted fluxes.

v1 runs the g-point loop sequentially (the wedge solver is not yet
band-batched); fine for the example/test scales.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import ireals
from tenstream_tpu.plexrt.solver import PlexrtSolver
from tenstream_tpu.spectral.specint import _BACKENDS, _merge_cloud


class PlexSpectralResult(NamedTuple):
    edir: Optional[jnp.ndarray]  # (nz+1, 2, nx, ny) [W/m2]
    edn: jnp.ndarray
    eup: jnp.ndarray
    abso: jnp.ndarray  # (nz, 2, nx, ny) [W/m3]


def specint_plexrt(
    solver: PlexrtSolver,
    atm: Atmosphere,
    albedo: float,
    lthermal: bool,
    lsolar: bool,
    specint: str = "ecckd",
    lwc=None,  # (nlay, 2, nx, ny) [g/m3]
    reliq=None,
    max_gpt: Optional[int] = None,
) -> PlexSpectralResult:
    backend = _BACKENDS[specint]() if isinstance(specint, str) else specint
    g = solver.grid
    nz, nx, ny = g.nz, g.nx, g.ny
    assert nz == atm.nlay, "plex grid nz must match atm.nlay"
    dz3 = jnp.asarray(g.dz3d(), ireals)

    shape = (nz, 2, nx, ny)
    edir_acc = None
    edn = jnp.zeros((nz + 1, 2, nx, ny), ireals)
    eup = jnp.zeros_like(edn)
    abso = jnp.zeros(shape, ireals)

    def fields_for(sp, igpt, kind):
        tau_g = jnp.asarray(sp.tau[igpt], ireals)[:, None, None, None] * jnp.ones(shape, ireals)
        w0_g = jnp.asarray(sp.w0[igpt], ireals)[:, None, None, None] * jnp.ones(shape, ireals)
        g_g = jnp.asarray(sp.g[igpt], ireals)[:, None, None, None] * jnp.ones(shape, ireals)
        if lwc is not None:
            if hasattr(backend, "cloud_optprops_gpt"):
                tc, wc, gc = backend.cloud_optprops_gpt(
                    kind, jnp.asarray(lwc, ireals),
                    jnp.asarray(reliq if reliq is not None else 10.0, ireals),
                    dz3,
                )
                tc, wc, gc = tc[igpt], wc[igpt], gc[igpt]
            else:
                from tenstream_tpu.spectral.gasoptics import cloud_optprops

                tc, wc, gc = cloud_optprops(
                    jnp.asarray(lwc, ireals),
                    jnp.asarray(reliq if reliq is not None else 10.0, ireals), dz3,
                )
            tau, w0, gg = _merge_cloud(tau_g, w0_g, g_g, tc, wc, gc)
        else:
            tau, w0, gg = tau_g, w0_g, g_g
        kext = tau / dz3
        kabs = kext * (1.0 - w0)
        ksca = kext * w0
        return kabs, ksca, gg

    def run(sp, solar):
        nonlocal edir_acc, edn, eup, abso
        ngpt = sp.tau.shape[0] if max_gpt is None else min(max_gpt, sp.tau.shape[0])
        mu = None
        if solar:
            s = solver._sundir
            mu = float(max(-s[2] / np.linalg.norm(s), 1e-6))
        for igpt in range(ngpt):
            kabs, ksca, gg = fields_for(sp, igpt, "sw" if solar else "lw")
            planck = None
            if not solar and sp.planck is not None:
                planck = jnp.asarray(sp.planck[igpt], ireals)[:, None, None, None] * jnp.ones(
                    (nz + 1, 2, nx, ny), ireals
                )
            solver.set_optical_properties(albedo, kabs, ksca, gg, planck=planck)
            # weight is the per-gpt beam irradiance; the solver applies
            # the E0*mu_top TOA projection itself (plexrt parity)
            sol = solver.solve(
                lthermal=not solar, lsolar=solar,
                edirTOA=float(sp.weight[igpt]) if solar else 0.0,
            )
            if solar:
                edir_acc = sol.edir if edir_acc is None else edir_acc + sol.edir
            edn = edn + sol.edn
            eup = eup + sol.eup
            abso = abso + sol.abso

    if lsolar and solver._sundir is not None:
        run(backend.solar(atm), True)
    if lthermal:
        run(backend.thermal(atm), False)

    a = g.area_tri
    return PlexSpectralResult(
        None if edir_acc is None else edir_acc / a,
        edn / a, eup / a, abso,
    )
