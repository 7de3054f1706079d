"""Spectral integration on the wedge-mesh (plexrt) solvers.

Parity: reference `specint/specint_plexrt.F90` — the same user-facing
flow as `specint_pprts` but driving the triangle-mesh solvers: per
g-point, broadcast the background-column gas optics onto the wedge
grid, merge 3-D clouds, solve, and accumulate weighted fluxes.  Works
on BOTH the structured `PlexrtSolver` (fish meshes) and the
unstructured `PlexrtSolverIcon` (ICON grid files) — the reference's
plexrt_rrtmg drives ICON-grid solvers the same way
(`rrtmg/rrtmg/plexrt_rrtmg.F90`).

The g-point axis is band-BATCHED like `specint_pprts`: the wedge
solver's solve() is a pure function of the optical-property fields, so
chunks of `band_chunk` g-points run as one `jax.vmap`-ed solve (one
compiled graph, MXU-batched coefficient blocks) instead of a sequential
per-gpt loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import ireals
from tenstream_tpu.spectral.specint import _BACKENDS, _merge_cloud


class PlexSpectralResult(NamedTuple):
    edir: Optional[jnp.ndarray]  # structured: (nz+1, 2, nx, ny); icon: (nz+1, nc) [W/m2]
    edn: jnp.ndarray
    eup: jnp.ndarray
    abso: jnp.ndarray  # cell-shaped [W/m3]


def specint_plexrt(
    solver,
    atm: Atmosphere,
    albedo: float,
    lthermal: bool,
    lsolar: bool,
    specint: str = "ecckd",
    lwc=None,  # cell-shaped [g/m3]
    reliq=None,
    max_gpt: Optional[int] = None,
    band_chunk: int = 8,
) -> PlexSpectralResult:
    backend = _BACKENDS[specint]() if isinstance(specint, str) else specint
    if hasattr(solver, "grid"):  # structured fish-mesh solver
        g = solver.grid
        nz = g.nz
        cell_shape = (nz, 2, g.nx, g.ny)
        dz3 = jnp.asarray(g.dz3d(), ireals)
        area = jnp.asarray(g.area_tri, ireals)
    else:  # PlexrtSolverIcon on a TriMesh
        nz = solver.nz
        nc = solver.mesh.ncell
        cell_shape = (nz, nc)
        dz3 = jnp.asarray(solver.dz, ireals).reshape((nz, 1)) * jnp.ones(
            cell_shape, ireals
        )
        area = jnp.asarray(solver.mesh.area, ireals)[None]  # (1, nc)
    assert nz == atm.nlay, "plex grid nz must match atm.nlay"
    lvl_shape = (nz + 1,) + cell_shape[1:]
    col = (slice(None),) + (None,) * (len(cell_shape) - 1)  # (nz,) -> cell bcast

    edir_acc = None
    edn = jnp.zeros(lvl_shape, ireals)
    eup = jnp.zeros_like(edn)
    abso = jnp.zeros(cell_shape, ireals)

    def fields_for(sp, igpt, kind):
        tau_g = jnp.asarray(sp.tau[igpt], ireals)[col] * jnp.ones(cell_shape, ireals)
        w0_g = jnp.asarray(sp.w0[igpt], ireals)[col] * jnp.ones(cell_shape, ireals)
        g_g = jnp.asarray(sp.g[igpt], ireals)[col] * jnp.ones(cell_shape, ireals)
        if lwc is not None:
            reff = jnp.asarray(reliq if reliq is not None else 10.0, ireals)
            if reff.ndim == 0:  # scalar -> cell-shaped (the per-gpt table
                reff = jnp.full(cell_shape, reff, ireals)  # gather needs a grid)
            if hasattr(backend, "cloud_optprops_gpt"):
                tc, wc, gc = backend.cloud_optprops_gpt(
                    kind, jnp.asarray(lwc, ireals), reff, dz3,
                )
                tc, wc, gc = tc[igpt], wc[igpt], gc[igpt]
            else:
                from tenstream_tpu.spectral.gasoptics import cloud_optprops

                tc, wc, gc = cloud_optprops(jnp.asarray(lwc, ireals), reff, dz3)
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
        has_planck = (not solar) and sp.planck is not None

        def one_gpt(kabs, ksca, gg, planck, toa):
            # solve() is pure in the optprop fields, so mutating the
            # solver inside the traced function is safe — the stored
            # tracers are consumed within this same trace
            solver.set_optical_properties(
                albedo, kabs, ksca, gg, planck=planck if has_planck else None
            )
            # weight is the per-gpt beam irradiance; the solver applies
            # the E0*mu_top TOA projection itself (plexrt parity)
            sol = solver.solve(lthermal=not solar, lsolar=solar, edirTOA=toa)
            e = sol.edir if sol.edir is not None else jnp.zeros(lvl_shape, ireals)
            return e, sol.edn, sol.eup, sol.abso

        vfn = jax.jit(jax.vmap(one_gpt))
        zplanck = jnp.zeros(lvl_shape, ireals)
        lvl_col = (slice(None), slice(None)) + (None,) * (len(cell_shape) - 1)
        for lo in range(0, ngpt, band_chunk):
            hi = min(lo + band_chunk, ngpt)
            kabs_b, ksca_b, g_b = (
                jnp.stack(x) for x in zip(*[
                    fields_for(sp, i, "sw" if solar else "lw")
                    for i in range(lo, hi)
                ])
            )
            if has_planck:
                planck_b = (
                    jnp.asarray(sp.planck[lo:hi], ireals)[lvl_col]
                    * jnp.ones((hi - lo,) + lvl_shape, ireals)
                )
            else:
                planck_b = jnp.broadcast_to(zplanck, (hi - lo,) + zplanck.shape)
            toa_b = (
                jnp.asarray(sp.weight[lo:hi], ireals)
                if solar else jnp.zeros((hi - lo,), ireals)
            )
            e_b, edn_b, eup_b, abso_b = vfn(kabs_b, ksca_b, g_b, planck_b, toa_b)
            if solar:
                edir_acc = e_b.sum(0) if edir_acc is None else edir_acc + e_b.sum(0)
            edn = edn + edn_b.sum(0)
            eup = eup + eup_b.sum(0)
            abso = abso + abso_b.sum(0)

    if lsolar and solver._sundir is not None:
        run(backend.solar(atm), True)
    if lthermal:
        run(backend.thermal(atm), False)

    return PlexSpectralResult(
        None if edir_acc is None else edir_acc / area,
        edn / area, eup / area, abso,
    )
