"""Spectral integration driver: full-spectrum heating rates via pprts.

Parity: reference `specint_pprts` (`specint/specint_pprts.F90:88-210`)
dispatching to rrtmg/ecckd/repwvl, whose drivers loop g-points
SEQUENTIALLY, each with set_optical_properties + solve_pprts +
accumulate (`rrtmg/rrtmg/pprts_rrtmg.F90:214-268,417-700`).

TPU-first redesign: the g-point loop becomes a BATCHED solve — optical
properties for a chunk of g-points are built as one tensor and the whole
per-band solve (coefficient assembly, direct scan, diffuse iteration,
absorption) runs under `jax.vmap`.  This is the single biggest structural
win over the reference (SURVEY §2.5 item 4): the MXU/VPU pipeline stays
saturated across bands instead of round-tripping per band.

Warm starts: per-gpoint diffuse solutions and relaxation omegas are
cached across calls (reference solution-uid cache + `diff_sor_omega`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.atm import Atmosphere
from tenstream_tpu.core.types import ireals
from tenstream_tpu.ops.delta_scale import delta_scale
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.spectral.gasoptics import (
    GrayGasOptics,
    SpectralOptProps,
    SyntheticCKD,
    cloud_optprops,
)

def _make_ecckd():
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    return EcckdGasOptics()


def _make_rrtmg_sw():
    from tenstream_tpu.spectral.rrtmg_sw import RrtmgSwOptics

    return RrtmgSwOptics()


def _make_repwvl():
    from tenstream_tpu.spectral.repwvl import RepwvlOptics

    return RepwvlOptics()


_BACKENDS = {
    "gray": GrayGasOptics,
    "synthck": SyntheticCKD,
    "ecckd": _make_ecckd,
    "rrtmg_sw": _make_rrtmg_sw,
    "repwvl": _make_repwvl,
}


class SpectralResult(NamedTuple):
    edir: Optional[jnp.ndarray]  # (Nz+1, Nx, Ny) [W/m2]
    edn: jnp.ndarray
    eup: jnp.ndarray
    abso: jnp.ndarray  # (Nz, Nx, Ny) [W/m3]


def _specint_1d(solver, atm, backend, a2d, lthermal, lsolar, batched_fields):
    """Spectral integration through the batched two-stream column solver:
    ALL g-points solve in one fused call (the g-point axis is just another
    batch dimension of the column solver)."""
    from tenstream_tpu.pprts.oned import solve_twostream_columns

    grid = solver.grid
    nz, nx, ny = grid.nz, grid.nx, grid.ny
    edir = jnp.zeros((nz + 1, nx, ny), ireals)
    edn = jnp.zeros_like(edir)
    eup = jnp.zeros_like(edir)
    abso = jnp.zeros((nz, nx, ny), ireals)

    use_disort = solver.solver_type == "disort"

    def disort_solve(sp, solar):
        """Per-g-point multi-stream DISORT columns (reference
        `t_solver_disort` dispatch through the specint drivers); the
        g-point axis is vmapped."""
        from tenstream_tpu.ops.disort import disort_fluxes

        kabs_b, ksca_b, g_b = batched_fields(sp, "sw" if solar else "lw")
        dz_b = grid.dz3d[None]
        dtau = (kabs_b + ksca_b) * dz_b
        w0 = ksca_b / jnp.maximum(kabs_b + ksca_b, 1e-30)
        nstr = solver.options.get_int("disort_streams", 8)
        if solar:
            mu0 = solver.sun.mu
            fx = jax.vmap(lambda dt, w, gg, inc: disort_fluxes(
                dt, w, gg, mu0, inc, a2d, nstreams=nstr))
            S, Edn, Eup = fx(dtau, w0, g_b, jnp.asarray(sp.weight, ireals))
            # S is in tilted-plane units, diffuse fluxes horizontal
            # (solver._solve_disort convention)
            S = S * solver.sun.mu
        else:
            planck_b = jnp.asarray(sp.planck, ireals)
            if planck_b.ndim == 2:
                planck_b = planck_b[..., None, None] * jnp.ones((nx, ny), ireals)
            fx = jax.vmap(lambda dt, w, gg, pl: disort_fluxes(
                dt, w, gg, None, 0.0, a2d, planck=pl, nstreams=nstr))
            S, Edn, Eup = fx(dtau, w0, g_b, planck_b)
        net = (S[:, :-1] - S[:, 1:]) + (Edn[:, :-1] - Edn[:, 1:]) + (Eup[:, 1:] - Eup[:, :-1])
        ab = net / dz_b
        return S.sum(0), Edn.sum(0), Eup.sum(0), ab.sum(0)

    def batch_solve(sp, solar):
        if use_disort:
            return disort_solve(sp, solar)
        kabs_b, ksca_b, g_b = batched_fields(sp, "sw" if solar else "lw")
        ngpt = kabs_b.shape[0]
        # move gpt to a trailing batch dim: (nlay, ngpt, nx, ny)
        tr = lambda a: jnp.moveaxis(a, 0, 1)
        dz_b = grid.dz3d[:, None]
        dtau = (tr(kabs_b) + tr(ksca_b)) * dz_b
        w0 = tr(ksca_b) / jnp.maximum(tr(kabs_b) + tr(ksca_b), 1e-30)
        if solar:
            mu0 = solver.sun.mu
            S, Edn, Eup = _ts(dtau, w0, tr(g_b), mu0, sp.weight[:, None, None], a2d[None])
            planck_w = None
        else:
            planck_b = jnp.asarray(sp.planck, ireals)
            if planck_b.ndim == 2:
                planck_b = planck_b[..., None, None] * jnp.ones((nx, ny), ireals)
            S, Edn, Eup = _ts(
                dtau, w0, tr(g_b), -1.0, 0.0, a2d[None],
                planck=jnp.moveaxis(planck_b, 0, 1),
            )
        net = (S[:-1] - S[1:]) + (Edn[:-1] - Edn[1:]) + (Eup[1:] - Eup[:-1])
        ab = net / dz_b
        scale = solver.sun.mu if solar else 1.0
        return (
            S.sum(1) * scale, Edn.sum(1) * scale, Eup.sum(1) * scale, ab.sum(1) * scale,
        )

    def _ts(dtau, w0, g, mu0, inc, alb, planck=None):
        return delta_eddington_twostream_wrap(dtau, w0, g, mu0, inc, alb, planck)

    from tenstream_tpu.ops.twostream import delta_eddington_twostream

    def delta_eddington_twostream_wrap(dtau, w0, g, mu0, inc, alb, planck):
        return delta_eddington_twostream(dtau, w0, g, mu0, inc, alb, planck=planck)

    if lsolar and solver.sun is not None and solver.sun.sun_up:
        S, Edn, Eup, ab = batch_solve(backend.solar(atm), True)
        edir = edir + S
        edn = edn + Edn
        eup = eup + Eup
        abso = abso + ab
    if lthermal:
        S, Edn, Eup, ab = batch_solve(backend.thermal(atm), False)
        edn = edn + Edn
        eup = eup + Eup
        abso = abso + ab

    return SpectralResult(edir, edn, eup, abso)


def _merge_cloud(tau_g, w0_g, g_g, tau_c, w0_c, g_c):
    """Combine gas and cloud optical properties per cell."""
    tau = tau_g + tau_c
    tau_safe = jnp.maximum(tau, 1e-30)
    w0 = (w0_g * tau_g + w0_c * tau_c) / tau_safe
    sca = jnp.maximum(w0 * tau, 1e-30)
    g = (g_g * w0_g * tau_g + g_c * w0_c * tau_c) / sca
    return tau, w0, g


def _to_kfields(tau, w0, g, dz3d):
    kext = tau / dz3d
    return kext * (1.0 - w0), kext * w0, g


def specint_pprts(
    solver: PprtsSolver,
    atm: Atmosphere,
    albedo: float,
    lthermal: bool,
    lsolar: bool,
    specint: str = "synthck",
    lwc=None,
    reliq=None,
    iwc=None,
    reice=None,
    extra_tau=None,
    extra_w0=None,
    extra_g=None,
    band_chunk: int = 16,
    albedo_2d=None,
    time: Optional[float] = None,
    max_solution_err: float = 0.0,
    max_solution_time: float = 0.0,
    cld_frac=None,
    mcica_seed: int = 712,
    overlap: str = "maxrand",
    buildings=None,
    bands: Optional[Tuple[int, int]] = None,
) -> SpectralResult:
    """Full-spectrum solve.  The solver's grid z-axis must match
    atm.nlay; sun angles must be set for solar.

    `bands=(lo, hi)` restricts the spectral loop to g-points
    [lo, hi) — the reference's `-rrtmg_bands`/`-ecckd_bands` subset
    option (`rrtmg/rrtmg/optprop_rrtmg.F90:364-388`,
    `ecckd/ecckd_pprts.F90:358-366`); the result is then a PARTIAL
    spectral integral (debug/scaling-study semantics, as upstream).

    With `time` (simulation time [s]) and positive
    `max_solution_err`/`max_solution_time`, band chunks whose
    extrapolated absorption error stays small are skipped and their
    cached contribution reused (reference adaptive spectral integration,
    `src/adaptive_spectral_integration.F90`, options
    `-max_solution_err/-max_solution_time`).

    With `cld_frac` (nlay, nx, ny) in [0, 1] (or `atm.cfrac`), partial
    cloudiness is handled by McICA: every g-point sees an independent
    stochastic binary subcolumn with `overlap` ('maxrand' default) and
    the in-cloud condensate lwc/cld_frac (reference
    `mcica_subcol_gen_{lw,sw}.f90` consumed by the rrtmg drivers)."""
    backend = _BACKENDS[specint]() if isinstance(specint, str) else specint
    grid = solver.grid
    scheme = solver.scheme
    nz, nx, ny = grid.nz, grid.nx, grid.ny
    # solve-grid layers: nz reduced by atm_collapse (solver option);
    # results/warm-start states live on the solve grid
    nzs = solver.nz_solve if hasattr(solver, "nz_solve") else nz
    assert atm.nlay == nz, f"atmosphere layers {atm.nlay} != grid nz {nz}"

    # buildings: attach and derive per-g-point face emission from the
    # face temperature (reference: specint drivers clone the buildings,
    # set spec_buildings%planck per band via the backend Planck function
    # and accumulate incoming/outgoing, `ecckd/ecckd_pprts.F90:339-448`)
    if buildings is None:
        buildings = getattr(solver, "_buildings", None)
    pb_gpt = None  # (ngpt_thermal,) or (ngpt_thermal, nz, nx, ny)
    if buildings is not None:
        if buildings.planck is not None:
            raise ValueError(
                "specint_pprts computes the per-band building emission "
                "from buildings.temp; provide temperatures, not planck "
                "(reference CHKERR, ecckd/ecckd_pprts.F90:350-352)"
            )
        solver.set_buildings(buildings)
        if lthermal and buildings.temp is not None:
            if not hasattr(backend, "planck_at"):
                raise NotImplementedError(
                    f"backend {type(backend).__name__} has no planck_at(); "
                    "thermal building emission needs a per-g-point Planck "
                    "function (use specint='ecckd')"
                )
            pb_gpt = np.asarray(backend.planck_at(buildings.temp), np.float32)

    # cloud fields default from the atmosphere container (reference
    # specint reads lwc/reliq/iwc/reice off t_tenstr_atm)
    if lwc is None and atm.lwc is not None:
        lwc, reliq = atm.lwc, atm.reliq
    if iwc is None and atm.iwc is not None:
        iwc, reice = atm.iwc, atm.reice
    if cld_frac is None and atm.cfrac is not None:
        cld_frac = atm.cfrac

    # McICA: scale condensate to its in-cloud value; per-gpt binary
    # masks are applied to the cloud optical depths in batched_fields
    # (cloud tau is linear in condensate at fixed reff, so masking tau
    # equals masking the condensate exactly)
    if cld_frac is not None:
        import jax as _jax

        from tenstream_tpu.spectral.mcica import mcica_subcolumns

        f_cld = jnp.clip(jnp.asarray(cld_frac, ireals), 0.0, 1.0)
        f_safe = jnp.maximum(f_cld, 1e-6)
        if lwc is not None:
            lwc = jnp.asarray(lwc, ireals) / f_safe
        if iwc is not None:
            iwc = jnp.asarray(iwc, ireals) / f_safe

        def _mcica_mask(kind: str, ngpt: int):
            key = _jax.random.fold_in(
                _jax.random.PRNGKey(mcica_seed), 0 if kind == "sw" else 1
            )
            return mcica_subcolumns(key, f_cld, ngpt, overlap=overlap)
    else:
        _mcica_mask = None

    dz3d = grid.dz3d
    a2d = jnp.full((nx, ny), albedo, ireals) if albedo_2d is None else jnp.asarray(albedo_2d, ireals)

    # cloud optics (band-independent geometric-optics water cloud)
    if lwc is not None:
        reff = jnp.asarray(reliq, ireals) if reliq is not None else jnp.full_like(jnp.asarray(lwc, ireals), 10.0)
        tau_c, w0_c, g_c = cloud_optprops(jnp.asarray(lwc, ireals), reff, dz3d)
    else:
        tau_c = jnp.zeros((nz, nx, ny), ireals)
        w0_c = jnp.zeros_like(tau_c)
        g_c = jnp.zeros_like(tau_c)

    has_gpt_clouds = lwc is not None and hasattr(backend, "cloud_optprops_gpt")
    if lwc is not None:
        reff_cells = (
            jnp.asarray(reliq, ireals)
            if reliq is not None
            else jnp.full((nz, nx, ny), 10.0, ireals)
        )

    has_gpt_ice = iwc is not None and hasattr(backend, "ice_optprops_gpt")
    if iwc is not None:
        reice_cells = (
            jnp.asarray(reice, ireals)
            if reice is not None
            else jnp.full((nz, nx, ny), 30.0, ireals)
        )

    def to3d(a):
        """(ngpt, nlay) column fields broadcast to (ngpt, nlay, nx, ny);
        per-column (ngpt, nlay, nx, ny) backend output passes through."""
        a = jnp.asarray(a, ireals)
        if a.ndim == 2:
            return a[..., None, None] * jnp.ones((nx, ny), ireals)
        return a

    def batched_fields(sp: SpectralOptProps, kind: str = "sw", gsel: slice = slice(None)):
        """Broadcast the column gas props to 3-D and merge liquid + ice
        clouds (per-gpoint optics when the backend provides them).

        `gsel` restricts to a g-point chunk so the (ngpt, nlay, nx, ny)
        temporaries never materialize for the whole spectrum at once —
        at 256^2 x 128 a single full-spectrum field is >1 GB and the
        assembly temporaries exhaust HBM (the memory wall the BASELINE
        config-4 scene exposes)."""
        tau_g = to3d(sp.tau[gsel])
        w0_g = to3d(sp.w0[gsel])
        g_g = to3d(sp.g[gsel])
        if has_gpt_clouds:
            tc, wc, gc = backend.cloud_optprops_gpt(
                kind, jnp.asarray(lwc, ireals), reff_cells, dz3d, gsel=gsel
            )
        else:
            tc, wc, gc = tau_c[None], w0_c[None], g_c[None]
        mcmask = None
        if _mcica_mask is not None:
            mcmask = _mcica_mask(kind, sp.tau.shape[0]).astype(ireals)[gsel]
        if mcmask is not None and lwc is not None:
            tc = tc * mcmask
        tau, w0, g = _merge_cloud(tau_g, w0_g, g_g, tc, wc, gc)
        if has_gpt_ice:
            ti, wi, gi = backend.ice_optprops_gpt(
                kind, jnp.asarray(iwc, ireals), reice_cells, dz3d, gsel=gsel
            )
            if mcmask is not None:
                ti = ti * mcmask
            tau, w0, g = _merge_cloud(tau, w0, g, ti, wi, gi)
        if extra_tau is not None:
            # spectrally-gray extra optical properties (aerosol layers,
            # vegetation canopies — reference `opt_tau/w0/g` inputs of
            # specint_pprts and `vegetation_optprop.F90`)
            te = jnp.asarray(extra_tau, ireals)
            we = jnp.zeros_like(te) if extra_w0 is None else jnp.asarray(extra_w0, ireals)
            ge = jnp.zeros_like(te) if extra_g is None else jnp.asarray(extra_g, ireals)
            tau, w0, g = _merge_cloud(tau, w0, g, te[None], we[None], ge[None])
        kabs, ksca, g = _to_kfields(tau, w0, g, dz3d[None])
        return delta_scale(kabs, ksca, g)

    if solver.solver_type in ("2str", "schwarzschild", "disort"):
        if buildings is not None:
            raise ValueError("buildings need a 3-D solver (got "
                             f"solver_type={solver.solver_type!r})")
        return _specint_1d(solver, atm, backend, a2d, lthermal, lsolar, batched_fields)

    edir_acc = None
    edn = jnp.zeros((nzs + 1, nx, ny), ireals)
    eup = jnp.zeros_like(edn)
    abso = jnp.zeros((nzs, nx, ny), ireals)

    def nonlocal_edir_add(contrib):
        nonlocal edir_acc
        if edir_acc is None:
            edir_acc = jnp.zeros((scheme.ndir, nzs + 1, nx, ny), ireals)
        edir_acc = edir_acc + contrib

    def run_chunks(sp: SpectralOptProps, solar: bool, uid_tag: str):
        nonlocal edir_acc, edn, eup, abso
        ngpt = sp.tau.shape[0]
        g_lo, g_hi = 0, ngpt
        if bands is not None:
            g_lo, g_hi = max(0, bands[0]), min(ngpt, bands[1])
        has_planck = sp.planck is not None
        # two program variants: warm (x0 consumed) and cold (zero guess
        # created INSIDE the program; the x0 input slot is a dummy —
        # a real cold-x0 buffer is 0.6 GB at BASELINE scale, chunk=2)
        vfns = {}
        for w in (False, True):
            fn = solver._solve_fn(
                lthermal=has_planck, lsolar=solar,
                has_planck_srfc=sp.planck_srfc is not None, use_x0=w,
            )
            vfns[w] = jax.vmap(fn, in_axes=(0, 0, 0, None, 0, 0, 0, 0, 0, 0))

        zeros_planck = jnp.zeros((nz + 1, nx, ny), ireals)
        if not hasattr(solver, "_spectral_cache"):
            solver._spectral_cache = {}
            solver._spectral_trackers = {}
        adaptive = time is not None and max_solution_err > 0 and max_solution_time > 0
        # cross-band seeding (reference initial-guess-from-last-uid
        # analogue, `src/pprts.F90:2536-2558`): a cold chunk starts from
        # the PREVIOUS chunk's converged states.  MEASURED NET-NEGATIVE
        # on the BASELINE 256^2 scene (167 vs 177 cols/s): the adjacent
        # band's state seeds BiCGStab's shadow residual rhat = r0 with a
        # direction that fits the WRONG operator, degrading the Krylov
        # sequence more than the smaller initial residual helps.  OFF by
        # default; kept as an option for Richardson-type solvers where
        # an initial guess cannot mislead.
        band_seed = solver.options.get_bool("specint_band_seed", False)
        extrapolate = solver.options.get_bool("specint_warm_extrapolate", False)
        if not hasattr(solver, "_extrap_states"):
            solver._extrap_states = {}
        extrap_states = solver._extrap_states
        last_x = None

        # Difficulty-grouped band chunks (round-3 verdict item 3):
        # vmapped lanes share the while-loop trip count, so a
        # 20-iteration band pays its chunk partner's 200 — measured 36%
        # SLOWER than chunk=1 at 256^2 in natural band order.  After the
        # first solve of a uid_tag the bands are reordered by their
        # measured per-band niter (hard with hard) and the grouping is
        # FROZEN so chunk cache keys stay stable.  Warm-start states
        # survive the one-time regroup: a per-band index maps every
        # g-point to (chunk key, row) of the previous solve, and a
        # group whose exact key is missing gathers its x0/omega rows
        # band-by-band.  Reference contrast: strictly sequential band
        # loop, `rrtmg/rrtmg/pprts_rrtmg.F90:214-268`.
        # (grouping is disabled under adaptive spectral integration: the
        # error trackers and skip cache are keyed per chunk, and a
        # regroup would reset their history every time)
        group_opt = (band_chunk > 1 and not adaptive
                     and solver.options.get_bool("specint_band_group", True))
        if not hasattr(solver, "_band_order"):
            solver._band_order = {}
            solver._band_rows = {}
        order = solver._band_order.get(uid_tag) if group_opt else None
        band_rows = solver._band_rows.setdefault(uid_tag, {})
        gids_all = np.arange(g_lo, g_hi)
        if order is not None:
            known = [g for g in order if g_lo <= g < g_hi]
            # bands outside the recorded order (e.g. the order was frozen
            # on a `bands=` subset and this call covers more) append in
            # natural order — NEVER silently dropped
            extra = [g for g in gids_all if g not in set(known)]
            gids_all = np.asarray(known + extra, dtype=np.int64)
        groups = [gids_all[i:i + band_chunk]
                  for i in range(0, len(gids_all), band_chunk)]
        group_niters = []  # (gids, device niter) for the regroup decision

        def gather_prev(gids):
            """Per-band warm-state gather across old chunk boundaries:
            (x0, om0) stacked from the rows recorded in band_rows, or
            None if any band lacks a cached state."""
            xs, oms = [], []
            for gg in gids:
                ent = band_rows.get(int(gg))
                if ent is None:
                    return None
                key, row = ent
                sol = solver.solutions.get(key)
                if sol is None or sol.ediff is None:
                    return None
                e = sol.ediff
                e = e[row] if not isinstance(e, np.ndarray) else jnp.asarray(e[row])
                xs.append(e.astype(ireals))
                oms.append(jnp.asarray(sol.diff_omega)[row])
            return jnp.stack(xs), jnp.stack(oms)

        for gsel_ids in groups:
            nb = len(gsel_ids)
            lo, hi = int(gsel_ids[0]), int(gsel_ids[-1]) + 1
            natural = bool(np.all(np.diff(gsel_ids) == 1)) if nb > 1 else True
            gsel = slice(lo, hi) if natural else np.asarray(gsel_ids)
            cache_key = ((uid_tag, lo) if natural and order is None
                         else (uid_tag, tuple(int(gg) for gg in gsel_ids)))
            prev = solver.solutions.get(cache_key)

            if adaptive and cache_key in solver._spectral_cache:
                from tenstream_tpu.pprts.adaptive import SolutionErrorTracker

                tracker = solver._spectral_trackers.setdefault(cache_key, SolutionErrorTracker())
                if not tracker.need_new_solution(time, max_solution_err, max_solution_time):
                    cached = solver._spectral_cache[cache_key]
                    if cached[0] is not None:
                        nonlocal_edir_add(cached[0])
                    _acc_diff(cached[1])
                    _acc_abso(cached[2], solar)
                    solver._spectral_skips = getattr(solver, "_spectral_skips", 0) + 1
                    continue
            warm = prev is not None and prev.ediff is not None
            om0 = prev.diff_omega if prev is not None else jnp.ones((nb,), ireals)
            if warm:
                # np.asarray is a no-copy view for host-cached f32 states
                x0 = (np.asarray(prev.ediff, dtype=ireals)
                      if isinstance(prev.ediff, np.ndarray)
                      else prev.ediff.astype(ireals))
                # time-stepping extrapolation (opt-in): in the perturbed
                # stepping regime the scene drifts smoothly, so
                # x0 = 2 x(t-1) - x(t-2) tracks the drift instead of
                # lagging one step.  Same-band seed (unlike the measured-
                # net-negative cross-band seeding: here the shadow
                # residual sees its OWN operator).  Costs one extra f32
                # state per chunk, so it requires specint_cache=f32.
                old = extrap_states.get(cache_key) if extrapolate else None
                if old is not None and jnp.shape(old) == jnp.shape(x0):
                    x0 = 2.0 * jnp.asarray(x0) - jnp.asarray(old, ireals)
            else:
                gathered = gather_prev(gsel_ids) if prev is None else None
                if gathered is not None:  # regrouped chunk: row-gathered
                    x0, om0 = gathered
                    warm = True
                elif band_seed and last_x is not None and last_x.shape[0] == nb:
                    x0 = last_x
                    warm = True
                else:
                    x0 = np.zeros((nb, 1, 1, 1, 1), np.float32)  # dummy slot
            vfn = vfns[warm]

            if has_planck:
                planck_b = to3d(jnp.asarray(sp.planck)[gsel])
            else:
                planck_b = jnp.zeros((nb,) + zeros_planck.shape, ireals)
            if sp.planck_srfc is not None:
                ps = jnp.asarray(sp.planck_srfc, ireals)[gsel]
                psrfc_b = ps if ps.ndim == 3 else ps[..., None, None] * jnp.ones((nx, ny), ireals)
            else:
                psrfc_b = jnp.zeros((nb, nx, ny), ireals)
            toa_b = jnp.asarray(sp.weight)[gsel] if solar else jnp.zeros((nb,), ireals)

            if x0.shape[0] != nb:  # trailing partial chunk
                x0 = x0[:nb]
                om0 = om0[:nb]
            kabs_b, ksca_b, g_b = batched_fields(
                sp, "sw" if solar else "lw", gsel=gsel
            )
            if pb_gpt is not None and has_planck:
                pb_sl = jnp.asarray(pb_gpt, ireals)[gsel]
                if pb_sl.ndim == 1:  # scalar building temperature
                    pb_b = pb_sl[:, None, None, None] * jnp.ones((nz, nx, ny), ireals)
                else:
                    pb_b = pb_sl
            else:
                pb_b = jnp.zeros((nb, nz, nx, ny), ireals)
            edir_b, ediff_b, abso_b, niter_b, om_b, res_b, tol_b = vfn(
                kabs_b, ksca_b, g_b, a2d,
                planck_b, psrfc_b, toa_b, x0, om0, pb_b,
            )
            # deferred strict-convergence bookkeeping: metadata stays
            # device-side; ONE host sync at the end of this spectral call
            # checks every chunk (reference abort-on-incomplete default)
            solver._pending_convergence[cache_key] = (niter_b, res_b, tol_b)
            for pos, gg in enumerate(gsel_ids):
                band_rows[int(gg)] = (cache_key, pos)
            if group_opt and order is None:
                group_niters.append((gsel_ids, niter_b))
            last_x = ediff_b  # cross-band seed for the next cold chunk
            from tenstream_tpu.pprts.solver import Solution

            # Warm-start cache: only ediff (the x0 initial guess) and
            # omega are consumed on re-solve, and idle solutions are
            # kept bf16-compressed (reference `compress_solution`,
            # `src/pprts_base.F90:137-169,425`).  Full-precision f32
            # caching of every chunk's per-band states measured 11.5 GB
            # at 192^2x127 (32+32 gpt) and OOMed the chip during the
            # thermal trace.  "f32" restores EXACT warm starts (re-solves
            # of an unchanged band converge in 0 iterations; bf16
            # quantization of near-converged states measurably re-burns
            # iterations every re-solve: 651 vs 1435 cols/s on the 64^2
            # bench).  "host" keeps the exact f32 states in HOST memory
            # instead (no HBM cost; one device<->host round-trip per
            # chunk per solve) — warm starts beyond HBM when the host
            # link is a real PCIe bus.  MEASURED CAVEAT: on a tunneled
            # TPU (axon remote chip) the "PCIe" copy is a network copy;
            # at 256^2x128 the ~43+43 GB/solve round-trip made the warm
            # solve SLOWER than cold (>1700s vs 1109s), so "auto" does
            # NOT select host — it remains opt-in for locally attached
            # chips.  "auto" (default): f32 while the whole-run cache is
            # small, bf16 while moderate; at large grids fall back to a
            # SOLAR-ONLY bf16 cache before giving up entirely — solar
            # chunks are the expensive ones (65-78 BiCGStab iterations
            # per perturbed step at 256^2 vs 2-6 for thermal,
            # docs/BENCH_256_r4.log), and one spectrum's bf16 states are
            # 1/4 of the full-f32 footprint (4.8 GB at 256^2x128, which
            # fits HBM next to the chunk=1 solve working set).
            cache_mode = solver.options.get("specint_cache", "auto")
            if cache_mode == "auto":
                f32_bytes_total = 2 * ngpt * scheme.ndiff * (nzs + 1) * nx * ny * 4
                # NO large-grid solar-bf16 tier: measured at 256^2x127
                # (docs/BENCH_256_r5.log A2 vs B, same code, only this
                # knob) the tier is a net NEGATIVE — 393.8 vs 428.7
                # cols/s perturbed — the bf16-quantized warm starts
                # re-burn iterations and the cache writes cost on top
                # (the same mechanism measured at 64^2 in round 3:
                # 651 vs 1435 cols/s).  Above the bf16 threshold the
                # cache is OFF.
                cache_mode = ("f32" if f32_bytes_total < 1.5e9
                              else "bf16" if f32_bytes_total < 4e9
                              else "off")
            if cache_mode == "host":
                # defer the device->host materialization by one chunk so
                # the PCIe copy overlaps the next chunk's device compute
                try:
                    ediff_b.copy_to_host_async()
                except Exception:
                    pass
                _host_pending.append(
                    (cache_key, ediff_b, om_b, niter_b, res_b, tol_b)
                )
                if len(_host_pending) > 1:
                    k0, e0, o0, n0, r0, t0 = _host_pending.pop(0)
                    solver.solutions[k0] = Solution(
                        None, np.asarray(e0), None, o0, n0, r0, diff_tol=t0
                    )
            else:
                if cache_mode == "off":
                    x_keep = None
                elif cache_mode == "bf16":
                    x_keep = ediff_b.astype(jnp.bfloat16)
                else:
                    x_keep = ediff_b
                if (extrapolate and cache_mode == "f32"
                        and prev is not None and prev.ediff is not None):
                    # keep x(t-1) for the next step's extrapolated seed
                    extrap_states[cache_key] = prev.ediff
                solver.solutions[cache_key] = Solution(
                    None, x_keep, None, om_b, niter_b, res_b, diff_tol=tol_b
                )

            # accumulate in W, convert at the end
            edir_contrib = None if edir_b is None else edir_b.sum(0)
            ediff_contrib = ediff_b.sum(0)
            abso_contrib = abso_b.sum(0)
            if edir_contrib is not None:
                nonlocal_edir_add(edir_contrib)
            _acc_diff(ediff_contrib)
            _acc_abso(abso_contrib, solar)

            if adaptive:
                from tenstream_tpu.pprts.adaptive import (
                    SolutionErrorTracker,
                    abso_change_maxnorm,
                )

                tracker = solver._spectral_trackers.setdefault(cache_key, SolutionErrorTracker())
                old = solver._spectral_cache.get(cache_key)
                err = abso_change_maxnorm(abso_contrib, old[2]) if old is not None else 0.0
                tracker.record(time, err)
                # host-side storage: the adaptive skip cache would
                # otherwise pin ~3 full flux fields per chunk in HBM
                solver._spectral_cache[cache_key] = tuple(
                    None if c is None else np.asarray(c)
                    for c in (edir_contrib, ediff_contrib, abso_contrib)
                )

        # freeze the difficulty grouping from the first solve's measured
        # per-band iteration counts (ONE batched device->host fetch)
        if group_opt and order is None and group_niters:
            covered = sum(len(g) for g, _ in group_niters)
            if covered == len(gids_all):
                nit = np.asarray(jnp.concatenate(
                    [jnp.atleast_1d(n).ravel().astype(jnp.float32)
                     for _, n in group_niters]))
                gid_cat = np.concatenate([g for g, _ in group_niters])
                solver._band_order[uid_tag] = gid_cat[np.argsort(
                    nit, kind="stable")]
        elif group_opt and order is not None:
            # the regrouped keys now carry all warm states; drop this
            # uid_tag's orphaned pre-regroup chunk solutions
            live = {key for key, _ in band_rows.values()}
            for k in list(solver.solutions):
                if (isinstance(k, tuple) and len(k) == 2
                        and k[0] == uid_tag and k not in live):
                    del solver.solutions[k]

        from tenstream_tpu.pprts.solver import Solution

        for k0, e0, o0, n0, r0, t0 in _host_pending:
            solver.solutions[k0] = Solution(
                None, np.asarray(e0), None, o0, n0, r0, diff_tol=t0
            )
        _host_pending.clear()

    _host_pending = []
    ediff_acc_solar = jnp.zeros((scheme.ndiff, nzs + 1, nx, ny), ireals)
    ediff_acc_thermal = jnp.zeros_like(ediff_acc_solar)
    abso_solar = jnp.zeros((nzs, nx, ny), ireals)
    abso_thermal = jnp.zeros_like(abso_solar)
    _state = {"solar": False}

    def _acc_diff(e):
        nonlocal ediff_acc_solar, ediff_acc_thermal
        if _state["solar"]:
            ediff_acc_solar = ediff_acc_solar + e
        else:
            ediff_acc_thermal = ediff_acc_thermal + e

    def _acc_abso(a, solar):
        nonlocal abso_solar, abso_thermal
        if solar:
            abso_solar = abso_solar + a
        else:
            abso_thermal = abso_thermal + a

    if lsolar:
        if solver.sun is None or not solver.sun.sun_up:
            pass
        else:
            _state["solar"] = True
            run_chunks(backend.solar(atm), True, "solar")
    if lthermal:
        _state["solar"] = False
        run_chunks(backend.thermal(atm), False, "thermal")

    # ONE deferred convergence sync for the whole spectral call
    # (reference `-accept_incomplete_solve` abort default; the per-chunk
    # niter/res/tol were recorded device-side in the band loop)
    solver.check_convergence()

    # convert accumulated [W] states to [W/m2]
    diff_scale = solver._diff_scale_to_wm2()
    inward = scheme.diff_inward()
    mu = solver.sun.mu if (lsolar and solver.sun is not None) else 1.0

    def diff_to_edn_eup(acc, scale_mu):
        e = acc * diff_scale
        edn_ = sum(e[d] for d in range(scheme.difftop.dof) if inward[d]) / scheme.difftop.area_divider
        eup_ = sum(e[d] for d in range(scheme.difftop.dof) if not inward[d]) / scheme.difftop.area_divider
        return edn_ * scale_mu, eup_ * scale_mu

    edn_s, eup_s = diff_to_edn_eup(ediff_acc_solar, mu)
    edn_t, eup_t = diff_to_edn_eup(ediff_acc_thermal, 1.0)
    edn = edn_s + edn_t
    eup = eup_s + eup_t
    abso = abso_solar * mu + abso_thermal

    edir = None
    if edir_acc is not None:
        e = edir_acc * solver._dir_scale_to_wm2()
        edir = e[: scheme.dirtop.dof].sum(0) / scheme.dirtop.area_divider * mu

    if buildings is not None:
        from tenstream_tpu.core.types import PI
        from tenstream_tpu.pprts.buildings import (
            building_incoming_from_fields,
            face_masks,
        )

        # incoming is linear in the flux fields, so one extraction on the
        # spectrally accumulated [W] states equals the reference's
        # per-band accumulation (`ecckd_pprts.F90:440-448`)
        ediff_tot = ediff_acc_solar * mu + ediff_acc_thermal
        edir_tot = None if edir_acc is None else edir_acc * mu
        ef, inc = building_incoming_from_fields(
            scheme, buildings, ediff_tot, edir_tot,
            grid.az, grid.dx, grid.dy, grid.dz3d,
            xinc=solver.sun.xinc if solver.sun is not None else 1,
            yinc=solver.sun.yinc if solver.sun is not None else 1,
        )
        # broadband face emission: sum of the per-g-point Planck values
        B_tot = 0.0
        if pb_gpt is not None:
            B_tot = pb_gpt.sum(0)  # scalar or (nz, nx, ny)
        bld_fluxes = {}
        for k, m in face_masks(buildings).items():
            bld_fluxes[k] = dict(
                edir=jnp.where(m, ef[k], 0.0),
                incoming=jnp.where(m, inc[k], 0.0),
                outgoing=jnp.where(
                    m,
                    buildings.albedo * inc[k]
                    + (1.0 - buildings.albedo) * PI * B_tot,
                    0.0,
                ),
            )
        # written onto the buildings object, like the reference fills
        # opt_buildings%incoming/outgoing (`ecckd_pprts.F90:440-448`);
        # SpectralResult stays a plain (edir, edn, eup, abso) tuple
        buildings.fluxes = bld_fluxes

    return SpectralResult(edir, edn, eup, abso)
