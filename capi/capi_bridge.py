"""Python side of the C API (see tenstream_tpu_capi.c).

Receives flat float32 byte buffers from C, drives the solver, and
returns results as bytes.  Kept deliberately simple: one global solver
instance, matching the reference C wrapper's module-level state
(`c_wrapper/f2c_pprts.F90:95-128`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# honor an explicit JAX_PLATFORMS request even when a sitecustomize
# overrides the jax config (e.g. force-registering an accelerator)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_state = {}


def _f32(buf, shape):
    return np.frombuffer(buf, np.float32).reshape(shape).copy()


def init(nz, nx, ny, dx, dy, dz_bytes, phi0, theta0, solver_name):
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    dz = _f32(dz_bytes, (nz,))
    grid = Grid.create(nz, nx, ny, dx, dy, dz)
    if solver_name in ("2str", "schwarzschild", "disort"):
        solver = PprtsSolver(grid, solver_type=solver_name)
    else:
        lut = load_or_create_lut(
            solver_name, mockup_axes(True), mockup_axes(False), n_photons=2000
        )
        solver = PprtsSolver(grid, OptProp(lut))
    solver.set_angles(sundir_from_angles(phi0, theta0))
    _state["solver"] = solver
    _state["dims"] = (nz, nx, ny)
    return 0


def set_optical_properties(albedo, kabs_b, ksca_b, g_b, planck_b):
    nz, nx, ny = _state["dims"]
    solver = _state["solver"]
    kabs = _f32(kabs_b, (nz, nx, ny))
    ksca = _f32(ksca_b, (nz, nx, ny))
    g = _f32(g_b, (nz, nx, ny))
    planck = None if planck_b is None else _f32(planck_b, (nz + 1, nx, ny))
    solver.set_optical_properties(albedo, kabs, ksca, g, planck=planck)
    return 0


def solve(lthermal, lsolar, edirTOA):
    _state["solver"].solve(lthermal=bool(lthermal), lsolar=bool(lsolar), edirTOA=edirTOA)
    return 0


def get_result():
    edir, edn, eup, abso = _state["solver"].get_result()

    def b(x):
        return None if x is None else np.asarray(x, np.float32).tobytes()

    return (b(edir), b(edn), b(eup), b(abso))


def destroy():
    _state.clear()
    return 0


def specint(nz, nx, ny, dx, dy, phi0, theta0, albedo_thermal, albedo_solar,
            specname, solver_name, plev_b, tlev_b, lwc_b, reliq_b, iwc_b,
            reice_b, lthermal, lsolar):
    """Full-spectrum heating-rate solve (reference `f2c_pprts_rrtmg`,
    `c_wrapper/f2c_pprts_rrtm.F90:48-161`): merge the host slab with the
    background atmosphere, run gas-optics spectral integration for the
    requested kinds, return broadband results on the MERGED grid.

    Deviations (documented): pressures in Pa (not hPa), TOA-first
    ordering (the solver's z convention), float32 buffers.  lwc/iwc are
    g/kg like the reference and converted via layer air density.
    Returns (nz_merged, edir, edn, eup, abso) with flux shapes
    (nz_merged+1, nx, ny) and abso (nz_merged, nx, ny), all bytes.
    """
    from tenstream_tpu.atm import setup_tenstr_atm
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral.specint import specint_pprts

    from tenstream_tpu.core.types import R_DRY_AIR

    plev = _f32(plev_b, (nz + 1, nx, ny)).astype(np.float64)
    tlev = _f32(tlev_b, (nz + 1, nx, ny)).astype(np.float64)
    kw = {}
    rho = (0.5 * (plev[:-1] + plev[1:])) / (
        R_DRY_AIR * 0.5 * (tlev[:-1] + tlev[1:]))  # (nz, nx, ny) [kg/m3]
    if lwc_b is not None:
        kw["lwc"] = _f32(lwc_b, (nz, nx, ny)) * rho  # g/kg -> g/m3
        if reliq_b is not None:
            kw["reliq"] = _f32(reliq_b, (nz, nx, ny))
    if iwc_b is not None:
        kw["iwc"] = _f32(iwc_b, (nz, nx, ny)) * rho
        if reice_b is not None:
            kw["reice"] = _f32(reice_b, (nz, nx, ny))
    atm = setup_tenstr_atm(plev, tlev, **kw)

    # key includes the FULL grid geometry: a matching (nlay, nx, ny) with
    # drifted dz (evolving plev/tlev) or different dx/dy must rebuild the
    # solver, or fluxes would be computed on stale layer thicknesses
    dz_arr = np.asarray(atm.dz, np.float32)
    key = ("specint_solver", atm.nlay, nx, ny, solver_name, dx, dy,
           hash(dz_arr.tobytes()))
    if _state.get("specint_key") != key:
        grid = Grid.create(atm.nlay, nx, ny, dx, dy, dz_arr)
        if solver_name in ("2str", "schwarzschild", "disort"):
            solver = PprtsSolver(grid, solver_type=solver_name)
        else:
            lut = load_or_create_lut(
                solver_name, mockup_axes(True), mockup_axes(False), n_photons=2000
            )
            solver = PprtsSolver(grid, OptProp(lut))
        _state["specint_key"] = key
        _state["specint_solver"] = solver
    solver = _state["specint_solver"]
    solver.set_angles(sundir_from_angles(phi0, theta0))

    shp_lvl = (atm.nlay + 1, nx, ny)
    shp_lay = (atm.nlay, nx, ny)
    edir = np.zeros(shp_lvl, np.float32)
    edn = np.zeros(shp_lvl, np.float32)
    eup = np.zeros(shp_lvl, np.float32)
    abso = np.zeros(shp_lay, np.float32)
    # the reference runs thermal and solar as separate sub-solves with
    # their own broadband albedos (`compute_thermal`/`compute_solar`)
    if lthermal:
        r = specint_pprts(solver, atm, albedo_thermal, lthermal=True,
                          lsolar=False, specint=specname)
        edn += np.asarray(r.edn); eup += np.asarray(r.eup)
        abso += np.asarray(r.abso)
    if lsolar:
        r = specint_pprts(solver, atm, albedo_solar, lthermal=False,
                          lsolar=True, specint=specname)
        if r.edir is not None:
            edir += np.asarray(r.edir)
        edn += np.asarray(r.edn); eup += np.asarray(r.eup)
        abso += np.asarray(r.abso)

    return (int(atm.nlay), edir.tobytes(), edn.tobytes(), eup.tobytes(),
            abso.tobytes())
