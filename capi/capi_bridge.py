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
