"""Solver-level end-to-end tests for the remaining cube stream schemes
(3_30, 8_12, 8_16, 8_18): LUT generation + full solar solve + energy
balance + octant-switch sanity, mirroring tests/test_scheme_8_10.py.

Parity: reference solver classes `t_solver_{3_30,8_12,8_16,8_18}`
(`src/pprts_base.F90:270-295`) with their `boxmc_*.inc` geometries.
"""

import os

import numpy as np
import pytest

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import LUTAxes, load_or_create_lut
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles

SCHEMES = ["3_30", "8_12", "8_16", "8_18"]


def _tiny_lut(scheme):
    axes = LUTAxes(
        tau=np.array([1e-10, 0.3, 3.0], np.float32),
        w0=np.array([0.0, 0.9], np.float32),
        aspect=np.array([0.5, 1.0, 2.0], np.float32),
        g=np.array([0.0, 0.5], np.float32),
        phi=np.array([0.0, 45.0, 90.0], np.float32),
        theta=np.array([0.0, 40.0, 80.0], np.float32),
    )
    daxes = LUTAxes(axes.tau, axes.w0, axes.aspect, axes.g)
    return load_or_create_lut(
        scheme, axes, daxes, n_photons=1500,
        basename=os.path.join(os.path.dirname(__file__), "data", "luts"),
    )


@pytest.mark.parametrize("scheme", SCHEMES)
def test_solver_end_to_end(scheme):
    lut = _tiny_lut(scheme)
    nz, nx, ny = 5, 6, 6
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), OptProp(lut))
    ka = np.full((nz, nx, ny), 3e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    solver.set_optical_properties(0.3, ka, ks, g)
    solver.set_angles(sundir_from_angles(210.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean() + (abso * 100.0).sum(0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.06, (scheme, balance, incoming)
    assert np.isfinite(abso).all()

    # octant switch keeps the solve finite and balanced
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir2, edn2, eup2, abso2 = map(np.asarray, solver.get_result())
    balance2 = (
        eup2[0].mean() + (abso2 * 100.0).sum(0).mean()
        + (edir2[-1] + edn2[-1] - eup2[-1]).mean()
    )
    assert abs(balance2 - incoming) / incoming < 0.06, (scheme, balance2)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_thermal_end_to_end(scheme):
    """Isothermal medium over a black isothermal surface: fluxes relax
    toward pi*B and absorption stays near zero (detailed balance)."""
    lut = _tiny_lut(scheme)
    nz, nx, ny = 5, 6, 6
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), OptProp(lut))
    ka = np.full((nz, nx, ny), 5e-2, np.float32)  # optically thick
    ks = np.full((nz, nx, ny), 1e-6, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)
    B = 10.0
    planck = np.full((nz + 1, nx, ny), B, np.float32)
    solver.set_optical_properties(0.0, ka, ks, g, planck=planck)
    sol = solver.solve(lthermal=True, lsolar=False)
    _, edn, eup, abso = map(np.asarray, solver.get_result())
    target = np.pi * B
    assert abs(eup[0].mean() - target) / target < 0.05, (scheme, eup[0].mean())
    assert abs(edn[-1].mean() - target) / target < 0.05, (scheme, edn[-1].mean())
    # interior net absorption ~ 0 in isothermal equilibrium
    assert np.abs(abso[1:-1]).max() * 100.0 < 0.05 * target, scheme
