"""Horizontally-uniform consistency: the exact-solution oracle.

With periodic horizontal boundaries, a horizontally-uniform scene's
exact 3-D solution is the 1x1-column periodic solve (every roll is the
identity there), which converges to machine precision for pennies.  Any
NX x NY solve of the same column must reproduce it within a PHYSICAL
W/m2 tolerance — this pins the solver's convergence gates (which scale
atol with the unknown count) to actual flux accuracy, independent of
grid size.  Reference gate analogue: tests/test_pprts_specint
atolerance=0.1 W/m2.  The BASELINE-scale (256^2) variant of this check
runs on the chip via `tools/uniform_accuracy.py`.
"""

import os

import numpy as np
import pytest

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles

_LUTDIR = os.path.join(os.path.dirname(__file__), "data", "luts")


@pytest.fixture(scope="module")
def opp():
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000, basename=_LUTDIR)
    return OptProp(lut)


def _column_profile(nz, rng):
    ka = (1e-4 + 2e-3 * rng.random(nz)).astype(np.float32)
    ks = (1e-3 + 4e-2 * rng.random(nz)).astype(np.float32)
    g = np.full(nz, 0.5, np.float32)
    return ka, ks, g


def _solve(opp, nz, nx, ny, ka, ks, g, planck=None, solar=True):
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    s = PprtsSolver(grid, opp)
    tile = lambda a: np.broadcast_to(a[:, None, None], (a.shape[0], nx, ny)).copy()
    s.set_optical_properties(
        0.25, tile(ka), tile(ks), tile(g),
        planck=None if planck is None else tile(planck),
    )
    s.set_angles(sundir_from_angles(40.0, 35.0))
    s.solve(lthermal=planck is not None, lsolar=solar,
            edirTOA=1000.0 if solar else 0.0)
    return [None if r is None else np.asarray(r) for r in s.get_result()]


@pytest.mark.parametrize("solar", [True, False])
def test_uniform_matches_single_column_oracle(opp, solar):
    nz = 8
    rng = np.random.default_rng(5)
    ka, ks, g = _column_profile(nz, rng)
    planck = None if solar else np.full(nz + 1, 120.0, np.float32)

    exact = _solve(opp, nz, 1, 1, ka, ks, g, planck, solar)
    full = _solve(opp, nz, 16, 16, ka, ks, g, planck, solar)

    for name, e, f in zip(("edir", "edn", "eup"), exact, full):
        if e is None:
            continue
        # physical W/m2 gate, NOT an N-scaled atol: profile vs profile
        prof = f.mean(axis=(1, 2))
        np.testing.assert_allclose(prof, e[:, 0, 0], atol=0.1,
                                   err_msg=f"{name} uniform profile")
        # horizontal uniformity of the 3-D answer itself
        spread = np.abs(f - prof[:, None, None]).max()
        assert spread < 0.1, (name, spread)
