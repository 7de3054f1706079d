"""Buildings tests (reference `tests/test_buildings/`)."""

import numpy as np
import pytest

from tenstream_tpu.pprts.buildings import Buildings
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def test_building_shadow_and_roof_reflection(opp_small):
    import jax.numpy as jnp

    nz, nx, ny = 6, 12, 12
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, opp_small)

    ka = np.full((nz, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)

    solid = np.zeros((nz, nx, ny), bool)
    solid[3:, 5:7, 5:7] = True  # a tower occupying the lower half

    solver.set_optical_properties(0.1, ka, ks, g)
    solver.set_angles(sundir_from_angles(0.0, 1e-3))  # overhead sun
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.8))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())

    # under the building (below roof level) direct radiation is blocked
    assert edir[-1, 6, 6] < 1.0, edir[-1, 6, 6]
    # next to the building the beam passes
    assert edir[-1, 0, 0] > 950.0
    # the bright roof reflects upward: eup above the roof level exceeds
    # the far-field ground reflection (albedo 0.1)
    assert eup[2, 6, 6] > eup[2, 0, 0] * 2.0, (eup[2, 6, 6], eup[2, 0, 0])


def test_building_masking_conserves_finiteness(opp_small):
    import jax.numpy as jnp

    nz, nx, ny = 5, 6, 6
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, opp_small)
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-3, np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    solid = np.zeros((nz, nx, ny), bool)
    solid[4, :, :] = True  # a full solid floor
    solver.set_optical_properties(0.2, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.3))
    sol = solver.solve(lthermal=False, lsolar=True, edirTOA=500.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    for a in (edir, edn, eup, abso):
        assert np.isfinite(a).all()


def test_building_side_wall_reflection_and_emission(opp_small):
    import jax.numpy as jnp

    nz, nx, ny = 6, 12, 12
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    ka = np.full((nz, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)

    solid = np.zeros((nz, nx, ny), bool)
    solid[2:, 6:8, 5:7] = True  # tower with west wall at x-face 6

    # the sun stands at phi=90 -> photons travel -x and hit the tower's
    # EAST wall (x-face 8)
    solver = PprtsSolver(grid, opp_small)
    solver.set_optical_properties(0.05, ka, ks, g)
    solver.set_angles(sundir_from_angles(90.0, 60.0))
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.9))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    assert np.isfinite(edn).all() and np.isfinite(eup).all()
    # the sunlit east wall reflects: columns just east of the tower see
    # far more diffuse at wall height than the shadow side west of it
    west = edn[3:, 5, 5:7].mean() + eup[3:, 5, 5:7].mean()
    east = edn[3:, 9, 5:7].mean() + eup[3:, 9, 5:7].mean()
    assert east > west * 1.2 and east > 50.0, (west, east)

    # pure thermal: hot walls irradiate adjacent columns symmetrically
    solver2 = PprtsSolver(grid, opp_small)
    solver2.set_optical_properties(0.05, ka, ks, g)
    solver2.set_angles(sundir_from_angles(0.0, 40.0))
    hot = np.zeros((nz, nx, ny), np.float32)
    hot[solid] = 10.0
    solver2.set_buildings(
        Buildings(solid=jnp.asarray(solid), albedo=0.1, planck=jnp.asarray(hot))
    )
    planck = np.zeros((nz + 1, nx, ny), np.float32)
    solver2.solve(lthermal=True, lsolar=False)
    _, edn2, eup2, _ = map(np.asarray, solver2.get_result())
    near = edn2[4, 5, 5] + edn2[4, 8, 5]
    far = edn2[4, 0, 0] + edn2[4, 11, 11]
    assert near > far + 1.0, (near, far)
