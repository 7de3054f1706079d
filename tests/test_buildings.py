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


def test_building_face_fluxes(opp_small):
    """Per-face incoming/outgoing extraction (reference
    `fill_buildings_arr`, `src/pprts.F90:5986-6249`)."""
    import jax.numpy as jnp

    nz, nx, ny = 6, 12, 12
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, opp_small)
    ka = np.full((nz, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)
    solid = np.zeros((nz, nx, ny), bool)
    solid[3:, 5:7, 5:7] = True

    solver.set_optical_properties(0.1, ka, ks, g)
    solver.set_angles(sundir_from_angles(0.0, 1e-3))  # overhead sun
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.8))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    fl = solver.get_building_fluxes()

    roof = {k: np.asarray(v) for k, v in fl["roof"].items()}
    # the roof (top of cell 3 in the tower footprint) sees ~the TOA beam
    assert 900.0 < roof["edir"][3, 6, 6] < 1050.0, roof["edir"][3, 6, 6]
    assert roof["incoming"][3, 6, 6] >= roof["edir"][3, 6, 6]
    # outgoing = albedo * incoming (no thermal emission here)
    np.testing.assert_allclose(
        roof["outgoing"][3, 6, 6], 0.8 * roof["incoming"][3, 6, 6], rtol=1e-5
    )
    # non-exposed cells carry nothing
    assert roof["incoming"][4, 6, 6] == 0.0
    assert roof["incoming"][3, 0, 0] == 0.0
    # walls see only diffuse (overhead sun): small but nonnegative
    for k in ("wall_x_low", "wall_x_high", "wall_y_low", "wall_y_high"):
        w = np.asarray(fl[k]["incoming"])
        assert w.min() >= 0.0
        assert w[3, 5, 5] < roof["incoming"][3, 6, 6]


def test_building_face_fluxes_thermal(opp_small):
    """Thermal emission from building faces shows up in outgoing."""
    import jax.numpy as jnp

    nz, nx, ny = 5, 8, 8
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)
    solver = PprtsSolver(grid, opp_small)
    ka = np.full((nz, nx, ny), 1e-4, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)
    planck = np.full((nz + 1, nx, ny), 10.0, np.float32)
    solid = np.zeros((nz, nx, ny), bool)
    solid[3:, 3:5, 3:5] = True
    bpl = jnp.where(jnp.asarray(solid), 20.0, 0.0)

    solver.set_optical_properties(0.05, ka, ks, g, planck=planck)
    solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.1, planck=bpl))
    solver.solve(lthermal=True, lsolar=False)
    fl = solver.get_building_fluxes()
    roof = {k: np.asarray(v) for k, v in fl["roof"].items()}
    # outgoing dominated by emission (1-a)*pi*B = 0.9*pi*20 ~ 56.5
    assert abs(roof["outgoing"][3, 4, 4] - (0.1 * roof["incoming"][3, 4, 4] + 0.9 * np.pi * 20.0)) < 1e-3
    # sky longwave onto the roof: thin atmosphere above (tau ~ 0.03)
    # emits a ~W/m2-scale downwelling
    assert roof["incoming"][3, 4, 4] > 0.5


def test_specint_buildings(opp_small):
    """Buildings through the full-spectrum API: per-band Planck emission
    from the face temperature and spectrally accumulated per-face fluxes
    (reference `ex_pprts_specint_buildings.F90`;
    `ecckd/ecckd_pprts.F90:339-448`)."""
    import jax.numpy as jnp

    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.spectral.specint import specint_pprts

    atm = setup_standard_atmosphere(nlay=10, ztop=10e3)
    nx = ny = 4
    grid = Grid.create(atm.nlay, nx, ny, 100.0, 100.0,
                       np.asarray(atm.dz, np.float32))
    solid = np.zeros((atm.nlay, nx, ny), bool)
    solid[-1, 1:3, 1:3] = True  # 2x2 ground-layer building
    T_b, a_b = 330.0, 0.3
    b = Buildings(solid=jnp.asarray(solid), albedo=a_b, temp=jnp.asarray(T_b))

    solver = PprtsSolver(grid, opp_small)
    solver.set_angles(sundir_from_angles(20.0, 40.0))
    res = specint_pprts(solver, atm, albedo=0.15, lthermal=True,
                        lsolar=True, specint="ecckd", buildings=b)

    assert b.fluxes is not None
    roof = {k: np.asarray(v) for k, v in b.fluxes["roof"].items()}
    # fluxes only on exposed roof faces
    m = np.asarray(solid)
    assert (roof["incoming"][~m] == 0).all()
    assert roof["incoming"][-1, 1, 1] > 100.0  # sun + sky + thermal edn

    # broadband emission: outgoing - albedo*incoming == (1-a) sigma T^4
    # (the per-g-point ecCKD Planck values must integrate to sigma T^4)
    sigma = 5.670374419e-8
    emitted = roof["outgoing"][-1, 1, 1] - a_b * roof["incoming"][-1, 1, 1]
    np.testing.assert_allclose(emitted, (1 - a_b) * sigma * T_b**4, rtol=2e-2)

    # direct on the roof is positive and part of incoming
    assert 0.0 < roof["edir"][-1, 1, 1] <= roof["incoming"][-1, 1, 1]

    # the hot building's emission shows up in the domain: eup above the
    # building exceeds eup far away at the same level
    eup = np.asarray(res.eup)
    assert eup[-2, 1, 1] > eup[-2, 3, 3], (eup[-2, 1, 1], eup[-2, 3, 3])

    # static planck + specint is an error (reference CHKERR)
    b_bad = Buildings(solid=jnp.asarray(solid), albedo=a_b,
                      planck=jnp.ones(solid.shape, np.float32))
    solver2 = PprtsSolver(grid, opp_small)
    solver2.set_angles(sundir_from_angles(20.0, 40.0))
    with pytest.raises(ValueError):
        specint_pprts(solver2, atm, albedo=0.15, lthermal=True,
                      lsolar=False, specint="ecckd", buildings=b_bad)
