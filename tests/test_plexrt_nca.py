"""Triangle NCA (Klinger & Mayer 2019) — `plexrt/nca_multi_tri.F90`.

Invariants:
  * emissivity interpolation: thin analytic limit, thick saturation,
    monotonicity in tau
  * isothermal radiative equilibrium -> exactly zero heating rate
    (absorption and emission cancel term by term)
  * cooling to space: warm layer under a cold sky cools
  * structured and TriMesh drivers agree on the same scene
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tenstream_tpu.core.types import PI  # noqa: E402
from tenstream_tpu.plexrt.nca import (  # noqa: E402
    NcaTables,
    interpol_corr,
    interpol_emis,
    nca_icon,
    nca_structured,
)


@pytest.fixture(scope="module")
def tables():
    return NcaTables.load()


def test_emissivity_limits(tables):
    # thin limit: eps == 1 - exp(-tau) below the table range
    tau = jnp.asarray(1e-5)
    e = interpol_emis(tables, tau, tau, side=False)
    np.testing.assert_allclose(float(e), 1.0 - np.exp(-1e-5), rtol=5e-3)  # f32
    # thick limit saturates at <= 1 and is large
    e_thick = interpol_emis(tables, jnp.asarray(500.0), jnp.asarray(500.0), side=False)
    assert 0.9 < float(e_thick) <= 1.0
    # monotone in tauz along the table interior
    taus = jnp.asarray(np.geomspace(1e-3, 50.0, 20, dtype=np.float32))
    eps = np.asarray(interpol_emis(tables, taus, taus, side=True))
    assert np.all(np.diff(eps) > -1e-6)
    assert np.all((eps >= 0) & (eps <= 1))


def test_corr_factor_finite(tables):
    asp = jnp.asarray(np.linspace(0.11, 11.0, 13, dtype=np.float32))
    tau = jnp.asarray(np.geomspace(2e-4, 100.0, 13, dtype=np.float32))
    for side in (False, True):
        c = np.asarray(interpol_corr(tables, asp, tau, side=side))
        assert np.all(np.isfinite(c))
        assert np.all((c > 0) & (c < 5.0))


def test_isothermal_equilibrium_structured(tables):
    from tenstream_tpu.plexrt.mesh import PlexGrid

    nz, nx, ny = 4, 6, 5
    grid = PlexGrid.create(nz, nx, ny, 100.0, 100.0, 80.0)
    B = 100.0 / np.pi
    kabs = np.full((nz, 2, nx, ny), 5e-3, np.float32)
    planck = np.full((nz + 1, 2, nx, ny), B, np.float32)
    # equilibrium: every flux equals pi*B
    edn = np.full((nz + 1, 2, nx, ny), PI * B, np.float32)
    eup = edn.copy()
    hr = np.asarray(nca_structured(grid, kabs, planck, edn, eup, tables))
    np.testing.assert_allclose(hr, 0.0, atol=1e-3)


def test_isothermal_equilibrium_icon(tables):
    from tenstream_tpu.plexrt.icon import trimesh_from_structured

    mesh = trimesh_from_structured(5, 4, 120.0, 90.0)
    nz, nc = 3, mesh.ncell
    B = 80.0 / np.pi
    kabs = np.full((nz, nc), 2e-3, np.float32)
    planck = np.full((nz + 1, nc), B, np.float32)
    edn = np.full((nz + 1, nc), PI * B, np.float32)
    eup = edn.copy()
    hr = np.asarray(nca_icon(mesh, 70.0, kabs, planck, edn, eup, tables))
    assert hr.shape == (nz, nc)
    np.testing.assert_allclose(hr, 0.0, atol=1e-3)


def test_cooling_to_space(tables):
    from tenstream_tpu.plexrt.icon import trimesh_from_structured

    mesh = trimesh_from_structured(4, 4, 100.0, 100.0)
    nz, nc = 3, mesh.ncell
    B = 100.0 / np.pi
    kabs = np.full((nz, nc), 5e-3, np.float32)
    planck = np.full((nz + 1, nc), B, np.float32)
    # cold sky: no downwelling at all, upwelling in equilibrium
    edn = np.zeros((nz + 1, nc), np.float32)
    eup = np.full((nz + 1, nc), PI * B, np.float32)
    hr = np.asarray(nca_icon(mesh, 100.0, kabs, planck, edn, eup, tables))
    assert np.all(hr < 0.0)  # net emission everywhere


def test_structured_vs_icon_consistency(tables):
    """Both drivers on the same homogeneous scene must agree in the
    interior (they differ only at the icon mesh's open boundary where
    the structured driver wraps periodically)."""
    from tenstream_tpu.plexrt.icon import trimesh_from_structured
    from tenstream_tpu.plexrt.mesh import PlexGrid

    nz, nx, ny = 3, 6, 6
    dx = dy = 100.0
    dzv = 90.0
    rng = np.random.default_rng(3)
    kabs_flat = rng.uniform(1e-4, 1e-2, (nz, nx, ny, 2)).astype(np.float32)
    B = 90.0 / np.pi
    # vertically varying, horizontally uniform fluxes: neighbour exchange
    # then has no boundary signature
    prof = np.linspace(0.2, 1.0, nz + 1).astype(np.float32)[:, None, None, None]
    edn4 = (PI * B * prof * np.ones((nz + 1, nx, ny, 2), np.float32))
    eup4 = (PI * B * np.ones((nz + 1, nx, ny, 2), np.float32))
    planck4 = B * np.ones((nz + 1, nx, ny, 2), np.float32)

    # horizontally uniform kabs (incl. across orientation) so the icon
    # mesh's open-boundary own-cell fallback matches the periodic wrap
    kabs_flat[:] = kabs_flat[:, :1, :1, :1]

    grid = PlexGrid.create(nz, nx, ny, dx, dy, dzv)
    to_struct = lambda a: np.moveaxis(a, -1, 1)  # (lev, 2, nx, ny)
    hr_s = np.asarray(
        nca_structured(grid, to_struct(kabs_flat), to_struct(planck4),
                       to_struct(edn4), to_struct(eup4), tables)
    )

    mesh = trimesh_from_structured(nx, ny, dx, dy)
    to_flat = lambda a: a.reshape(a.shape[0], -1)  # (lev, nc) in c=2*(i*ny+j)+o order
    hr_i = np.asarray(
        nca_icon(mesh, dzv, to_flat(kabs_flat), to_flat(planck4),
                 to_flat(edn4), to_flat(eup4), tables)
    )

    hr_i_grid = hr_i.reshape(nz, nx, ny, 2)
    hr_s_grid = np.moveaxis(hr_s, 1, -1)
    np.testing.assert_allclose(hr_i_grid, hr_s_grid, rtol=1e-5, atol=1e-6)


def test_solver_integration(tables):
    """End-to-end: thermal wedge solve then NCA post-process; NCA
    heating stays within a factor of a few of the 1-D absorption and
    preserves the overall cooling."""
    import os

    from tenstream_tpu.plexrt.mesh import PlexGrid
    from tenstream_tpu.plexrt.optprop import WedgeOptProp, load_or_create_wedge_lut
    from tenstream_tpu.plexrt.solver import PlexrtSolver

    nz, nx, ny = 4, 4, 4
    grid = PlexGrid.create(nz, nx, ny, 100.0, 100.0, 80.0)
    lutdir = os.path.join(os.path.dirname(__file__), "data", "luts")
    opp = WedgeOptProp(load_or_create_wedge_lut(n_photons=1500, basename=lutdir))
    solver = PlexrtSolver(grid, opp)
    kabs = np.full((nz, 2, nx, ny), 2e-3, np.float32)
    ksca = np.full((nz, 2, nx, ny), 1e-4, np.float32)
    g = np.zeros((nz, 2, nx, ny), np.float32)
    B = 100.0 / np.pi
    planck = np.full((nz + 1, 2, nx, ny), B, np.float32)
    solver.set_optical_properties(0.1, kabs, ksca, g, planck=planck)
    sol = solver.solve(lthermal=True, lsolar=False)
    hr = np.asarray(solver.nca_absorption(sol, tables))
    assert hr.shape == (nz, 2, nx, ny)
    assert np.all(np.isfinite(hr))
    # warm atmosphere under cold sky: layers cool on average
    assert hr.mean() < 0.0
