"""Unstructured (ICON-style) wedge meshes + solver
(reference `plexrt/icon_grid.F90`, `icon_plex_utils.F90`)."""

import os

import numpy as np
import pytest

from tenstream_tpu.plexrt.icon import (
    TriMesh,
    read_icon_grid,
    rotate_mesh,
    trimesh_from_structured,
    write_icon_grid,
)
from tenstream_tpu.plexrt.optprop import WedgeOptProp, load_or_create_wedge_lut
from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon

_LUTDIR = os.path.join(os.path.dirname(__file__), "data", "luts")


@pytest.fixture(scope="module")
def opp():
    return WedgeOptProp(load_or_create_wedge_lut(n_photons=1500, basename=_LUTDIR))


def _sundir(phi_deg, theta_deg):
    p, t = np.deg2rad(phi_deg), np.deg2rad(theta_deg)
    return np.array([np.sin(p) * np.sin(t), np.cos(p) * np.sin(t), -np.cos(t)])


def test_structured_trimesh_adjacency():
    m = trimesh_from_structured(4, 3, 100.0, 100.0)
    assert m.ncell == 24
    # every interior adjacency is reciprocal
    for c in range(m.ncell):
        for s in range(3):
            n = m.nbr[c, s]
            if n >= 0:
                assert m.nbr[n, m.nbr_side[c, s]] == c
    # congruent half-rectangle triangles
    np.testing.assert_allclose(m.area, 5000.0)
    # orientations: alternating 0 and 180 degrees
    phis = np.mod(m.phi_rot, 360.0)
    np.testing.assert_allclose(phis[0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(phis[1::2], 180.0, atol=1e-6)


def test_icon_file_roundtrip(tmp_path):
    m = trimesh_from_structured(3, 3, 80.0, 120.0)
    path = str(tmp_path / "icon_grid.nc")
    write_icon_grid(path, m)
    m2 = read_icon_grid(path)
    assert m2.ncell == m.ncell
    # topology identical
    np.testing.assert_array_equal(m2.nbr, m.nbr)
    np.testing.assert_array_equal(m2.nbr_side, m.nbr_side)
    # geometry preserved up to a rigid rotation of the tangent plane
    np.testing.assert_allclose(m2.area, m.area, rtol=1e-4)
    np.testing.assert_allclose(m2.side_len, m.side_len, rtol=1e-4)


def test_transparent_open_domain(opp):
    m = trimesh_from_structured(6, 6, 100.0, 100.0)
    nz = 4
    s = PlexrtSolverIcon(m, np.full(nz, 100.0), opp)
    z = np.full((nz, m.ncell), 1e-10, np.float32)
    s.set_optical_properties(0.0, z, z, np.zeros_like(z))
    s.set_angles(_sundir(0.0, 1e-3))  # overhead
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    np.testing.assert_allclose(edir[-1], 1000.0, rtol=1e-3)
    assert np.abs(abso).max() < 1e-3


def test_rotation_invariance(opp):
    """Rotating the mesh and the sun together must not change any flux —
    pins the per-cell phi_rot convention of the LUT lookup."""
    base = trimesh_from_structured(6, 6, 100.0, 100.0)
    ang = 33.0
    rot = rotate_mesh(base, ang)
    nz = 4
    rng = np.random.default_rng(0)
    ka = (1e-4 + 1e-3 * rng.random((nz, base.ncell))).astype(np.float32)
    ks = (1e-4 + 5e-3 * rng.random((nz, base.ncell))).astype(np.float32)
    gg = np.full((nz, base.ncell), 0.5, np.float32)

    def run(mesh, phi):
        s = PlexrtSolverIcon(mesh, np.full(nz, 100.0), opp)
        s.set_optical_properties(0.2, ka, ks, gg)
        s.set_angles(_sundir(phi, 40.0))
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        return map(np.asarray, s.get_result(sol))

    e1, d1, u1, a1 = run(base, 50.0)
    # the mesh rotated ccw by `ang` sees the same scene when the sun
    # azimuth (measured from +y toward +x, i.e. clockwise) DEcreases
    # by ang
    e2, d2, u2, a2 = run(rot, 50.0 - ang)
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(u1, u2, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(a1, a2, rtol=2e-3, atol=1e-7)


def test_thermal_isothermal_icon(opp):
    """Open lateral boundaries cool the rim; the DOMAIN CENTER of a
    large enough mesh still reaches the isothermal equilibrium."""
    nxr = 12
    m = trimesh_from_structured(nxr, nxr, 100.0, 100.0)
    nz = 6
    s = PlexrtSolverIcon(m, np.full(nz, 100.0), opp)
    ka = np.full((nz, m.ncell), 2e-2, np.float32)  # optically thick
    pl = np.full((nz + 1, m.ncell), 3.0, np.float32)
    s.set_optical_properties(0.0, ka, np.zeros_like(ka), np.zeros_like(ka), planck=pl)
    sol = s.solve(lthermal=True, lsolar=False)
    _, edn, eup, abso = map(np.asarray, s.get_result(sol))
    assert sol.edir is None
    center = 2 * ((nxr // 2) * nxr + nxr // 2)
    np.testing.assert_allclose(eup[0, center], np.pi * 3.0, rtol=0.05)
    np.testing.assert_allclose(edn[-1, center], np.pi * 3.0, rtol=0.05)
    # rim cells radiate into the open boundary: cooler than the center
    rim = 0
    assert eup[0, rim] < eup[0, center]


def test_solar_energy_balance_open(opp):
    """Open-domain energy budget: incoming = TOA-up + absorbed +
    surface-net + lateral escape (implied residual must stay small for
    an interior-dominated domain)."""
    m = trimesh_from_structured(10, 10, 100.0, 100.0)
    nz = 4
    s = PlexrtSolverIcon(m, np.full(nz, 100.0), opp)
    ka = np.full((nz, m.ncell), 3e-4, np.float32)
    ks = np.full((nz, m.ncell), 1e-3, np.float32)
    gg = np.full((nz, m.ncell), 0.4, np.float32)
    s.set_optical_properties(0.3, ka, ks, gg)
    s.set_angles(_sundir(30.0, 40.0))
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, s.get_result(sol))
    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    accounted = (eup[0].mean() + (abso * 100.0).sum(0).mean()
                 + (edir[-1] + edn[-1] - eup[-1]).mean())
    # the residual is lateral escape through the open boundary: the
    # tilted beam (tan 40 deg over a 400 m column) starves an upwind
    # strip and diffuse leaks at every rim cell — bounded but nonzero
    assert 0.0 < incoming - accounted < 0.45 * incoming, (accounted, incoming)
    # interior direct transmission matches Beer-Lambert on the slant
    # path (delta-scaled extinction)
    center = 2 * (5 * 10 + 5)
    from tenstream_tpu.ops.delta_scale import delta_scale
    import jax.numpy as jnp
    ka_d, ks_d, _ = map(np.asarray, delta_scale(
        jnp.asarray(ka[:, :1]), jnp.asarray(ks[:, :1]), jnp.asarray(gg[:, :1])))
    tau_slant = float((ka_d + ks_d).sum(0) * 100.0 / mu)
    expect = incoming * np.exp(-tau_slant)
    # 8% tolerance: the coarse test-fixture tau axis linearly
    # interpolates exp(-tau) between widely spaced nodes (the cube
    # solver avoids this class entirely via the closed-form dir2dir;
    # a wedge closed form is future work)
    np.testing.assert_allclose(edir[-1, center], expect, rtol=0.08)


def test_specint_on_icon_solver(opp):
    """Spectral integration drives the unstructured solver end-to-end
    (reference plexrt_rrtmg on ICON grids, `rrtmg/rrtmg/plexrt_rrtmg.F90`):
    clear-sky ecCKD LW+SW broadband fluxes on an ICON TriMesh agree with
    the structured fish-mesh solver on the congruent triangulation
    (interior columns; the open lateral boundary only perturbs the rim)."""
    from tenstream_tpu.atm import setup_standard_atmosphere
    from tenstream_tpu.plexrt.mesh import fish_mesh
    from tenstream_tpu.plexrt.solver import PlexrtSolver
    from tenstream_tpu.spectral.specint_plexrt import specint_plexrt

    nz, nx, ny = 10, 8, 8
    # aspect ~ 1 layers and NEAR-OVERHEAD sun: the open lateral boundary
    # (icon) vs periodic (structured) difference is then confined to the
    # rim for the direct beam (at theta=40 the beam displaces laterally
    # ~1 cell/layer and the boundary shadow reaches the interior —
    # physics, not a defect; measured ratio 0.59 there vs 0.998 at 5 deg).
    # Diffuse fields are boundary-drained everywhere on a domain this
    # small, so only sanity bounds apply to them.
    atm = setup_standard_atmosphere(z_grid=np.linspace(1000.0, 0.0, nz + 1))
    dz = atm.dz.astype(np.float32)

    mesh = trimesh_from_structured(nx, ny, 100.0, 100.0)
    si = PlexrtSolverIcon(mesh, dz, opp)
    si.set_angles(_sundir(30.0, 5.0))
    ri = specint_plexrt(si, atm, 0.15, lthermal=True, lsolar=True,
                        specint="ecckd", max_gpt=4, band_chunk=4)

    gs = fish_mesh(nz, nx, ny, 100.0, 100.0, dz)
    ss = PlexrtSolver(gs, opp)
    ss.set_angles(_sundir(30.0, 5.0))
    rs = specint_plexrt(ss, atm, 0.15, lthermal=True, lsolar=True,
                        specint="ecckd", max_gpt=4, band_chunk=4)

    # icon cells c = 2*(i*ny+j)+o <-> structured (o, i, j); compare the
    # interior (strip off the open-boundary rim)
    ei = np.asarray(ri.edir).reshape(-1, nx, ny, 2)[:, 2:-2, 2:-2].mean((1, 2, 3))
    es = np.moveaxis(np.asarray(rs.edir), 1, -1)[:, 2:-2, 2:-2].mean((1, 2, 3))
    err = float(np.abs(ei - es).max()) / float(np.abs(es).max())
    assert err < 0.03, f"edir: icon vs structured interior mismatch {err:.3f}"

    # diffuse sanity: finite, positive where expected, bounded by the
    # periodic solution (open boundaries only drain)
    for name, a, b in (("edn", ri.edn, rs.edn), ("eup", ri.eup, rs.eup)):
        ai, bs = np.asarray(a), np.asarray(b)
        assert np.isfinite(ai).all()
        assert ai.min() >= -1e-3
        assert ai.mean() <= bs.mean() * 1.05, name
    assert np.isfinite(np.asarray(ri.abso)).all()


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_icon_solve_matches_single(opp):
    """Cell-sharded ICON wedge solve == single-device solve (1-proc ==
    N-proc reference suite semantics for the gather-based mesh path)."""
    import jax

    from tenstream_tpu.parallel.mesh import make_mesh

    m = trimesh_from_structured(8, 8, 100.0, 100.0)  # nc = 128, /8
    nz = 4
    rng = np.random.default_rng(3)
    ka = (1e-4 + 1e-3 * rng.random((nz, m.ncell))).astype(np.float32)
    ks = (1e-4 + 8e-3 * rng.random((nz, m.ncell))).astype(np.float32)
    gg = np.full((nz, m.ncell), 0.4, np.float32)
    out = {}
    for shard in (False, True):
        s = PlexrtSolverIcon(m, np.full(nz, 80.0, np.float32), opp)
        if shard:
            s.set_mesh(make_mesh(jax.devices()[:8]))
        s.set_optical_properties(0.2, ka, ks, gg)
        s.set_angles(_sundir(25.0, 35.0))
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        # bicgstab default converged (residual-based stopping)
        assert float(np.asarray(sol.diff_res)) <= 1.5 * float(
            np.asarray(sol.diff_tol))
        out[shard] = [None if a is None else np.asarray(a)
                      for a in s.get_result(sol)]
    for a, b in zip(out[False], out[True]):
        if a is not None:
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-3)


def test_shaped_optprop_blends_and_matches_exact():
    """WedgeOptPropShaped (per-cell shape interpolation over sample
    tables — the reference's shape LUT axes realized as table blending,
    src/optprop_base.F90:230-283): on a mesh whose cells ALL have one
    sample's shape, the 4-table blend must equal the single shape-exact
    table solve; weights must be a partition of unity."""
    import numpy as np

    from tenstream_tpu.plexrt.icon import trimesh_from_points
    from tenstream_tpu.plexrt.optprop import (
        WedgeAxes, WedgeLUT, WedgeOptProp, WedgeOptPropShaped,
        create_wedge_lut,
    )

    axes_d = WedgeAxes(
        tau=np.array([0.05, 0.5, 4.0], np.float32),
        w0=np.array([0.3, 0.9], np.float32),
        aspect=np.array([0.5, 1.0, 1.8], np.float32),
        g=np.array([0.0, 0.6], np.float32),
        phi=np.linspace(0.0, 360.0, 9).astype(np.float32),
        theta=np.array([0.0, 30.0, 60.0], np.float32),
    )
    axes_f = WedgeAxes(axes_d.tau, axes_d.w0, axes_d.aspect, axes_d.g)
    apexes = [(0.3, 0.6), (0.7, 0.6), (0.3, 1.0), (0.7, 1.0)]
    luts = [create_wedge_lut(axes_d, axes_f, n_photons=400, seed=9, apex=a)
            for a in apexes]
    shaped = WedgeOptPropShaped(luts)

    # a 2-triangle mesh whose cells BOTH have apex (0.3, 0.6) shape (up
    # to the cell-local frame): C = A + 0.3*AB + 0.6*|AB|*n
    L = 100.0
    verts = np.array([[0, 0], [L, 0], [0.3 * L, 0.6 * L],
                      [0.7 * L, -0.6 * L]], np.float64)
    tris = np.array([[0, 1, 2], [1, 0, 3]], np.int32)
    mesh = trimesh_from_points(verts, tris)

    from tenstream_tpu.plexrt.optprop import mesh_cell_shapes
    cx, cy = mesh_cell_shapes(mesh)
    np.testing.assert_allclose(cx, 0.3, atol=1e-6)
    np.testing.assert_allclose(cy, 0.6, atol=1e-6)
    shaped.bind_cells(cx, cy)
    w = np.asarray(shaped._w)
    np.testing.assert_allclose(w.sum(0), 1.0, atol=1e-6)
    np.testing.assert_allclose(w[0], 1.0, atol=1e-6)  # exact corner hit

    exact = WedgeOptProp(luts[0])
    nz, nc = 3, mesh.ncell
    tz = np.full((nz, nc), 0.8, np.float32)
    w0 = np.full((nz, nc), 0.7, np.float32)
    gg = np.full((nz, nc), 0.4, np.float32)
    asp = np.full((nz, nc), 0.9, np.float32)
    np.testing.assert_allclose(
        np.asarray(shaped.diff_coeffs(tz, w0, gg, asp)),
        np.asarray(exact.diff_coeffs(tz, w0, gg, asp)), atol=1e-6)
    phi = np.full((nz, nc), 25.0, np.float32)
    dd_s, df_s = shaped.dir_coeffs(tz, w0, gg, asp, phi, 30.0)
    # table 0 IS the cell shape: its azimuth map is identity there
    dd_e, df_e = exact.dir_coeffs(tz, w0, gg, asp, phi, 30.0)
    np.testing.assert_allclose(np.asarray(dd_s), np.asarray(dd_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(df_s), np.asarray(df_e), atol=1e-6)


def test_shaped_optprop_solver_e2e():
    """Distorted heterogeneous mesh end-to-end through PlexrtSolverIcon
    with a shaped optprop: solves, converges, conserves energy."""
    import numpy as np

    from tenstream_tpu.plexrt.icon import trimesh_from_points, trimesh_from_structured
    from tenstream_tpu.plexrt.optprop import (
        WedgeAxes, WedgeOptPropShaped, create_wedge_lut, mesh_cell_shapes,
    )

    base = trimesh_from_structured(4, 4, 100.0, 100.0)
    rng = np.random.default_rng(2)
    verts = base.verts + rng.uniform(-18.0, 18.0, base.verts.shape)
    mesh = trimesh_from_points(verts, base.tris)
    cx, cy = mesh_cell_shapes(mesh)
    assert (cx.max() - cx.min()) > 0.1  # genuinely heterogeneous

    axes_d = WedgeAxes(
        tau=np.array([0.05, 0.5, 4.0], np.float32),
        w0=np.array([0.3, 0.9], np.float32),
        aspect=np.array([0.5, 1.0, 1.8], np.float32),
        g=np.array([0.0, 0.6], np.float32),
        phi=np.linspace(0.0, 360.0, 9).astype(np.float32),
        theta=np.array([0.0, 30.0, 60.0], np.float32),
    )
    axes_f = WedgeAxes(axes_d.tau, axes_d.w0, axes_d.aspect, axes_d.g)
    apexes = [(float(cx.min()), float(cy.min())), (float(cx.max()), float(cy.min())),
              (float(cx.min()), float(cy.max())), (float(cx.max()), float(cy.max()))]
    luts = [create_wedge_lut(axes_d, axes_f, n_photons=400, seed=4, apex=a)
            for a in apexes]
    opp = WedgeOptPropShaped(luts)

    from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon

    nz = 3
    s = PlexrtSolverIcon(mesh, [90.0] * nz, opp)
    assert s._shaped_opp and not s._use_param_phi
    ka = np.full((nz, mesh.ncell), 3e-4, np.float32)
    ks = np.full((nz, mesh.ncell), 8e-3, np.float32)
    gg = np.full((nz, mesh.ncell), 0.4, np.float32)
    s.set_optical_properties(0.2, ka, ks, gg)
    s.set_angles(_sundir(25.0, 40.0))
    sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = [np.asarray(a) for a in s.get_result(sol)]
    assert np.isfinite(edn).all() and (edn >= -1e-3).all()
    assert float(np.asarray(sol.diff_res)) <= 1.5 * float(np.asarray(sol.diff_tol))
    # column energy budget: TOA in >= out + absorbed (open sides leak)
    toa_in = np.asarray(edir[0]).mean()
    assert 0.0 < eup[0].mean() < toa_in
