"""Scene dump/replay + XDMF export tests (reference dump_input /
xdmf_export parity)."""

import os

import numpy as np

from tenstream_tpu.utils.io import dump_scene, load_scene, write_xdmf_grid


def test_scene_roundtrip(tmp_path):
    p = str(tmp_path / "scene.npz")
    kabs = np.random.default_rng(0).random((4, 5, 6)).astype(np.float32)
    dump_scene(p, kabs=kabs, albedo=0.2, sundir=np.array([0.0, 0.5, -0.8]))
    back = load_scene(p)
    np.testing.assert_array_equal(back["kabs"], kabs)
    assert float(back["albedo"]) == np.float32(0.2)


def test_replay_produces_same_result(tmp_path, opp_small):
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nz, nx, ny = 5, 6, 6
    rng = np.random.default_rng(1)
    ka = (1e-4 + 1e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    ks = (1e-4 + 3e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    g = np.full((nz, nx, ny), 0.4, np.float32)
    sd = sundir_from_angles(25.0, 35.0)

    p = str(tmp_path / "scene.npz")
    dump_scene(p, kabs=ka, ksca=ks, g=g, sundir=sd, albedo=0.2,
               dz=np.full(nz, 100.0, np.float32), dx=100.0, dy=100.0,
               edirTOA=900.0)

    def solve_from(scene):
        s = PprtsSolver(
            Grid.create(*scene["kabs"].shape, float(scene["dx"]), float(scene["dy"]), scene["dz"]),
            opp_small,
        )
        s.set_optical_properties(float(scene["albedo"]), scene["kabs"], scene["ksca"], scene["g"])
        s.set_angles(scene["sundir"])
        s.solve(lthermal=False, lsolar=True, edirTOA=float(scene["edirTOA"]))
        return [np.asarray(x) for x in s.get_result()]

    r1 = solve_from(load_scene(p))
    r2 = solve_from(load_scene(p))
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a, b)


def test_xdmf_export(tmp_path):
    xmf = write_xdmf_grid(
        str(tmp_path / "out"),
        {"srfc_flux": np.ones((8, 8), np.float32), "abso": np.zeros((4, 8, 8), np.float32)},
        dx=100.0, dy=100.0, dz=50.0,
    )
    assert os.path.exists(xmf)
    txt = open(xmf).read()
    assert "3DCoRectMesh" in txt and "2DCoRectMesh" in txt
    assert os.path.exists(str(tmp_path / "out_abso.bin"))
    raw = np.fromfile(str(tmp_path / "out_srfc_flux.bin"), np.float32)
    assert raw.shape == (64,) and (raw == 1.0).all()


def test_ncwrite_ncload_roundtrip(tmp_path):
    from tenstream_tpu.utils.io import ncinfo, ncload, ncwrite

    path = str(tmp_path / "diag.nc")
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    ncwrite(path, "edir", a, dim_names=("z", "x"), attrs={"units": b"W/m2"})
    ncwrite(path, "albedo", np.float64(0.2))
    # second write with a shared dimension, first var preserved
    ncwrite(path, "edn", 2 * a, dim_names=("z", "x"))
    np.testing.assert_array_equal(ncload(path, "edir"), a)
    np.testing.assert_array_equal(ncload(path, "edn"), 2 * a)
    np.testing.assert_allclose(ncload(path, "albedo"), [0.2])
    data, attrs = ncload(path, "edir", with_attrs=True)
    assert attrs["units"] == b"W/m2"
    info = ncinfo(path)
    assert info["edir"] == (("z", "x"), (3, 4))
    # replacing a variable keeps the others
    ncwrite(path, "edir", 3 * a, dim_names=("z", "x"))
    np.testing.assert_array_equal(ncload(path, "edir"), 3 * a)
    np.testing.assert_array_equal(ncload(path, "edn"), 2 * a)
    # bf16/int64 are cast to representable types
    import jax.numpy as jnp

    ncwrite(path, "halfprec", jnp.ones((2,), jnp.bfloat16))
    assert ncload(path, "halfprec").dtype == np.float32
    # dimension size conflicts are rejected
    import pytest

    with pytest.raises(ValueError):
        ncwrite(path, "bad", np.zeros((5,)), dim_names=("z",))
