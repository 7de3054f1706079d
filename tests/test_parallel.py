"""Distribution tests: 1-device vs N-device sharded equality.

Parity: the reference tests MPI layouts via pFUnit `@test(npes=[1,2,...])`
asserting rank-count-independent results (SURVEY §4: "1-proc == N-proc
equivalence").  Here the same scene solves unsharded and sharded over the
virtual 8-CPU-device (x, y) mesh; GSPMD must produce identical physics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tenstream_tpu.parallel.mesh import make_mesh, shard_fields
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles
from tenstream_tpu.core.types import ireals


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_solve_matches_single(opp_small):
    nz, nx, ny = 6, 16, 16
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 100.0)

    rng = np.random.default_rng(5)
    ka = (1e-4 + 1e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    ks = (1e-4 + 4e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    gg = np.full((nz, nx, ny), 0.4, np.float32)
    planck = np.linspace(2.0, 5.0, nz + 1)[:, None, None] * np.ones((nx, ny))

    solver = PprtsSolver(grid, opp_small)
    solver.set_optical_properties(0.2, ka, ks, gg, planck=planck.astype(np.float32))
    solver.set_angles(sundir_from_angles(25.0, 35.0))
    fn = solver._solve_fn(lthermal=True, lsolar=True, has_planck_srfc=False)

    albedo2d = jnp.full((nx, ny), 0.2, ireals)
    x0 = jnp.zeros((solver.scheme.ndiff, nz + 1, nx, ny), ireals)
    args = (
        jnp.asarray(ka), jnp.asarray(ks), jnp.asarray(gg), albedo2d,
        jnp.asarray(planck, ireals), jnp.zeros((nx, ny), ireals),
        jnp.asarray(800.0, ireals), x0, jnp.asarray(1.0, ireals),
        jnp.zeros((nz, nx, ny), ireals),
    )
    edir_1, ediff_1, abso_1, n1, *_ = fn(*args)

    mesh = make_mesh(jax.devices()[:8])
    ka_s, ks_s, gg_s, alb_s, pl_s, x0_s = shard_fields(
        mesh, args[0], args[1], args[2], args[3], args[4], x0
    )
    edir_8, ediff_8, abso_8, n8, *_ = fn(
        ka_s, ks_s, gg_s, alb_s, pl_s, args[5], args[6], x0_s, args[8], args[9]
    )

    np.testing.assert_allclose(np.asarray(edir_1), np.asarray(edir_8), rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(abso_1), np.asarray(abso_8), rtol=2e-3, atol=1e-5)
    # [W] face power; 0.5 W on 1e4 m2 faces is 5e-5 W/m2 — tolerance-
    # tight rank-equivalence like the reference's npes=[1,2] suites
    np.testing.assert_allclose(np.asarray(ediff_1), np.asarray(ediff_8), rtol=5e-4, atol=0.5)


def test_dryrun_multichip_entry():
    """The driver-facing multichip dry run must compile and execute."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(min(8, len(jax.devices())))
