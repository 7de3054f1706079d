#!/usr/bin/env python
"""Buildings-scene benchmark (reference `misc/benchmark_buildings.sh`).

Times monochromatic solar solves of an urban scene with solid buildings
(shadowing, roof/wall reflection) against the same scene without
buildings, printing per-solve times and the building-face flux
extraction overhead.

Run (CPU):  JAX_PLATFORMS=cpu python tools/bench_buildings.py
Env: BENCH_NX/BENCH_NY/BENCH_NZ, BENCH_REPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np

    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.buildings import Buildings
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    nx = int(os.environ.get("BENCH_NX", 64))
    ny = int(os.environ.get("BENCH_NY", 64))
    nz = int(os.environ.get("BENCH_NZ", 24))
    reps = int(os.environ.get("BENCH_REPS", 3))

    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    grid = Grid.create(nz, nx, ny, 50.0, 50.0, 20.0)

    ka = np.full((nz, nx, ny), 1e-5, np.float32)
    ks = np.full((nz, nx, ny), 1e-5, np.float32)
    g = np.zeros((nz, nx, ny), np.float32)

    # a regular block of towers (1/8 of the area built up)
    rng = np.random.default_rng(3)
    solid = np.zeros((nz, nx, ny), bool)
    for i in range(2, nx - 4, 8):
        for j in range(2, ny - 4, 8):
            h = int(rng.integers(nz // 3, 2 * nz // 3))
            solid[nz - h:, i:i + 3, j:j + 3] = True

    def timed_solves(with_buildings: bool):
        solver = PprtsSolver(grid, OptProp(lut))
        solver.set_optical_properties(0.15, ka, ks, g)
        solver.set_angles(sundir_from_angles(120.0, 55.0))
        if with_buildings:
            solver.set_buildings(Buildings(solid=jnp.asarray(solid), albedo=0.4))
        t0 = time.time()
        solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        jax.block_until_ready(solver.get_result()[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            solver.solutions.clear()
            t0 = time.time()
            solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
            jax.block_until_ready(solver.get_result()[0])
            times.append(time.time() - t0)
        face_s = None
        if with_buildings:
            t0 = time.time()
            fl = solver.get_building_fluxes()
            jax.block_until_ready(fl)
            face_s = time.time() - t0
        return compile_s, float(np.mean(times)), face_s

    c0, t_plain, _ = timed_solves(False)
    c1, t_bld, t_faces = timed_solves(True)
    print(f"# {nx}x{ny}x{nz}: plain {t_plain:.3f}s/solve (compile {c0:.1f}s), "
          f"buildings {t_bld:.3f}s/solve (compile {c1:.1f}s), "
          f"face-flux extraction {t_faces:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "buildings_solve_overhead",
        "value": round(t_bld / max(t_plain, 1e-9), 3),
        "unit": "x_plain_solve",
        "vs_baseline": 1.0,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
