#!/usr/bin/env python
"""Benchmark: full LW+SW heating-rate solve throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric is grid-columns per second per chip for a full spectral solve
(240 g-points: 112 SW + 128 LW, mirroring the reference's 112+140 RRTMG
band loop, `rrtmg/rrtm_lw/parrrtm.f90:39`, `rrtm_sw/parrrsw.f90:36`).
The reference publishes no in-repo throughput numbers (BASELINE.md), so
vs_baseline is reported as 1.0 by convention.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# persistent compilation cache: the Pallas tracer kernels and the solve
# graphs are expensive to compile; cache them across bench runs
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

NX = int(os.environ.get("BENCH_NX", 64))
NY = int(os.environ.get("BENCH_NY", 64))
NLAY = int(os.environ.get("BENCH_NLAY", 40))
CHUNK = int(os.environ.get("BENCH_CHUNK", 8))
REPS = int(os.environ.get("BENCH_REPS", 3))


def bench_lut_axes():
    from tenstream_tpu.optprop.lut import LUTAxes

    tau = np.array(
        [1e-10, 1e-4, 1e-3, 1e-2, 0.05, 0.15, 0.4, 0.8, 1.5, 3.0, 6.0, 12.0, 30.0, 100.0],
        np.float32,
    )
    w0 = np.array([0.0, 0.35, 0.6, 0.8, 0.9, 0.95, 0.98, 0.995, 0.99999], np.float32)
    aspect = np.array(
        [0.02, 0.05, 0.1, 0.2, 0.35, 0.55, 0.8, 1.0, 1.3, 2.0, 3.5, 7.45], np.float32
    )
    g = np.array([0.0, 0.25, 0.5, 0.85], np.float32)
    phi = np.linspace(0.0, 90.0, 7).astype(np.float32)
    theta = np.array([0.0, 15.0, 30.0, 42.5, 55.0, 67.5, 80.0], np.float32)
    return (
        LUTAxes(tau, w0, aspect, g, phi, theta),
        LUTAxes(tau, w0, aspect, g),
    )


def build_scene():
    from tenstream_tpu.atm import setup_standard_atmosphere

    atm = setup_standard_atmosphere(nlay=NLAY, ztop=20e3)
    rng = np.random.default_rng(7)
    lwc = np.zeros((NLAY, NX, NY), np.float32)
    # scattered cumulus blobs in the lowest ~2 km
    zc = atm.zlev[:-1]
    cloudy_layers = np.where((zc > 700.0) & (zc < 2200.0))[0]
    for _ in range(NX * NY // 16):
        i, j = rng.integers(0, NX), rng.integers(0, NY)
        k = rng.choice(cloudy_layers)
        di, dj = rng.integers(1, 4), rng.integers(1, 4)
        lwc[k : k + 2, i : i + di, j : j + dj] = rng.uniform(0.1, 0.6)
    return atm, lwc


def main():
    t_setup = time.time()
    import jax

    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts

    da, fa = bench_lut_axes()
    lut = load_or_create_lut("3_10", da, fa, n_photons=5000, verbose=True)
    opp = OptProp(lut)

    atm, lwc = build_scene()
    grid = Grid.create(NLAY, NX, NY, 100.0, 100.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, opp)
    solver.set_angles(sundir_from_angles(120.0, 40.0))

    def run():
        res = specint_pprts(
            solver, atm, albedo=0.15, lthermal=True, lsolar=True,
            specint="synthck", lwc=lwc, band_chunk=CHUNK,
        )
        jax.block_until_ready(res.abso)
        return res

    print(f"# setup {time.time()-t_setup:.1f}s; warmup/compile...", file=sys.stderr)
    t0 = time.time()
    res = run()
    print(f"# warmup {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(REPS):
        t0 = time.time()
        res = run()
        times.append(time.time() - t0)
    dt = float(np.mean(times))
    cols_per_s = NX * NY / dt

    edir, edn, eup, abso = map(np.asarray, res)
    assert np.isfinite(abso).all(), "non-finite absorption in bench result"
    print(
        f"# grid {NX}x{NY}x{NLAY}, {dt:.2f}s/solve, TOA SW dn "
        f"{edir[0].mean():.1f} W/m2, OLR {eup[0].mean():.1f} W/m2",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "full_spectrum_columns_per_s_per_chip",
        "value": round(cols_per_s, 2),
        "unit": "columns/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
