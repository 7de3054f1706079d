#!/usr/bin/env python
"""BASELINE-scale accuracy evidence (round-3 verdict item 7).

A horizontally-uniform periodic scene's EXACT solution is the
1x1-column periodic solve (every horizontal roll is the identity
there), which converges to machine precision for pennies.  This tool
solves the bench atmosphere column (no clouds) at NX x NY and at 1x1
with identical physics and asserts the flux profiles agree within a
PHYSICAL W/m2 tolerance — pinning the solver's convergence gates
(which scale atol with the unknown count) to actual flux accuracy at
the 256^2 x 127 BASELINE scale.  Reference gate analogue:
tests/test_pprts_specint atolerance=0.1 W/m2.

Usage:  python tools/uniform_accuracy.py            # 256^2 on the chip
        BENCH_NX=64 BENCH_NY=64 python tools/uniform_accuracy.py
CPU A/B: JAX_PLATFORMS=cpu BENCH_NX=16 ... (small grids only)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np

NX = int(os.environ.get("BENCH_NX", 256))
NY = int(os.environ.get("BENCH_NY", 256))
NZLOW = int(os.environ.get("BENCH_NZLOW", 112))
DZLOW = float(os.environ.get("BENCH_DZLOW", 50.0))
TOL_WM2 = float(os.environ.get("UNIFORM_TOL_WM2", 0.1))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    import bench  # reuses the bench scene/LUT plumbing

    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles
    from tenstream_tpu.spectral import specint_pprts
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics

    bench.NX, bench.NY, bench.NZLOW, bench.DZLOW = NX, NY, NZLOW, DZLOW
    lut = bench.load_bench_lut()
    opp = OptProp(lut)
    atm, _ = bench.build_scene()
    nlay = atm.nlay
    gas = EcckdGasOptics(n_gpt=int(os.environ.get("BENCH_NGPT", 32)))

    def run(nx, ny):
        grid = Grid.create(nlay, nx, ny, 100.0, 100.0,
                           atm.dz.astype(np.float32))
        s = PprtsSolver(grid, opp)
        l1d = np.asarray(s._l1d, bool)
        k_run = int(np.argmin(l1d)) if not l1d.all() else len(l1d)
        if k_run > 1:
            s.options.set("atm_collapse", k_run)
        s.set_angles(sundir_from_angles(120.0, 40.0))
        t0 = time.time()
        # default chunk mirrors bench.py's working sets: chunk=1 at
        # BASELINE-scale grids (chunk=8 there OOM'd: the cf=4 PC
        # factors vmap x8 to ~640 MB/level, docs/UNIFORM_256_r5.log
        # first attempt), chunk=8 below
        default_chunk = 1 if nx * ny >= 128 * 128 else 8
        res = specint_pprts(s, atm, albedo=0.15, lthermal=True,
                            lsolar=True, specint=gas,
                            band_chunk=int(os.environ.get("BENCH_CHUNK",
                                                          default_chunk)))
        jax.block_until_ready(res.abso)
        print(f"# {nx}x{ny}: {time.time()-t0:.1f}s", file=sys.stderr)
        s.check_convergence()
        return res

    exact = run(1, 1)
    full = run(NX, NY)

    fails = []
    for name in ("edn", "eup"):
        e = np.asarray(getattr(exact, name))[:, 0, 0]
        f = np.asarray(getattr(full, name))
        prof_err = np.abs(f.mean(axis=(1, 2)) - e).max()
        spread = np.abs(f - f.mean(axis=(1, 2), keepdims=True)).max()
        print(f"# {name}: max|profile - exact| = {prof_err:.4f} W/m2, "
              f"horizontal spread = {spread:.4f} W/m2", file=sys.stderr)
        if prof_err > TOL_WM2 or spread > TOL_WM2:
            fails.append((name, float(prof_err), float(spread)))
    if fails:
        raise SystemExit(f"UNIFORM ACCURACY FAIL (> {TOL_WM2} W/m2): {fails}")
    print(f"# UNIFORM ACCURACY PASS at {NX}x{NY}x{nlay} "
          f"(gate {TOL_WM2} W/m2)", file=sys.stderr)


if __name__ == "__main__":
    main()
