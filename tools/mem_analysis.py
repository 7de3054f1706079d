#!/usr/bin/env python
"""Compile-only HBM accounting for the band-chunked solve program.

Lowers and compiles the exact jitted function bench.py executes (via
`PprtsSolver._solve_fn` + `jax.vmap`) at a given grid/chunk size WITHOUT
running it, then prints XLA's buffer-assignment statistics
(`compiled.memory_analysis()`): argument / output / temp / peak bytes.
This is how the BASELINE-scale (256^2 x 128) memory wall is diagnosed
and regression-tested — the round-2 OOM (26.2 GB at band_chunk=2,
`ROUND2_NOTES.md` item 3) was only visible from a crashed run's
allocation dump; this makes the same information available in seconds
per config from a compile.

Usage:
  python tools/mem_analysis.py --nx 256 --ny 256 --nzlow 112 --dzlow 50 \
      --chunk 2 [--solar|--thermal] [--dump-hlo DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--ny", type=int, default=256)
    ap.add_argument("--nzlow", type=int, default=112)
    ap.add_argument("--dzlow", type=float, default=50.0)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--solar", action="store_true", help="solar-only program (default: both)")
    ap.add_argument("--thermal", action="store_true", help="thermal-only program")
    ap.add_argument("--collapse", default="auto")
    ap.add_argument("--diff-solver", default=None, choices=[None, "bicgstab", "richardson"])
    ap.add_argument("--no-orbit", action="store_true")
    ap.add_argument("--interp", default=None)
    ap.add_argument("--dump-hlo", default=None, help="XLA dump dir (per-buffer detail)")
    ap.add_argument("--cpu", action="store_true", help="CPU backend (layouts differ from TPU!)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    if args.dump_hlo:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_dump_to={args.dump_hlo} --xla_dump_hlo_as_text"
        )

    os.environ["BENCH_NX"] = str(args.nx)
    os.environ["BENCH_NY"] = str(args.ny)
    os.environ["BENCH_NZLOW"] = str(args.nzlow)
    os.environ["BENCH_DZLOW"] = str(args.dzlow)
    os.environ["BENCH_COLLAPSE"] = str(args.collapse)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench
    from tenstream_tpu.core.types import ireals
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    lut = bench.load_bench_lut()
    big = args.nx * args.ny >= 128 * 128
    interp_mode = args.interp or ("simplex" if big else "multilinear")
    opp = OptProp(lut, interp_mode=interp_mode, loop_gathers=big)
    atm, _ = bench.build_scene()
    grid = Grid.create(atm.nlay, args.nx, args.ny, 100.0, 100.0, atm.dz.astype(np.float32))
    solver = PprtsSolver(grid, opp)
    if args.diff_solver:
        solver.options.set("diff_solver", args.diff_solver)
    if args.no_orbit:
        solver.options.set("pprts_orbit_coeffs", False)
    if args.collapse not in ("0", "off"):
        l1d = np.asarray(solver._l1d, bool)
        k_run = int(np.argmin(l1d)) if not l1d.all() else len(l1d)
        K = k_run if args.collapse == "auto" else min(int(args.collapse), k_run)
        if K > 1:
            solver.options.set("atm_collapse", K)
    solver.set_angles(sundir_from_angles(120.0, 40.0))

    nz, nx, ny = grid.nz, grid.nx, grid.ny
    nzs = solver.nz_solve
    nb = args.chunk
    scheme = solver.scheme
    print(f"# grid {nx}x{ny}x{nz} (solve {nzs} layers), chunk {nb}, "
          f"interp {interp_mode}, orbit={not args.no_orbit}", file=sys.stderr)

    S = jax.ShapeDtypeStruct
    f = ireals
    argspec = dict(
        kabs=S((nb, nzs if False else nz, nx, ny), f),
        ksca=S((nb, nz, nx, ny), f),
        g=S((nb, nz, nx, ny), f),
        albedo2d=S((nx, ny), f),
        planck=S((nb, nz + 1, nx, ny), f),
        planck_srfc=S((nb, nx, ny), f),
        edirTOA=S((nb,), f),
        x0=S((nb, scheme.ndiff, nzs + 1, nx, ny), f),
        omega0=S((nb,), f),
        planck_bldg=S((nb, nz, nx, ny), f),
    )

    modes = []
    if args.solar or not args.thermal:
        modes.append(("solar", False, True))
    if args.thermal or not args.solar:
        modes.append(("thermal", True, False))

    GB = 1024 ** 3
    for name, lth, lsol in modes:
        fn = solver._solve_fn(lthermal=lth, lsolar=lsol, has_planck_srfc=lth)
        vfn = jax.vmap(fn, in_axes=(0, 0, 0, None, 0, 0, 0, 0, 0, 0))
        lowered = jax.jit(vfn).lower(*argspec.values())
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        print(f"[{name}]")
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(m, k, None)
            if v is not None:
                print(f"  {k:34s} {v / GB:8.2f} GB")
        peak = getattr(m, "peak_memory_in_bytes", None)
        if peak is None:
            peak = (getattr(m, "argument_size_in_bytes", 0)
                    + getattr(m, "output_size_in_bytes", 0)
                    + getattr(m, "temp_size_in_bytes", 0)
                    - getattr(m, "alias_size_in_bytes", 0))
            print(f"  arg+out+temp-alias                 {peak / GB:8.2f} GB")
        else:
            print(f"  peak_memory_in_bytes               {peak / GB:8.2f} GB")


if __name__ == "__main__":
    main()
