#!/usr/bin/env python
"""Generate BoxMC transfer-coefficient LUTs (reference `src/createLUT.F90`).

Usage:
  python tools/create_lut.py 3_10 [--preset default|mockup|bench]
                                  [--photons N] [--out DIR]

Tables are cached under the output dir keyed by the axis configuration;
interrupted runs resume from per-source checkpoints.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _honor_platform_env():
    """An explicit JAX_PLATFORMS request (e.g. cpu generation while the
    TPU is busy) must win over the host sitecustomize's forced
    accelerator registration."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass


def main():
    _honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("scheme", help="stream scheme, e.g. 3_10")
    ap.add_argument(
        "--preset", default="default",
        choices=["default", "mockup", "bench", "production"],
    )
    ap.add_argument("--photons", type=int, default=10000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-pallas", action="store_true",
                    help="force the jnp tracer (pallas service down)")
    ap.add_argument("--max-rounds", type=int, default=None,
                    help="production preset: cap adaptive rounds per entry. "
                    "Staged generation (breadth-first): run once with a low "
                    "cap to get a COMPLETE table quickly, then re-run with "
                    "a higher cap — checkpoints make every pass incremental.")
    ap.add_argument("--dir-max-rounds", type=int, default=None,
                    help="production preset: cap for the dir2diff sources")
    ap.add_argument("--compose-dir-from", default=None, metavar="DONOR_LUT",
                    help="production preset: staged delivery — compose the "
                    "table from the CONVERGED diffuse checkpoints plus this "
                    "donor LUT's direct tables (dir2dir regenerated "
                    "closed-form), instead of waiting for the full adaptive "
                    "dir2diff pass")
    args = ap.parse_args()

    if args.scheme.startswith("wedge_"):
        # wedge LUTs (plexrt solvers): fixed-photon generation over the
        # wedge parameter space with mirror symmetrization
        from tenstream_tpu.plexrt.optprop import (
            default_axes as wedge_default_axes,
            load_or_create_wedge_lut,
            test_axes as wedge_test_axes,
        )

        wscheme = args.scheme[len("wedge_"):]
        axes = wedge_test_axes() if args.preset == "mockup" else wedge_default_axes()
        t0 = time.time()
        lut = load_or_create_wedge_lut(
            axes, n_photons=args.photons, basename=args.out,
            verbose=True, scheme=wscheme,
        )
        print(f"done in {time.time()-t0:.1f}s; dir table {lut.dir2dir.shape}, "
              f"diff table {lut.diff2diff.shape}")
        return

    from tenstream_tpu.optprop.lut import (
        create_production_lut,
        default_axes,
        load_or_create_lut,
        lut_basename,
        mockup_axes,
        production_axes,
    )

    if args.preset == "production":
        # adaptive-convergence production tables (reference stddev
        # criteria); resumes from per-source checkpoints
        base = args.out or lut_basename()
        out_path = os.path.join(base, f"LUT_{args.scheme}_production.npz")
        t0 = time.time()
        if args.compose_dir_from:
            from tenstream_tpu.optprop.lut import compose_production_lut

            lut, meta = compose_production_lut(
                args.scheme, args.compose_dir_from,
                checkpoint_dir=os.path.join(base, f"ckpt_{args.scheme}_production"),
            )
            lut.save(out_path, meta=meta)
            print(f"composed in {time.time()-t0:.1f}s -> {out_path}")
            print("meta:", meta)
            return
        kw = {}
        if args.max_rounds is not None:
            kw["max_rounds"] = args.max_rounds
        if args.dir_max_rounds is not None:
            kw["dir_max_rounds"] = args.dir_max_rounds
        lut, meta = create_production_lut(
            args.scheme,
            production_axes(True),
            production_axes(False),
            checkpoint_dir=os.path.join(base, f"ckpt_{args.scheme}_production"),
            use_pallas=False if args.no_pallas else None,
            **kw,
        )
        lut.save(out_path, meta=meta)
        print(f"done in {time.time()-t0:.1f}s -> {out_path}")
        print("meta:", meta)
        return

    if args.preset == "mockup":
        da, fa = mockup_axes(True), mockup_axes(False)
    elif args.preset == "bench":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
        from bench import bench_lut_axes

        da, fa = bench_lut_axes()
    else:
        da, fa = default_axes(True), default_axes(False)

    t0 = time.time()
    lut = load_or_create_lut(
        args.scheme, da, fa, n_photons=args.photons, basename=args.out, verbose=True
    )
    print(f"done in {time.time()-t0:.1f}s; dir table {lut.dir2dir.shape}, "
          f"diff table {lut.diff2diff.shape}")


if __name__ == "__main__":
    main()
