#!/usr/bin/env python
"""Inspect / replay / diff scene-dump archives.

Parity: reference `misc/solve_binary_dump.py` (loads the binary input
dumps written by `-solve_pprts_dump` / specint `dump_input` and
inspects or re-solves them).  Here the archives are the npz scenes
written by `tenstream_tpu.utils.io.dump_scene`.

Usage:
  python tools/inspect_dump.py scene.npz                 # print contents
  python tools/inspect_dump.py scene.npz --solve         # re-solve + flux summary
  python tools/inspect_dump.py a.npz --diff b.npz        # compare archives
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _stats(a: np.ndarray) -> str:
    if a.ndim == 0:
        return f"= {a}"
    dt = a.dtype
    a = a.astype(np.float64) if a.dtype.kind == "f" else a
    return (f"shape {a.shape} {dt}  min {np.min(a):.4g}  "
            f"max {np.max(a):.4g}  mean {np.mean(a):.4g}")


def inspect(path: str) -> dict:
    from tenstream_tpu.utils.io import load_scene

    scene = load_scene(path)
    print(f"# {path}: {len(scene)} arrays")
    for k in sorted(scene):
        print(f"  {k:14s} {_stats(scene[k])}")
    return scene


def diff(path_a: str, path_b: str) -> int:
    from tenstream_tpu.utils.io import load_scene

    a, b = load_scene(path_a), load_scene(path_b)
    keys = sorted(set(a) | set(b))
    worst = 0.0
    for k in keys:
        if k not in a or k not in b:
            print(f"  {k:14s} only in {'B' if k not in a else 'A'}")
            worst = np.inf
            continue
        if a[k].shape != b[k].shape:
            print(f"  {k:14s} shape {a[k].shape} vs {b[k].shape}")
            worst = np.inf
            continue
        d = np.abs(a[k].astype(np.float64) - b[k].astype(np.float64)).max()
        scale = max(np.abs(a[k]).max(), 1e-30)
        print(f"  {k:14s} max |A-B| {d:.4g}  (rel {d / scale:.3g})")
        worst = max(worst, d / scale)
    print(f"# worst relative deviation: {worst:.3g}")
    return 0 if worst < 1e-5 else 1


def solve(path: str) -> int:
    """Re-solve a monochromatic scene dump and print the flux summary."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.utils.io import load_scene

    sc = load_scene(path)
    kabs = sc["kabs"]
    nz, nx, ny = kabs.shape
    dx = float(sc.get("dx", 100.0))
    dz = sc.get("dz3d", np.full((nz, nx, ny), float(sc.get("dz", 100.0)), np.float32))
    lut_path = os.environ.get("BENCH_LUT")
    if lut_path:
        from tenstream_tpu.optprop.lut import LUT

        lut = LUT.load(lut_path)
    else:
        lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                                 n_photons=2000)
    solver = PprtsSolver(Grid.create(nz, nx, ny, dx, dx, dz), OptProp(lut))
    solver.set_optical_properties(
        float(sc.get("albedo", 0.15)), kabs, sc["ksca"], sc["g"],
        planck=sc.get("planck"), planck_srfc=sc.get("planck_srfc"),
    )
    lsolar = "sundir" in sc
    if lsolar:
        solver.set_angles(sc["sundir"])
    lthermal = "planck" in sc
    solver.solve(lthermal=lthermal, lsolar=lsolar,
                 edirTOA=float(sc.get("edirTOA", 1000.0)))
    edir, edn, eup, abso = solver.get_result()
    if edir is not None:
        edir = np.asarray(edir)
        print(f"edir: TOA {edir[0].mean():.2f}  srfc {edir[-1].mean():.2f} W/m2")
    edn, eup, abso = map(np.asarray, (edn, eup, abso))
    print(f"edn srfc {edn[-1].mean():.2f}  eup TOA {eup[0].mean():.2f} W/m2  "
          f"abso max {abso.max():.3e} W/m3")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--diff", metavar="OTHER", default=None)
    ap.add_argument("--solve", action="store_true")
    args = ap.parse_args()

    if args.diff:
        inspect(args.dump)
        print()
        return diff(args.dump, args.diff)
    inspect(args.dump)
    if args.solve:
        print()
        return solve(args.dump)
    return 0


if __name__ == "__main__":
    sys.exit(main())
