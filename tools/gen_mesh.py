#!/usr/bin/env python
"""Generate / inspect triangle meshes for the wedge (plexrt) solver.

Parity: reference mesh-generator mains `plexrt/gen_fish_plex.F90`,
`gen_regular_plex.F90` and `gen_plex_from_icon.F90` — CLI tools that
produce a 2-D triangle mesh in the ICON grid-file layout which the
solvers then extrude to 3-D wedge columns.

Usage:
  python tools/gen_mesh.py regular --nx 16 --ny 16 --dx 100 --out grid.nc
  python tools/gen_mesh.py fish    --nx 16 --ny 16 --dx 100 --out grid.nc
  python tools/gen_mesh.py info    grid.nc
  python tools/gen_mesh.py rotate  grid.nc --angle 30 --out rotated.nc

`regular` and `fish` both emit the structured half-rectangle
triangulation (the reference's "fish" pattern is the same topology with
alternating orientation, which our canonical-triangle convention already
encodes via the 180-degree partner cells); `info` prints a summary of
any readable ICON grid file; `rotate` rigidly rotates a mesh in the
horizontal plane (useful with the rotation-invariance tests).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("regular", "fish"):
        p = sub.add_parser(name)
        p.add_argument("--nx", type=int, default=16)
        p.add_argument("--ny", type=int, default=16)
        p.add_argument("--dx", type=float, default=100.0)
        p.add_argument("--dy", type=float, default=None)
        p.add_argument("--out", required=True)
    p = sub.add_parser("info")
    p.add_argument("grid")
    p = sub.add_parser("rotate")
    p.add_argument("grid")
    p.add_argument("--angle", type=float, required=True)
    p.add_argument("--out", required=True)
    args = ap.parse_args()

    from tenstream_tpu.plexrt.icon import (
        read_icon_grid,
        rotate_mesh,
        trimesh_from_structured,
        write_icon_grid,
    )

    if args.cmd in ("regular", "fish"):
        mesh = trimesh_from_structured(
            args.nx, args.ny, args.dx, args.dy or args.dx
        )
        write_icon_grid(args.out, mesh)
        print(f"{args.cmd} mesh: {mesh.ncell} cells, "
              f"{mesh.verts.shape[0]} vertices -> {args.out}")
        return

    mesh = read_icon_grid(args.grid)
    if args.cmd == "rotate":
        write_icon_grid(args.out, rotate_mesh(mesh, args.angle))
        print(f"rotated {args.grid} by {args.angle} deg -> {args.out}")
        return

    import numpy as np

    nbnd = int((mesh.nbr < 0).sum())
    ext = mesh.verts.max(0) - mesh.verts.min(0)
    print(f"{args.grid}: {mesh.ncell} cells, {mesh.verts.shape[0]} vertices")
    print(f"  extent {ext[0]:.1f} x {ext[1]:.1f} m, "
          f"open boundary sides: {nbnd}")
    print(f"  cell area min/mean/max = {mesh.area.min():.1f}/"
          f"{mesh.area.mean():.1f}/{mesh.area.max():.1f} m2")
    print(f"  phi_rot spread = {np.ptp(mesh.phi_rot):.1f} deg")


if __name__ == "__main__":
    main()
