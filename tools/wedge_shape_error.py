#!/usr/bin/env python
"""Quantify the canonical-triangle approximation for distorted wedge
cells (round-2 verdict item 7 / PARITY 'known deviation').

The solver evaluates ONE canonical right triangle A=(0,0) B=(1,0)
C=(1,1), rotated per cell and azimuth-mapped via param_phi
(`plexrt/optprop.py`, `plexrt/param_phi.py`); the reference instead
carries triangle-shape axes in its wedge LUT space
(`src/optprop_base.F90:230-243`, `src/LUT_param_phi.F90:20-47`).

This tool traces DISTORTED triangles directly (the generalized
`run_wedge_boxmc(apex=(cx, cy))`) and compares their (T, S) transfer
matrices against the solver's canonical evaluation (aspect normalized
by sqrt(2*area), azimuth through `canonical_azimuth_map`) — isolating
the SHAPE error from table-interpolation error by using the MC tracer
on both sides.

Output: a markdown error table (per shape x optical regime: max |dT|,
max |dS|, and the energy-weighted mean) for PARITY.md.

Usage: JAX_PLATFORMS=cpu python tools/wedge_shape_error.py [--photons N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def flux_study(n_photons: int, theta: float):
    """FLUX-level error of the canonical-triangle approximation on an
    equilateral (ICON-ideal) mesh: solve the same scene with (a) the
    canonical table + param-phi azimuth map (the solver default) and
    (b) a SHAPE-EXACT table traced on the equilateral cell itself, and
    compare edir/edn/eup/abso.  Returns the relative error dict."""
    import jax
    import numpy as np

    from tenstream_tpu.plexrt.icon import trimesh_equilateral
    from tenstream_tpu.plexrt.optprop import (
        WedgeAxes, WedgeOptProp, create_wedge_lut,
    )
    from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon

    # compact axes bracketing the single optical state used below
    axes_d = WedgeAxes(
        tau=np.array([0.05, 0.4, 2.0, 8.0], np.float32),
        w0=np.array([0.3, 0.9, 0.99999], np.float32),
        aspect=np.array([0.5, 0.9, 1.6], np.float32),
        g=np.array([0.0, 0.5, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 13).astype(np.float32),
        theta=np.array([0.0, 25.0, 50.0, 75.0], np.float32),
    )
    axes_f = WedgeAxes(tau=axes_d.tau, w0=axes_d.w0, aspect=axes_d.aspect,
                       g=axes_d.g)
    eq_apex = (0.5, float(np.sqrt(3) / 2))

    lut_canon = create_wedge_lut(axes_d, axes_f, n_photons=n_photons, seed=3)
    lut_exact = create_wedge_lut(axes_d, axes_f, n_photons=n_photons, seed=3,
                                 apex=eq_apex)

    mesh = trimesh_equilateral(6, 6, 100.0)
    nz = 4
    nc = mesh.ncell
    ka = np.full((nz, nc), 2e-4, np.float32)
    ks = np.full((nz, nc), 1e-3, np.float32)
    ks[1] = 0.02  # scattering layer
    gg = np.full((nz, nc), 0.5, np.float32)
    sd = np.array([np.sin(np.deg2rad(30)) * np.sin(np.deg2rad(theta)),
                   np.cos(np.deg2rad(30)) * np.sin(np.deg2rad(theta)),
                   -np.cos(np.deg2rad(theta))])

    out = {}
    for name, lut in (("canonical", lut_canon), ("exact", lut_exact)):
        s = PlexrtSolverIcon(mesh, [100.0] * nz, WedgeOptProp(lut))
        if name == "exact":
            # the table IS the cell shape: no param-phi azimuth mapping
            s._use_param_phi = False
        s.set_optical_properties(0.2, ka, ks, gg)
        s.set_angles(sd)
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        out[name] = [None if a is None else np.asarray(a)
                     for a in s.get_result(sol)]

    errs = {}
    for k, (a, b) in zip(("edir", "edn", "eup", "abso"),
                         zip(out["canonical"], out["exact"])):
        scale = max(np.abs(b).max(), 1e-12)
        errs[k] = float(np.abs(a - b).max() / scale)
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", type=int, default=50000)
    ap.add_argument("--theta", type=float, default=40.0)
    ap.add_argument("--flux", action="store_true",
                    help="run the flux-level equilateral-mesh study")
    ap.add_argument("--flux-hetero", action="store_true",
                    help="flux-level distorted-heterogeneous-mesh study "
                         "(canonical vs 4-corner shaped blend vs "
                         "per-shape-exact oracle)")
    args = ap.parse_args()

    if args.flux_hetero:
        if os.environ.get("JAX_PLATFORMS"):
            import jax

            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        errs = flux_hetero_study(args.photons, args.theta)
        print("# flux-level error vs per-shape-exact oracle "
              f"(distorted mesh, rel. to field max, theta={args.theta}):")
        for name, e in errs.items():
            line = ", ".join(f"{k} {v*100:.2f}%" for k, v in e.items())
            print(f"#   {name}: {line}")
        return

    if args.flux:
        if os.environ.get("JAX_PLATFORMS"):
            import jax

            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        errs = flux_study(args.photons, args.theta)
        print("# flux-level canonical-vs-shape-exact error "
              f"(equilateral mesh, rel. to field max, theta={args.theta}):")
        for k, v in errs.items():
            print(f"#   {k}: {v*100:.2f}%")
        return

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import numpy as np

    from tenstream_tpu.plexrt.param_phi import canonical_azimuth_map
    from tenstream_tpu.plexrt.wedge_boxmc import run_wedge_boxmc

    # shapes in units of |AB|: name -> apex (cx, cy).  equilateral is
    # the ICON ideal; the others span realistic icosahedral-grid
    # distortions (ICON R2B* triangles deviate from equilateral by
    # ~10-20% in edge-length ratio) plus one deliberately bad obtuse.
    shapes = {
        "equilateral": (0.5, np.sqrt(3) / 2),
        "icon-ish A": (0.45, 0.80),
        "icon-ish B": (0.60, 0.95),
        "obtuse": (0.25, 0.65),
        "elongated": (0.50, 1.20),
    }
    states = {
        "thin rayleigh": dict(tauz=0.1, w0=0.5, g=0.0),
        "cloud": dict(tauz=5.0, w0=0.99, g=0.85),
        "absorbing": dict(tauz=1.0, w0=0.3, g=0.3),
    }
    phis = (0.0, 30.0, 90.0)
    npho = args.photons

    def trace_all(apex, st, aspect, phi=None):
        """(T, S) stacked over sources: direct top (src 0) at the given
        phi, plus all 8 diffuse sources."""
        out_T, out_S = [], []
        if phi is not None:
            T, S = run_wedge_boxmc(
                jax.random.PRNGKey(1), 0, True, st["tauz"], st["w0"], st["g"],
                aspect, phi, args.theta, n_photons=npho, apex=apex,
            )
            out_T.append(np.asarray(T))
            out_S.append(np.asarray(S))
        for src in range(8):
            T, S = run_wedge_boxmc(
                jax.random.PRNGKey(src + 2), src, False, st["tauz"], st["w0"],
                st["g"], aspect, n_photons=npho, apex=apex,
            )
            out_T.append(np.asarray(T))
            out_S.append(np.asarray(S))
        return np.stack(out_T), np.stack(out_S)

    dz = 0.8  # |AB| units; a mid-range layer aspect
    print(f"# canonical-triangle shape error (n_photons={npho}, "
          f"theta={args.theta}, dz/|AB|={dz})")
    print()
    print("| shape | regime | max|dT| dir | max|dS| dir | max|dS| diff | mean|dS| diff |")
    print("|---|---|---|---|---|---|")
    worst = {}
    for sname, (cx, cy) in shapes.items():
        area = cy / 2.0
        L = np.sqrt(2.0 * area)  # solver's normalization length
        aspect_exact = dz  # tracer aspect is dz/|AB|
        aspect_canon = dz / L
        for stname, st in states.items():
            dT_dir, dS_dir, dS_diff = 0.0, 0.0, []
            for phi in phis:
                phi_c = float(np.asarray(canonical_azimuth_map(
                    np.float32(phi), np.float32(cx), np.float32(cy), 1.0, 1.0)))
                T_e, S_e = trace_all((cx, cy), st, aspect_exact, phi)
                T_c, S_c = trace_all(None, st, aspect_canon, phi_c)
                dT_dir = max(dT_dir, float(np.abs(T_e[0] - T_c[0]).max()))
                dS_dir = max(dS_dir, float(np.abs(S_e[0] - S_c[0]).max()))
                dS_diff.append(np.abs(S_e[1:] - S_c[1:]))
            dS_diff = np.concatenate(dS_diff)
            print(f"| {sname} (C=({cx:.2f},{cy:.2f})) | {stname} | "
                  f"{dT_dir:.3f} | {dS_dir:.3f} | {dS_diff.max():.3f} | "
                  f"{dS_diff.mean():.4f} |")
            worst[(sname, stname)] = (dT_dir, dS_dir, float(dS_diff.max()))
    print()
    eq = [v for k, v in worst.items() if k[0] == "equilateral"]
    print(f"# equilateral worst-case: dT {max(v[0] for v in eq):.3f}, "
          f"dS(dir) {max(v[1] for v in eq):.3f}, dS(diff) {max(v[2] for v in eq):.3f}")




def flux_hetero_study(n_photons: int, theta: float):
    """FLUX-level error on a strongly DISTORTED heterogeneous mesh
    (round-3 verdict item 4b): solve one scene three ways —

      canonical : single canonical table + param-phi azimuth map
                  (the pre-round-4 fallback for unmatched shapes)
      shaped    : `WedgeOptPropShaped` blending the 4 bounding-box
                  corner shape tables per cell (round-4 default via
                  `wedge_optprop_for_mesh`)
      oracle    : per-unique-cell-shape EXACT tables (a shaped optprop
                  with one-hot weights) — shape error zero by
                  construction, only MC/interp noise remains

    and report each approximation's flux error against the oracle.
    Done-criterion: shaped < 2% (PARITY.md)."""
    import numpy as np

    from tenstream_tpu.plexrt.icon import (
        trimesh_from_points,
        trimesh_from_structured,
    )
    from tenstream_tpu.plexrt.optprop import (
        WedgeAxes,
        WedgeOptProp,
        WedgeOptPropShaped,
        create_wedge_lut,
        mesh_cell_shapes,
    )
    from tenstream_tpu.plexrt.solver_unstructured import PlexrtSolverIcon

    axes_d = WedgeAxes(
        tau=np.array([0.05, 0.4, 2.0, 8.0], np.float32),
        w0=np.array([0.3, 0.9, 0.99999], np.float32),
        aspect=np.array([0.5, 0.9, 1.6], np.float32),
        g=np.array([0.0, 0.5, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 13).astype(np.float32),
        theta=np.array([0.0, 25.0, 50.0, 75.0], np.float32),
    )
    axes_f = WedgeAxes(axes_d.tau, axes_d.w0, axes_d.aspect, axes_d.g)

    base = trimesh_from_structured(4, 4, 100.0, 100.0)
    rng = np.random.default_rng(12)
    verts = base.verts + rng.uniform(-20.0, 20.0, base.verts.shape)
    mesh = trimesh_from_points(verts, base.tris)
    cx, cy = mesh_cell_shapes(mesh)
    print(f"# mesh: {mesh.ncell} cells, apex spread "
          f"cx [{cx.min():.2f}, {cx.max():.2f}] "
          f"cy [{cy.min():.2f}, {cy.max():.2f}]", flush=True)

    mk = lambda apex, seed=7: create_wedge_lut(
        axes_d, axes_f, n_photons=n_photons, seed=seed, apex=apex)

    # oracle: exact table per unique cell shape, one-hot weights
    uniq, inv = np.unique(np.round(np.stack([cx, cy], -1), 6),
                          axis=0, return_inverse=True)
    print(f"# oracle: {len(uniq)} unique shapes", flush=True)
    oracle = WedgeOptPropShaped([mk(tuple(a)) for a in uniq])
    W = np.zeros((len(uniq), mesh.ncell), np.float32)
    W[inv, np.arange(mesh.ncell)] = 1.0
    import jax.numpy as jnp
    from tenstream_tpu.core.types import ireals
    oracle._w = jnp.asarray(W, ireals)
    oracle._cells = (jnp.asarray(cx, ireals), jnp.asarray(cy, ireals))

    shaped = WedgeOptPropShaped([
        mk((float(x), float(y)))
        for y in (cy.min(), cy.max()) for x in (cx.min(), cx.max())
    ])

    canonical = WedgeOptProp(mk((1.0, 1.0)))

    nz, nc = 4, mesh.ncell
    ka = np.full((nz, nc), 2e-4, np.float32)
    ks = np.full((nz, nc), 1e-3, np.float32)
    ks[1] = 0.02
    gg = np.full((nz, nc), 0.5, np.float32)
    sd = np.array([np.sin(np.deg2rad(30)) * np.sin(np.deg2rad(theta)),
                   np.cos(np.deg2rad(30)) * np.sin(np.deg2rad(theta)),
                   -np.cos(np.deg2rad(theta))])

    out = {}
    for name, opp in (("canonical", canonical), ("shaped", shaped),
                      ("oracle", oracle)):
        s = PlexrtSolverIcon(mesh, [100.0] * nz, opp)
        s.set_optical_properties(0.2, ka, ks, gg)
        s.set_angles(sd)
        sol = s.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
        out[name] = [None if a is None else np.asarray(a)
                     for a in s.get_result(sol)]

    errs = {}
    for name in ("canonical", "shaped"):
        e = {}
        for k, (a, b) in zip(("edir", "edn", "eup", "abso"),
                             zip(out[name], out["oracle"])):
            scale = max(np.abs(b).max(), 1e-12)
            e[k] = float(np.abs(a - b).max() / scale)
        errs[name] = e
    return errs


if __name__ == "__main__":
    main()
