#!/usr/bin/env python
"""Per-phase timing of the solve pipeline on the bench scene.

Phases (each jitted and timed in isolation on the same inputs):
  assemble  — LUT interpolation + coefficient field assembly
  edir      — direct z-scan with cyclic side recurrences
  sources   — dir2diff scattering source + surface reflection
  ediff     — BiCGStab diffuse solve (warm and cold starts)
  absorb    — flux-divergence absorption
  gasoptics — ecCKD tau/planck computation (host-side numpy)

Writes a markdown table to stdout; run on the TPU for the committed
profile (docs/PROFILE_r2.md).  Honors JAX_PLATFORMS for CPU A/Bs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    import jax.numpy as jnp

    from bench import NGPT, NX, NY, build_scene, load_bench_lut
    from tenstream_tpu.core.types import ireals
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.pprts.coeffs import assemble_coeffs, determine_1d_layers
    from tenstream_tpu.pprts.ediff import solve_bicgstab
    from tenstream_tpu.pprts.edir import solve_edir
    from tenstream_tpu.pprts.absorption import calc_flx_div
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.operators import (
        dir2diff_source,
        direct_surface_reflection,
    )
    from tenstream_tpu.pprts.sun import sundir_from_angles, suninfo_from_sundir
    from tenstream_tpu.spectral.ecckd import EcckdGasOptics
    from tenstream_tpu.streams import get_scheme

    lut = load_bench_lut()
    # mirror bench.py's shipped configuration: one-hot MXU interpolation
    # (round-4 default — no corner-gather temps at any grid size; set
    # PROFILE_INTERP=simplex/multilinear for the round-3 A/B rows)
    big = NX * NY >= 128 * 128
    interp_mode = os.environ.get("PROFILE_INTERP", "onehot")
    opp = OptProp(lut, interp_mode=interp_mode,
                  loop_gathers=big and interp_mode != "onehot")
    scheme = get_scheme("3_10")
    atm, lwc = build_scene()
    nlay = atm.nlay
    grid = Grid.create(nlay, NX, NY, 100.0, 100.0, atm.dz.astype(np.float32))
    sun = suninfo_from_sundir(sundir_from_angles(120.0, 40.0))
    l1d = np.asarray(determine_1d_layers(grid.dz3d, grid.dx, 2.0))
    nz3 = int((~l1d).sum())
    ncell3 = nz3 * NX * NY
    z_slab = 0
    if ncell3 > 4_000_000:
        n_steps = max(1, -(-ncell3 // 1_000_000))
        z_slab = max(1, -(-nz3 // n_steps))

    gas = EcckdGasOptics(n_gpt=NGPT)
    t0 = time.time()
    sp = gas.solar(atm)
    t_gas = time.time() - t0

    # single-gpt fields with the cloud merged in (mid-band)
    from tenstream_tpu.spectral.gasoptics import cloud_optprops
    from tenstream_tpu.spectral.specint import _merge_cloud, _to_kfields
    from tenstream_tpu.ops.delta_scale import delta_scale

    k = NGPT // 2
    tau_g = np.asarray(sp.tau)[k][:, None, None] * np.ones((NX, NY), np.float32)
    w0_g = np.asarray(sp.w0)[k][:, None, None] * np.ones((NX, NY), np.float32)
    g_g = np.asarray(sp.g)[k][:, None, None] * np.ones((NX, NY), np.float32)
    reff = np.full_like(lwc, 10.0)
    tc, wc, gc = cloud_optprops(jnp.asarray(lwc, ireals), jnp.asarray(reff, ireals), grid.dz3d)
    tau, w0, g = _merge_cloud(jnp.asarray(tau_g), jnp.asarray(w0_g), jnp.asarray(g_g), tc, wc, gc)
    kabs, ksca, g = delta_scale(*_to_kfields(tau, w0, g, grid.dz3d))

    albedo2d = jnp.full((NX, NY), 0.15, ireals)

    import functools

    # chip peaks for the efficiency columns (v5e defaults; override for
    # other chips).  HBM bandwidth is the binding roofline for every
    # phase here: the diffuse operator moves ~17 B/FLOP-pair per cell,
    # so "fast" means "% of HBM peak", not MXU utilization.
    PEAK_GBPS = float(os.environ.get("PEAK_GBPS", 819.0))
    PEAK_TFLOPS = float(os.environ.get("PEAK_TFLOPS", 197.0))  # bf16 MXU

    _costs = {}

    def cost_of(jitted, *args):
        """XLA's own cost model for the compiled phase: (GFLOP, GB)."""
        try:
            c = jitted.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return (float(c.get("flops", 0.0)) / 1e9,
                    float(c.get("bytes accessed", 0.0)) / 1e9)
        except Exception:
            return (0.0, 0.0)

    def timeit(fn, *args, reps=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    # broadcastable (Nz,1,1) dz mirrors the solver (keeps aspect
    # per-layer so assembly takes the one-hot MXU path, round 4)
    dz_bc = (grid.dz[:, None, None] if grid.dz.ndim == 1 else grid.dz3d)
    assemble = jax.jit(functools.partial(
        assemble_coeffs, scheme, opp, dz3d=dz_bc, dx=grid.dx, l1d=l1d,
        sun=sun, need_dir=True, z_slab=z_slab,
        orbit=getattr(opp, "_solver_orbit_idx", None) is not None))
    asm_cost = cost_of(assemble, kabs, ksca, g)
    t_asm, (coeffs, edd) = timeit(lambda a, b, c: assemble(a, b, c), kabs, ksca, g)

    inc = jnp.full((1, NX, NY), 1000.0 * grid.az, ireals)
    # shipped round-5 edir config: theta-tiered pass count + Aitken
    from tenstream_tpu.pprts.edir import inner_iter_policy

    ni, ait, cl = inner_iter_policy(sun.theta)
    edirfn = jax.jit(lambda dd, i: solve_edir(
        scheme, dd, i, sun.xinc, sun.yinc, n_inner=ni, aitken=ait, cleanup=cl))
    edir_cost = cost_of(edirfn, coeffs.dir2dir, inc)
    t_edir, edir = timeit(edirfn, coeffs.dir2dir, inc)
    # A/B: the old fixed plain-8 iteration (rounds 1-4 default)
    edirfn8 = jax.jit(lambda dd, i: solve_edir(
        scheme, dd, i, sun.xinc, sun.yinc, n_inner=8))
    t_edir8, _ = timeit(edirfn8, coeffs.dir2dir, inc)

    srcfn = jax.jit(lambda df, e, a: dir2diff_source(scheme, df, e, sun.xinc, sun.yinc)
                    + direct_surface_reflection(scheme, e, a))
    src_cost = cost_of(srcfn, coeffs.dir2diff, edir, albedo2d)
    t_src, b = timeit(srcfn, coeffs.dir2diff, edir, albedo2d)

    x0 = jnp.zeros_like(b)
    precond = os.environ.get("PROFILE_PRECOND", "two_level")
    t_ediff_cold, (x, nit, res) = timeit(
        lambda bb: solve_bicgstab(scheme, coeffs.diff2diff, bb, albedo2d,
                                  x0=x0, maxiter=3000, precond=precond),
        b, reps=3)
    t_ediff_warm, _ = timeit(
        lambda bb: solve_bicgstab(scheme, coeffs.diff2diff, bb, albedo2d,
                                  x0=x, maxiter=3000, precond=precond),
        b, reps=3)

    # the hot kernel in isolation: one diffuse transport operator apply
    # S(x) — the thing BiCGStab evaluates 2x per iteration.  Its cost
    # model vs wall-clock answers "is the 55%-of-solve phase at the
    # bandwidth speed-of-light".
    from tenstream_tpu.pprts.operators import diffuse_scatter
    from tenstream_tpu.pprts.ediff import vertical_line_solve

    # NB coefficient fields are passed as ARGUMENTS, not closures: a
    # closed-over 0.8 GB device array becomes an HLO constant and blows
    # the remote-compile request size on tunneled chips (HTTP 413)
    opfn = jax.jit(lambda cc, xx: diffuse_scatter(scheme, cc, xx, albedo2d))
    op_cost = cost_of(opfn, coeffs.diff2diff, x)
    t_op, _ = timeit(opfn, coeffs.diff2diff, x, reps=20)
    # old fused-scan line solve (refactorizes per apply; rounds 1-4)
    pcfn = jax.jit(lambda cc, rr: vertical_line_solve(scheme, cc, rr, albedo2d))
    pc_cost = cost_of(pcfn, coeffs.diff2diff, x)
    t_pc, _ = timeit(pcfn, coeffs.diff2diff, x, reps=20)
    # shipped round-5 factored line PC: build once, apply = 2 assoc
    # scans.  Factors must not ride as jit-closure constants (413 on
    # tunneled remote-compile), so separate build from apply by
    # difference-timing build+1 apply vs build+2 applies.
    from tenstream_tpu.pprts.ediff import make_line_pc

    line_b1 = jax.jit(lambda cc, rr: make_line_pc(scheme, cc, albedo2d)(rr))
    line_b2 = jax.jit(lambda cc, rr, r2: (
        lambda M: M(rr) + M(r2))(make_line_pc(scheme, cc, albedo2d)))
    t_lb1, _ = timeit(line_b1, coeffs.diff2diff, x, reps=10)
    t_lb2, _ = timeit(line_b2, coeffs.diff2diff, x, 2.0 * x, reps=10)
    t_line = max(t_lb2 - t_lb1, 0.0)          # apply-only
    t_line_bld = max(t_lb1 - t_line, 0.0)     # factorization-only
    # the shipped two-level PC: factorization ONCE per solve (timed
    # separately), application per iteration.  Factors ride as call
    # ARGUMENTS (closure constants 413 on tunneled remote-compile).
    from tenstream_tpu.pprts.precond import auto_coarse_factor

    cf = auto_coarse_factor(NX, NY)
    # SHIPPED two-level PC (round 5: factored line inside) — build vs
    # apply separated by difference timing (no factor closure constants)
    from tenstream_tpu.pprts.precond import make_two_level_pc

    pc2_b1 = jax.jit(lambda cc, aa, rr: make_two_level_pc(
        scheme, cc, aa, cf=cf)(rr))
    pc2_b2 = jax.jit(lambda cc, aa, rr, r2: (
        lambda M: M(rr) + M(r2))(make_two_level_pc(scheme, cc, aa, cf=cf)))
    t_p1, _ = timeit(pc2_b1, coeffs.diff2diff, albedo2d, x, reps=5)
    t_p2, _ = timeit(pc2_b2, coeffs.diff2diff, albedo2d, x, 2.0 * x, reps=5)
    t_pc2 = max(t_p2 - t_p1, 0.0)
    t_pc2_bld = max(t_p1 - t_pc2, 0.0)

    # A/B: the orbit-channel Pallas kernel (jit-wrapped so the
    # pad/transpose prep is amortizable; cost model unavailable for
    # pallas_call — analytic bytes instead)
    t_op_pl = None
    from tenstream_tpu.pprts.operators import OrbitCoeff, add_surface_reflection

    if isinstance(coeffs.diff2diff, OrbitCoeff):
        try:
            from tenstream_tpu.pprts.pallas_ops import diffuse_apply_pallas_orbit

            idxb = coeffs.diff2diff.idx.tobytes()
            apl = jax.jit(lambda co, xx: add_surface_reflection(
                scheme,
                diffuse_apply_pallas_orbit(scheme, idxb, co, xx),
                xx, albedo2d))
            t_op_pl, _ = timeit(apl, coeffs.diff2diff.orb, x, reps=20)
        except Exception as e:
            print(f"# pallas orbit kernel skipped: {e!r}", file=sys.stderr)

    # round-5 fused A-apply kernel (operator + shifts + albedo + dots in
    # one pallas_call) standalone, and the full BiCGStab solve with it
    # in-context — the keep-or-kill A/B for verdict item 2
    t_fused = None
    t_ediff_pl_cold = t_ediff_pl_warm = None
    nit_pl = 0
    if isinstance(coeffs.diff2diff, OrbitCoeff):
        try:
            from tenstream_tpu.pprts.pallas_ops import (
                fused_A_dots,
                prepare_orbit_fused,
            )

            idxb = coeffs.diff2diff.idx.tobytes()
            fAD = jax.jit(lambda co, uu, ww: fused_A_dots(
                scheme, idxb, prepare_orbit_fused(co), uu, ww, albedo2d))
            t_fused, _ = timeit(fAD, coeffs.diff2diff.orb, x, b, reps=20)

            t_ediff_pl_cold, (x_pl, nit_pl, _res) = timeit(
                lambda bb: solve_bicgstab(
                    scheme, coeffs.diff2diff, bb, albedo2d, x0=x0,
                    maxiter=3000, precond=precond, use_pallas=True),
                b, reps=3)
            t_ediff_pl_warm, _ = timeit(
                lambda bb: solve_bicgstab(
                    scheme, coeffs.diff2diff, bb, albedo2d, x0=x_pl,
                    maxiter=3000, precond=precond, use_pallas=True),
                b, reps=3)
        except Exception as e:
            print(f"# fused A kernel skipped: {e!r}", file=sys.stderr)

    a11, a12 = edd[0], edd[1]
    # must be jitted: eager mode pays the per-op dispatch latency of the
    # remote tunnel (~1 ms/op), inflating this phase ~20x vs its cost
    # inside the solver's jitted graph
    absfn = jax.jit(
        lambda cc, xx, ed: calc_flx_div(scheme, cc, xx, grid.volumes(), l1d,
                                        kabs, grid.dz3d, a11, a12, sun=sun,
                                        edir=ed))
    abs_cost = cost_of(absfn, coeffs, x, edir)
    t_abs, abso = timeit(absfn, coeffs, x, edir)

    # derived: per-iteration cost of the diffuse solve = 2 operator
    # applies + 2 preconditioner solves + ~6 vector axpy/dot passes
    ncell = nlay * NX * NY
    state_gb = 10 * (nlay + 1) * NX * NY * 4 / 1e9

    total = t_asm + t_edir + t_src + t_ediff_cold + t_abs
    print(f"# scene {NX}x{NY}x{nlay}, backend {jax.default_backend()}, "
          f"LUT diff table {np.asarray(lut.diff2diff).shape}")
    print(f"# gas optics (host, all {NGPT} gpt): {t_gas*1e3:.0f} ms")
    print(f"# peaks used: {PEAK_GBPS:.0f} GB/s HBM, {PEAK_TFLOPS:.0f} TFLOP/s "
          f"(override PEAK_GBPS/PEAK_TFLOPS)")
    print()
    print("| phase | ms/gpt | share | GFLOP | GB moved | GFLOP/s | GB/s | %HBM peak | %MXU |")
    print("|---|---|---|---|---|---|---|---|---|")

    def row(name, t, cost, share=None):
        gf, gb = cost
        sh = f"{share*100:.0f}%" if share is not None else "—"
        if gb > 0 and t > 0:
            print(f"| {name} | {t*1e3:.1f} | {sh} | {gf:.1f} | {gb:.2f} | "
                  f"{gf/t:.0f} | {gb/t:.0f} | {gb/t/PEAK_GBPS*100:.0f}% | "
                  f"{gf/t/PEAK_TFLOPS/1e3*100:.2f}% |")
        else:
            print(f"| {name} | {t*1e3:.1f} | {sh} | — | — | — | — | — | — |")

    row("coeff assembly", t_asm, asm_cost, t_asm / total)
    row(f"edir scan (SHIPPED: ni={ni} aitken={ait} cleanup={cl})",
        t_edir, edir_cost, t_edir / total)
    row("edir scan (r4 fixed plain-8 A/B)", t_edir8, (0, 0))
    row("sources", t_src, src_cost, t_src / total)
    row(f"ediff BiCGStab cold (niter={int(nit)})", t_ediff_cold, (0, 0), t_ediff_cold / total)
    if t_ediff_pl_cold is not None:
        row(f"ediff BiCGStab cold, FUSED kernel (niter={int(nit_pl)})",
            t_ediff_pl_cold, (0, 0))
    row("absorption", t_abs, abs_cost, t_abs / total)
    row("— diffuse operator apply S(x)", t_op, op_cost)
    if t_op_pl is not None:
        # analytic traffic of the orbit kernel: read 10 flux + norb
        # coeff channels, write 10 flux channels per cell
        norb = coeffs.diff2diff.orb.shape[0]
        gb_pl = (10 * (nlay + 1) * 2 + norb * nlay) * NX * NY * 4 / 1e9
        row("— S(x) via orbit Pallas kernel", t_op_pl, (op_cost[0], gb_pl))
    if t_fused is not None:
        norb = coeffs.diff2diff.orb.shape[0]
        gb_f = (10 * (nlay + 1) * 3 + norb * nlay) * NX * NY * 4 / 1e9
        row("— fused A(u)+dots kernel (incl. per-call prep)", t_fused,
            (op_cost[0], gb_f))
    row("— line solve (r4 fused-scan A/B)", t_pc, pc_cost)
    row("— line PC apply (SHIPPED factored)", t_line, (0, 0))
    row("— line PC factorization (1x/solve)", t_line_bld, (0, 0))
    row("— two-level PC apply (line + coarse)", t_pc2, (0, 0))
    row(f"— two-level PC factorization (1x/solve, cf={cf})", t_pc2_bld, (0, 0))
    print(f"| ediff warm-start rerun | {t_ediff_warm*1e3:.1f} | — | | | | | | |")
    if t_ediff_pl_warm is not None:
        print(f"| ediff warm rerun, FUSED kernel | {t_ediff_pl_warm*1e3:.1f} "
              "| — | | | | | | |")
    print(f"| total (cold, 1 gpt) | {total*1e3:.1f} | 100% | | | | | | |")
    print()
    ideal = 2 * (t_op + t_pc2) * int(nit)
    print(f"# diffuse-solve anatomy: niter={int(nit)}; 2*(S+M^-1)*niter = "
          f"{ideal*1e3:.1f} ms of the {t_ediff_cold*1e3:.1f} ms cold solve; "
          f"the remainder is axpy/dot vector traffic "
          f"(~{max(t_ediff_cold-ideal,0)/max(int(nit),1)*1e3:.2f} ms/iter over "
          f"{state_gb*1e3:.0f} MB state vectors)")
    print(f"# per-iter: XLA {t_ediff_cold/max(int(nit),1)*1e3:.1f} ms"
          + (f"; FUSED {t_ediff_pl_cold/max(int(nit_pl),1)*1e3:.1f} ms"
             if t_ediff_pl_cold is not None else ""))


if __name__ == "__main__":
    main()
