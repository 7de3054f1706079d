"""The pprts solver driver: init / set optical properties / solve / result.

Parity: reference `src/pprts.F90` public API (`init_pprts`:213,
`set_optical_properties`:1764, `set_angles`:1100, `solve_pprts`:2487,
`pprts_get_result`:5799, `destroy_pprts`) and the solution cache with
warm starts (`solutions(-1000:1000)`, `src/pprts.F90:455,2536-2575`).

Structure: a thin stateful Python shell over jitted pure solve functions.
One compiled graph covers coefficient assembly -> direct z-scan ->
source build -> diffuse iteration -> absorption; recompilation happens
only when the static configuration changes (solar/thermal flags, sun
octant, scheme, grid shape) — mirroring how the reference re-permutes
its sweeps per sun octant.

Units: the solve works in [W] per stream dof (face-area scaled power,
reference `scale_flx`, `src/pprts.F90:3682-3945`); results convert to
[W/m2] in `get_result`, including the TOA tilt factor sun.mu
(:5885-5890).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.config import Options
from tenstream_tpu.core.log import GLOBAL_LOG
from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.delta_scale import delta_scale
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.pprts.absorption import calc_flx_div
from tenstream_tpu.pprts.coeffs import assemble_coeffs, determine_1d_layers
from tenstream_tpu.pprts.ediff import solve_bicgstab, solve_richardson
from tenstream_tpu.pprts.edir import solve_edir
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.operators import (
    dir2diff_source,
    direct_surface_reflection,
)
from tenstream_tpu.pprts.sources import thermal_source
from tenstream_tpu.pprts.sun import SunInfo, suninfo_from_sundir
from tenstream_tpu.streams import StreamScheme, get_scheme


def _twostream_guess(scheme, grid, kabs, ksca, g, albedo2d, mu0, incSolar,
                     planck=None, planck_srfc=None):
    """Cold-start initial guess for the diffuse solve from the exact
    two-stream column solution (reference initial-guess-by-twostream
    option, `src/pprts.F90:2536-2575`).

    Top stream dofs carry the per-column Edn/Eup split by hemisphere-bin
    weight; for "zsplit" side groups the (dn, up) halves carry the
    hemisphere flux of the matching vertical stream (measured on a
    converged box-cloud solve: side-stream magnitudes track Edn/Eup to
    ~5%, a 4.6x asymmetry the old isotropic (Edn+Eup)/2 guess missed —
    badly enough that BiCGStab's stall exit fired on the guess's own
    residual); other side styles keep the isotropic estimate.  Returned
    in the solver's internal [W] units.  Cost is one scan over nz.
    """
    from tenstream_tpu.ops.twostream import delta_eddington_twostream

    kext = jnp.maximum(kabs + ksca, jnp.finfo(ireals).tiny)
    dtau = kext * grid.dz3d
    w0 = ksca / kext
    _, Edn, Eup = delta_eddington_twostream(
        dtau, w0, g, mu0, incSolar, albedo2d,
        planck=planck, planck_srfc=planck_srfc,
    )  # (nz+1, nx, ny) [W/m2] in the untilted internal convention
    s = scheme
    inward = s.diff_inward()
    wtop = s.difftop_weights()
    wside = s.diffside_weights()
    nt, ns = s.difftop.dof, s.diffside.dof
    iso = 0.25 * (Edn[:-1] + Eup[:-1] + Edn[1:] + Eup[1:])  # (nz,...)
    dn_lay = 0.5 * (Edn[:-1] + Edn[1:])
    up_lay = 0.5 * (Eup[:-1] + Eup[1:])
    zsplit = s._side_style() == "zsplit"
    zeros_lvl = jnp.zeros((1, grid.nx, grid.ny), ireals)
    rows = []
    for d in range(s.ndiff):
        if d < nt:
            F = Edn if inward[d] else Eup
            rows.append(F * (grid.az * float(wtop[d])))
        else:
            a = grid.dy if d < nt + ns else grid.dx
            j = (d - nt) % ns
            w = float(wside[j])
            area = a * grid.dz3d / s.diffside.area_divider
            if zsplit:
                # [o_dn, i_dn, o_up, i_up]: the first half tracks Eup,
                # the second Edn (solution-pinned, see docstring)
                F = up_lay if j < ns // 2 else dn_lay
            else:
                F = iso
            rows.append(jnp.concatenate([F * area * w, zeros_lvl], axis=0))
    return jnp.stack(rows, axis=0)


class Solution(NamedTuple):
    """Cached per-uid state (reference `t_state_container`,
    `src/pprts_base.F90:137-169`)."""

    edir: Optional[jnp.ndarray]  # [W]
    ediff: jnp.ndarray  # [W]
    abso: jnp.ndarray  # [W/m3]
    diff_omega: jnp.ndarray
    niter_diff: jnp.ndarray
    # final diffuse-solve residual norm (reference residual history,
    # `src/pprts_base.F90:163-164`); 0.0 for the 1-D column solvers
    diff_res: Any = 0.0
    # the convergence tolerance max(rtol*||b||, atol) the residual was
    # checked against — lets callers detect a stalled/accepted-incomplete
    # solve (diff_res >> diff_tol) without rebuilding b
    diff_tol: Any = 0.0
    # for a combined solar+thermal request, the thermal sub-solution:
    # the reference REFUSES mixed solves in one call
    # (`src/pprts.F90:2523-2534`) because the x sun-mu tilt rescale of
    # `pprts_get_result` (:5885-5890) only applies to solar radiation.
    # We split the request into two sub-solves instead and recombine
    # with correct per-kind scaling in `get_result`.
    thermal: Optional["Solution"] = None


def _validate_optprops(kabs, ksca, g, planck) -> None:
    """Host-side input sanity (reference `src/pprts.F90:1831-1859`)."""
    fields = {"kabs": kabs, "ksca": ksca, "g": g}
    if planck is not None:
        fields["planck"] = planck
    for name, x in fields.items():
        if isinstance(x, jax.core.Tracer):
            return  # inside jit: concrete checks impossible
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-host sharded input: this process only holds its own
            # shards; validate those
            x = np.concatenate([np.asarray(s.data).ravel()
                                for s in x.addressable_shards])
        a = np.asarray(x)
        if not np.isfinite(a).all():
            raise ValueError(f"non-finite values in {name}")
        if name != "g" and a.min() < 0.0:
            raise ValueError(f"negative values in {name} (min {a.min():.3e})")
        if name == "g" and (a.min() < -1.0 or a.max() > 1.0):
            raise ValueError(f"asymmetry parameter g outside [-1,1]")


class PprtsSolver:
    """Solver driver.

    `solver_type` selects the solver class like the reference's
    `-solver` option (`allocate_pprts_solver_from_commandline`,
    `src/pprts_base.F90:585`): a stream scheme name ("3_10", ...) runs
    the 3-D solver; "2str" runs batched delta-Eddington two-stream
    columns (+ Schwarzschild for thermal when `-schwarzschild` is set),
    needing no LUT.
    """

    def __init__(
        self,
        grid: Grid,
        optprop: Optional[OptProp] = None,
        options: Optional[Options] = None,
        solver_type: Optional[str] = None,
    ):
        self.grid = grid
        self.opp = optprop
        self.solver_type = solver_type or (optprop.scheme.name if optprop else "2str")
        if optprop is not None:
            self.scheme: StreamScheme = optprop.scheme
        else:
            self.scheme = get_scheme("2str")
            if self.solver_type not in ("2str", "disort", "schwarzschild"):
                raise ValueError(f"solver_type {self.solver_type!r} needs an OptProp/LUT")
        self.options = options or Options()
        # reference DEBUG builds trap NaNs/bounds (`CLAUDE.md:34`); the
        # jax equivalent is the global debug_nans switch
        if self.options.get_bool("debug_nans", False):
            import jax as _jax

            _jax.config.update("jax_debug_nans", True)
        self.sun: Optional[SunInfo] = None
        self.solutions: Dict[int, Solution] = {}
        # uid -> (niter, res, tol) device arrays awaiting the deferred
        # convergence check (see `check_convergence`)
        self._pending_convergence: Dict[Any, Tuple] = {}
        self._atm: Dict[str, Any] = {}
        self._solve_cache: Dict[Tuple, Any] = {}
        twostr_ratio = self.options.get_float("twostr_ratio", 2.0)
        self._l1d = np.asarray(determine_1d_layers(grid.dz3d, grid.dx, twostr_ratio))
        self._buildings = None

    # ------------------------------------------------------------------
    def set_angles(self, sundir) -> None:
        self.sun = suninfo_from_sundir(sundir)
        self._sundir_raw = jnp.asarray(sundir, ireals)

    def set_mesh(self, mesh) -> None:
        """Attach an ('x', 'y') device mesh: the direct solve switches to
        the shard_map path (local block scans + one gathered carry
        closure per in-layer recurrence) instead of GSPMD associative
        scans along sharded axes.  The diffuse operator's jnp.roll
        stencils stay GSPMD (they already lower to halo permutes)."""
        self._mesh = mesh
        self._solve_cache.clear()

    def set_terrain(self, h_srfc) -> None:
        """Surface height field (Nx, Ny) [m] for terrain-following
        grids.  With `-pprts_geometric_coeffs`, the direct transfer
        blocks are computed analytically on the tilted cells
        (reference `-pprts_geometric_coeffs`, `src/pprts.F90:3037`)."""
        self._h_srfc = jnp.asarray(h_srfc, ireals)
        self._solve_cache.clear()

    def set_buildings(self, buildings) -> None:
        """Attach a `tenstream_tpu.pprts.buildings.Buildings` instance
        (reference `init_buildings`, `src/buildings.F90:87`)."""
        self._buildings = buildings
        self._solve_cache.clear()

    def set_optical_properties(
        self,
        albedo: float,
        kabs,
        ksca,
        g,
        planck=None,
        planck_srfc=None,
        albedo_2d=None,
        ldelta_scaling: bool = True,
    ) -> None:
        """Store (optionally delta-scaled) optical properties.

        kabs/ksca/g: (Nz, Nx, Ny); planck: (Nz+1, Nx, Ny) [W/m2/sr].
        """
        kabs = jnp.asarray(kabs, ireals)
        ksca = jnp.asarray(ksca, ireals)
        g = jnp.asarray(g, ireals)
        if self.options.get_bool("pprts_validate", True):
            # reference ldebug input checks (`src/pprts.F90:1831-1859`):
            # negative/NaN optical properties abort before they can
            # poison a whole spectral integration.  Skipped for traced
            # (in-jit) inputs — concrete host inputs are the API norm.
            _validate_optprops(kabs, ksca, g, planck)
        if self.options.get_bool("pprts_delta_scale", ldelta_scaling):
            kabs, ksca, g = delta_scale(kabs, ksca, g)
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            a2d = jnp.full((self.grid.nx, self.grid.ny), albedo, ireals)
        else:
            # multi-host SPMD: scalar-albedo field created collectively
            # on the mesh so it can mix with global inputs in one jit
            from jax.sharding import NamedSharding

            from tenstream_tpu.parallel.mesh import field_spec

            a2d = jnp.full(
                (self.grid.nx, self.grid.ny), albedo, ireals,
                device=NamedSharding(mesh, field_spec(0)),
            )
        if albedo_2d is not None:
            a2d = jnp.asarray(albedo_2d, ireals)
        self._atm = dict(
            kabs=kabs,
            ksca=ksca,
            g=g,
            albedo2d=a2d,
            planck=None if planck is None else jnp.asarray(planck, ireals),
            planck_srfc=None if planck_srfc is None else jnp.asarray(planck_srfc, ireals),
        )
        twostr_ratio = self.options.get_float("twostr_ratio", 2.0)
        self._l1d = np.asarray(determine_1d_layers(self.grid.dz3d, self.grid.dx, twostr_ratio))

    # ------------------------------------------------------------------
    def _solve_fn(self, lthermal: bool, lsolar: bool, has_planck_srfc: bool,
                  use_x0: bool = True):
        key = (
            lthermal,
            lsolar,
            has_planck_srfc,
            use_x0,
            self.sun.xinc if self.sun else -1,
            self.sun.yinc if self.sun else -1,
            self.scheme.name,
            tuple(np.asarray(self._l1d).tolist()),
            self.options.get("diff_solver", "bicgstab"),
            self.options.get("diff_precond", "two_level"),
            self.options.get_bool("diff_guess_2str", False),
            self.options.get_int("pprts_assembly_z_slab", -1),
            self._buildings is not None,
            self._buildings is not None
            and (self._buildings.planck is not None
                 or (lthermal and self._buildings.temp is not None)),
            self.options.get_int("atm_collapse", 0),
            self.options.get_bool("pprts_orbit_coeffs", True),
            id(getattr(self, "_mesh", None)),
        )
        if key in self._solve_cache:
            return self._solve_cache[key]

        scheme = self.scheme
        opp = self.opp
        grid = self.grid
        sun = self.sun
        mesh = getattr(self, "_mesh", None)
        # host array on purpose: assemble_coeffs statically restricts the
        # LUT gathers to the 3-D layers when l1d is known at trace time
        l1d = np.asarray(self._l1d, bool)
        # default: BiCGStab with the vertical-line preconditioner (the
        # analogue of the reference's FBCGS+ILU default); "richardson"
        # selects the adaptive-omega explicit iteration (parity with the
        # reference's explicit SOR path).
        diff_solver = self.options.get("diff_solver", "bicgstab")
        # two-level (vertical line + spectral coarse) by default; "line"
        # restores the round-1..3 vertical-line-only PC, "none" disables
        precond = self.options.get("diff_precond", "two_level")
        max_iter = self.options.get_int("ksp_max_it", 3000)
        rtol = self.options.get_float("ksp_rtol", 1e-5)
        atol = self.options.get_float("ksp_atol", 1e-8)
        # x<->y side-stream coupling relaxation depth (each pass is two
        # cyclic scans).  Default 0 = auto: theta-tiered pass count with
        # Aitken extrapolation (`edir.inner_iter_policy`; beats the old
        # fixed plain 8 passes in accuracy at every measured angle, at
        # 3-7 passes).  A positive value pins a plain fixed-pass count;
        # `edir_aitken` toggles extrapolation for pinned counts.
        n_inner = self.options.get_int("edir_inner_iter", 0)
        if n_inner <= 0:
            from tenstream_tpu.pprts.edir import inner_iter_policy

            theta = float(sun.theta) if sun is not None else 0.0
            n_inner, edir_aitken, edir_cleanup = inner_iter_policy(theta)
        else:
            edir_aitken = self.options.get_bool("edir_aitken", False)
            edir_cleanup = self.options.get_bool("edir_cleanup", True)
        # OPT-IN cold-solve initial guess from the exact two-stream
        # column solution (reference initial-guess-by-twostream option,
        # `src/pprts.F90:2536-2575`).  Measured trade-off on cold box-
        # cloud solves: the final residual improves ~50x (5.2 vs 258 in
        # [W] at identical fluxes) but BiCGStab needs ~20% MORE
        # iterations — the smoother r0 seeds a worse Krylov sequence —
        # so the default stays off for wall-clock; enable for tighter
        # converged cold solves.  Warm starts always take precedence.
        guess_2str = self.options.get_bool("diff_guess_2str", False)

        buildings = self._buildings
        # static emission switch: the per-band Planck value itself is a
        # traced input (`planck_bldg`) so specint can vary it per g-point
        # without retracing (reference sets `spec_buildings%planck` per
        # band, `ecckd/ecckd_pprts.F90:404-412`)
        bldg_emit = buildings is not None and (
            buildings.planck is not None
            or (lthermal and buildings.temp is not None)
        )

        # atmosphere collapse: fold the top K (1-D) layers into ONE
        # effective layer via the adding method before the solve
        # (reference `-atm_collapse` / `handle_atm_collapse`,
        # `src/pprts.F90:685-705,2080-2198`).  Inputs stay on the full
        # atm grid; state (x0) and outputs live on the REDUCED grid
        # (nz_solve layers) — same as the reference, whose solver DMDA
        # is the collapsed grid.
        K = self.options.get_int("atm_collapse", 0)
        if K > 1:
            if not bool(np.asarray(l1d[:K]).all()):
                raise ValueError(
                    f"atm_collapse={K}: the collapsed region must be 1-D "
                    "layers (reference forces l1d there, src/pprts.F90:703)"
                )
            if buildings is not None:
                raise ValueError("atm_collapse cannot combine with buildings")
            if guess_2str:
                raise ValueError("atm_collapse cannot combine with diff_guess_2str")
            l1d = np.concatenate([[True], l1d[K:]])
        # bf16 coefficient compression halves the HBM traffic of the
        # diffuse iteration, but near-conservative transmissions
        # (a11 = 1 - eps, optically thin layers) lose eps to the 8-bit
        # mantissa and the error COMPOUNDS multiplicatively over deep
        # 1-D layer stacks (measured: 42% OLR error on the reference
        # regression scene with ~40 thin background layers).  Off by
        # default; thermal emission is computed from f32 coefficients
        # either way.
        compress_coeffs = self.options.get_bool("pprts_coeff_bf16", False)
        use_geometric = self.options.get_bool("pprts_geometric_coeffs", False)
        # z-slab-chunked LUT assembly: bound the corner-gather temps on
        # large grids (see coeffs._zslab_map).  Auto: slabs of <=~1M
        # cells once the grid exceeds 4M cells; -pprts_assembly_z_slab
        # overrides (0 = force one batched call).
        # slab size from the 3-D layer count (the LUT lookups only run on
        # non-l1d layers), rounded so the slabs tile nz3 as evenly as
        # possible — a ragged tail slab costs a second compiled lookup
        # instance, a PADDED slab costs duplicated coefficient buffers
        nz3 = int((~l1d).sum())
        ncells = nz3 * grid.nx * grid.ny
        auto_slab = 0
        if ncells > 4_000_000:
            n_steps = max(1, -(-ncells // 1_000_000))
            auto_slab = max(1, -(-nz3 // n_steps))
        z_slab = self.options.get_int("pprts_assembly_z_slab", auto_slab)
        # orbit-channel diff2diff storage (operators.OrbitCoeff): 4.2x
        # smaller assembled field and per-iteration operator reads.
        # Buildings mask individual per-cell entries (breaks the orbit
        # symmetry), so they force the dense form.
        orbit_coeffs = (
            self.options.get_bool("pprts_orbit_coeffs", True)
            and buildings is None
            and getattr(opp, "_solver_orbit_idx", None) is not None
        )
        # Pallas diffuse operator (pprts/pallas_ops.py).  The round-3
        # orbit-channel CONTRACTION kernel measures 5.5 vs 8.5 ms per
        # STANDALONE apply at 256^2x113 on v5e (bit-exact), but IN
        # CONTEXT — vmapped band dim + inside the BiCGStab while-loop —
        # the full 256^2 cold solve ran 5x SLOWER (1842 s vs 376 s;
        # 64^2 was neutral): the pallas_call boundary breaks XLA's
        # fusion of the operator into the surrounding Krylov vector ops
        # and pays per-grid-step overhead x232 tiles.  OFF by default;
        # kept as an option (BENCH_PALLAS=1) for future Mosaic tuning.
        use_pallas_diff = self.options.get_bool("pprts_pallas_diffuse", False)

        @jax.jit
        def run(kabs, ksca, g, albedo2d, planck, planck_srfc, edirTOA, x0,
                omega0, planck_bldg):
            if not use_x0:
                # cold solve: the zero initial guess is created INSIDE
                # the program (the x0 argument is a dummy) — a real x0
                # input buffer is 0.6 GB at BASELINE scale, band_chunk=2
                x0 = jnp.zeros(
                    (scheme.ndiff, grid.nz - (K - 1 if K > 1 else 0) + 1,
                     grid.nx, grid.ny), ireals,
                )
            # broadcastable (Nz, 1, 1) layer thickness when dz is 1-D:
            # keeps aspect = dz/dx PER-LAYER through the collapse math so
            # the LUT lookup can take the one-hot MXU path (see
            # `OptProp._interp`); all ops below are broadcast-safe, and
            # consumers that need the full field get dz_full
            dz3d = (grid.dz[:, None, None] if grid.dz.ndim == 1
                    else grid.dz3d)
            collapse_btop = collapse_bbot = None
            if K > 1:
                from tenstream_tpu.ops.eddington import eddington_coeff_ec
                from tenstream_tpu.pprts.coeffs import (
                    fold_eddington_adding,
                    onedee_blocks_collapsed,
                )

                mu_c = (sun.mu if (lsolar and sun is not None and sun.sun_up)
                        else jnp.asarray(1.0, ireals))
                kext_s = kabs[:K] + ksca[:K]
                tz_s = kext_s * dz3d[:K]
                w0_s = ksca[:K] / jnp.maximum(kext_s, jnp.finfo(ireals).tiny)
                folded = fold_eddington_adding(
                    *eddington_coeff_ec(tz_s, w0_s, g[:K], mu_c)
                )
                if lthermal:
                    # effective super-layer emission: per-layer B_eff
                    # emission rows folded through the exact interface
                    # recursion — block-model exact INCLUDING in-stack
                    # scattering (the reference approximates with a
                    # no-scattering schwarzschild integral,
                    # `src/pprts.F90:2192-2197`)
                    from tenstream_tpu.ops.planck import b_eff
                    from tenstream_tpu.pprts.coeffs import (
                        fold_thermal_emission,
                    )

                    a11_s, a12_s, _, _, _ = eddington_coeff_ec(
                        tz_s, w0_s, g[:K], mu_c
                    )
                    tau_abs = kabs[:K] * dz3d[:K]
                    emis_s = jnp.clip(1.0 - a11_s - a12_s, 0.0, 1.0)
                    bt = b_eff(planck[1:K + 1], planck[:K], tau_abs) * emis_s
                    bb = b_eff(planck[:K], planck[1:K + 1], tau_abs) * emis_s
                    collapse_btop, collapse_bbot = fold_thermal_emission(
                        a11_s, a12_s, bt, bb
                    )

                # reduced fields: super-layer preserves total optical
                # depth; its blocks are overwritten with the folded set
                dz0 = dz3d[:K].sum(0, keepdims=True)
                cat = lambda top, rest: jnp.concatenate([top, rest], axis=0)
                kabs_r = cat((kabs[:K] * dz3d[:K]).sum(0, keepdims=True) / dz0, kabs[K:])
                ksca_r = cat((ksca[:K] * dz3d[:K]).sum(0, keepdims=True) / dz0, ksca[K:])
                g_r = cat(g[:1], g[K:])
                kabs, ksca, g = kabs_r, ksca_r, g_r
                dz3d = cat(dz0, dz3d[K:])
                planck = jnp.concatenate([planck[:1], planck[K:]], axis=0)

            coeffs, (a11, a12, a13, a23, a33) = assemble_coeffs(
                scheme, opp, kabs, ksca, g, dz3d, grid.dx, l1d,
                sun, need_dir=lsolar, z_slab=z_slab, orbit=orbit_coeffs,
            )
            if K > 1:
                # overwrite the super-layer's analytic blocks with the
                # adding-folded (asymmetric) set; NB the reference reuses
                # symmetric a11/a12 for both directions (TODO at
                # `src/pprts.F90:5721,5729`) — here up/down use Tbot/Ttop
                # and Rbot/Rtop correctly
                dd0, df0, ff0 = onedee_blocks_collapsed(scheme, folded)
                from tenstream_tpu.pprts.coeffs import CoeffFields as _CFc

                ff_n = (coeffs.diff2diff.set_layer0(ff0) if orbit_coeffs
                        else coeffs.diff2diff.at[:, :, 0].set(ff0))
                dd_n = df_n = None
                if coeffs.dir2dir is not None:
                    dd_n = coeffs.dir2dir.at[:, :, 0].set(dd0)
                if coeffs.dir2diff is not None:
                    df_n = coeffs.dir2diff.at[:, :, 0].set(df0)
                coeffs = _CFc(dd_n, df_n, ff_n)
            if (
                use_geometric and lsolar and sun is not None and sun.sun_up
                and coeffs.dir2dir is not None and scheme.dirtop.dof == 1
            ):
                # terrain-tilted analytic direct transport replaces the
                # cuboid LUT dir2dir (reference -pprts_geometric_coeffs)
                from tenstream_tpu.pprts.geometric import (
                    dir2dir_geometric,
                    zlev_from_dz,
                )

                zlev = zlev_from_dz(grid.dz3d, getattr(self, "_h_srfc", None))
                dd_geo = dir2dir_geometric(
                    zlev, grid.dx, grid.dy, self._sundir_raw, kabs + ksca,
                )
                mask = jnp.asarray(l1d, bool)[None, None, :, None, None]
                from tenstream_tpu.pprts.coeffs import CoeffFields as _CFg

                dd1_diag = jnp.where(mask, coeffs.dir2dir, dd_geo)
                coeffs = _CFg(dd1_diag, coeffs.dir2diff, coeffs.diff2diff)
            if buildings is not None:
                from tenstream_tpu.pprts.buildings import mask_coeffs

                coeffs = mask_coeffs(coeffs, buildings)

            # keep the f32 blocks for source/emissivity computation even
            # when the iteration coefficients are compressed (see the
            # compress_coeffs note above)
            diff2diff_f32 = coeffs.diff2diff
            if compress_coeffs:
                from tenstream_tpu.pprts.coeffs import CoeffFields as _CF

                coeffs = _CF(coeffs.dir2dir, coeffs.dir2diff,
                             coeffs.diff2diff.astype(jnp.bfloat16))

            edir = None
            nz_r = dz3d.shape[0]
            dz_full = jnp.broadcast_to(dz3d, (nz_r, grid.nx, grid.ny))
            b = jnp.zeros(
                (scheme.ndiff, nz_r + 1, grid.nx, grid.ny), ireals
            )
            if lsolar and sun is not None and sun.sun_up:
                fac = edirTOA * grid.az / scheme.dirtop.area_divider
                inc = jnp.full((scheme.dirtop.dof, grid.nx, grid.ny), 1.0, ireals) * fac
                if mesh is not None:
                    from tenstream_tpu.pprts.edir import solve_edir_sharded

                    edir = solve_edir_sharded(
                        scheme, coeffs.dir2dir, inc, sun.xinc, sun.yinc,
                        mesh, n_inner=n_inner, aitken=edir_aitken,
                        cleanup=edir_cleanup,
                    )
                else:
                    edir = solve_edir(
                        scheme, coeffs.dir2dir, inc, sun.xinc, sun.yinc,
                        n_inner=n_inner, aitken=edir_aitken,
                        cleanup=edir_cleanup,
                    )
                b = b + dir2diff_source(scheme, coeffs.dir2diff, edir, sun.xinc, sun.yinc)
                b = b + direct_surface_reflection(scheme, edir, albedo2d)

            # direct coefficient divergence for absorption, REDUCED here
            # so the (ndir x ndir) and (ndir x ndiff) fields go dead
            # before the diffuse while-loop (see calc_flx_div docstring)
            cdiv_dir = None
            if edir is not None and coeffs.dir2dir is not None:
                cdiv_dir = jnp.clip(
                    1.0
                    - coeffs.dir2dir.astype(ireals).sum(axis=1)
                    - coeffs.dir2diff.astype(ireals).sum(axis=1),
                    0.0,
                    1.0,
                )

            if buildings is not None:
                from tenstream_tpu.pprts.buildings import building_sources

                b = b + building_sources(
                    scheme, buildings, edir, grid.az,
                    dz3d=grid.dz3d, dx=grid.dx, dy=grid.dy,
                    xinc=sun.xinc if (sun is not None and lsolar) else 1,
                    yinc=sun.yinc if (sun is not None and lsolar) else 1,
                    planck=planck_bldg if bldg_emit else None,
                )

            b_th = None
            if lthermal and planck is not None:
                b_th = thermal_source(
                    scheme, diff2diff_f32, planck, kabs, dz_full,
                    grid.dx, grid.dy, albedo2d, l1d,
                    planck_srfc=planck_srfc if has_planck_srfc else None,
                    collapse_btop=collapse_btop, collapse_bbot=collapse_bbot,
                )
                b = b + b_th

            if guess_2str:
                if lsolar and sun is not None and sun.sun_up:
                    mu0g, incg = sun.mu, edirTOA
                else:
                    mu0g, incg = jnp.asarray(0.5, ireals), jnp.asarray(0.0, ireals)
                guess = _twostream_guess(
                    scheme, grid, kabs, ksca, g, albedo2d, mu0g, incg,
                    planck=planck if lthermal else None,
                    planck_srfc=planck_srfc if (lthermal and has_planck_srfc) else None,
                )
                cold = jnp.max(jnp.abs(x0)) == 0.0
                x0 = jnp.where(cold, guess, x0)

            tol = jnp.maximum(rtol * jnp.linalg.norm(b.ravel()), atol)
            if diff_solver == "bicgstab":
                ediff, niter, res = solve_bicgstab(
                    scheme, coeffs.diff2diff, b, albedo2d, x0=x0,
                    rtol=rtol, atol=atol, maxiter=max_iter, precond=precond,
                    use_pallas=use_pallas_diff,
                )
                omega = omega0
                # Convergence-guaranteed polish: BiCGStab's stall exit
                # can surrender on thick-conservative-cloud systems
                # (measured: res/tol ~ 2e4 on a Rayleigh band with an
                # embedded conservative cloud) while adaptive-omega
                # Richardson always contracts here.  The polish loop
                # exits after ONE residual check when BiCGStab already
                # converged, so the fast path pays a single operator
                # apply; under vmap only the stalled lane iterates.
                ediff, niter_p, omega, res_p = solve_richardson(
                    scheme, coeffs.diff2diff, b, albedo2d, x0=ediff,
                    omega0=omega0, rtol=rtol, atol=atol, max_iter=max_iter,
                    precond=precond, use_pallas=use_pallas_diff, tol=tol,
                )
                niter = niter + niter_p
                res = jnp.minimum(res, res_p)
            else:
                ediff, niter, omega, res = solve_richardson(
                    scheme, coeffs.diff2diff, b, albedo2d, x0=x0,
                    omega0=omega0, rtol=rtol, atol=atol, max_iter=max_iter,
                    precond=precond, use_pallas=use_pallas_diff,
                )

            abso = calc_flx_div(
                scheme, coeffs, ediff,
                dz_full * (grid.dx * grid.dy) if K > 1 else grid.volumes(),
                l1d, kabs, dz_full,
                a11, a12, sun=sun, edir=edir, b_thermal=b_th,
                cdiv_dir=cdiv_dir,
            )
            return edir, ediff, abso, niter, omega, res, tol

        self._solve_cache[key] = run
        return run

    def solve(
        self,
        lthermal: bool,
        lsolar: bool,
        edirTOA: float = 0.0,
        uid: int = 0,
    ) -> Solution:
        """Run one (monochromatic / single-band) solve.

        Reference `solve_pprts` (`src/pprts.F90:2487`); uid keys the
        solution cache for warm starts across bands/timesteps.
        """
        if not self._atm:
            raise RuntimeError("call set_optical_properties first")
        if lsolar and self.sun is None:
            raise RuntimeError("call set_angles before a solar solve")

        if self.solver_type in ("2str", "schwarzschild", "disort"):
            return self._solve_1d(lthermal, lsolar, edirTOA, uid)

        lsolar_eff = bool(lsolar and self.sun is not None and self.sun.sun_up)
        lthermal_eff = bool(lthermal and self._atm.get("planck") is not None)
        if lsolar_eff and lthermal_eff:
            # mixed request: two sub-solves (see Solution.thermal note)
            sol_s = self._solve_mono(False, True, edirTOA, (uid, "solar"))
            sol_t = self._solve_mono(True, False, 0.0, (uid, "thermal"))
            sol = sol_s._replace(thermal=sol_t)
            self.solutions[uid] = sol
            return sol
        return self._solve_mono(lthermal, lsolar, edirTOA, uid)

    @property
    def nz_solve(self) -> int:
        """Vertical layers of the SOLVE grid: grid.nz, reduced by
        atm_collapse (the reference's solver DMDA is the collapsed grid;
        results and warm-start states live on this grid)."""
        K = self.options.get_int("atm_collapse", 0)
        return self.grid.nz - (K - 1 if K > 1 else 0)

    def _mesh_zeros(self, shape) -> jnp.ndarray:
        """Zeros with trailing (Nx, Ny) dims, sharded onto the attached
        mesh when one is set — required in multi-host SPMD, where an
        unsharded process-local array cannot mix with global arrays in
        one jitted call."""
        mesh = getattr(self, "_mesh", None)
        if mesh is None:
            return jnp.zeros(shape, ireals)
        from jax.sharding import NamedSharding

        from tenstream_tpu.parallel.mesh import field_spec

        sh = NamedSharding(mesh, field_spec(len(shape) - 2))
        return jnp.zeros(shape, ireals, device=sh)

    def _solve_mono(self, lthermal, lsolar, edirTOA, uid):
        atm = self._atm
        prev = self.solutions.get(uid)
        use_x0 = prev is not None
        # cold start: the zero guess is created inside the jitted
        # program; the x0 slot gets an uncommitted dummy (numpy, so it
        # is also multi-host-safe as an implicitly replicated input)
        x0 = (prev.ediff.astype(ireals) if use_x0
              else np.zeros((1, 1, 1, 1), np.float32))
        omega0 = prev.diff_omega if prev is not None else jnp.asarray(1.0, ireals)

        bld = self._buildings
        planck_bldg = (
            jnp.asarray(bld.planck, ireals)
            if bld is not None and bld.planck is not None
            else self._mesh_zeros((self.grid.nz, self.grid.nx, self.grid.ny))
        )
        fn = self._solve_fn(lthermal and atm["planck"] is not None, lsolar,
                            atm["planck_srfc"] is not None, use_x0=use_x0)
        with GLOBAL_LOG.scope("solve_pprts"):
            edir, ediff, abso, niter, omega, res, tol = fn(
                atm["kabs"], atm["ksca"], atm["g"], atm["albedo2d"],
                atm["planck"] if atm["planck"] is not None else self._mesh_zeros((self.grid.nz + 1, self.grid.nx, self.grid.ny)),
                atm["planck_srfc"] if atm["planck_srfc"] is not None else self._mesh_zeros((self.grid.nx, self.grid.ny)),
                jnp.asarray(edirTOA, ireals), x0, omega0, planck_bldg,
            )
        sol = Solution(edir, ediff, abso, omega, niter, res, diff_tol=tol)

        # Reference `-accept_incomplete_solve` (`src/pprts_explicit.F90:
        # 134-136`): by default it ABORTS when the iteration hits max_it
        # without converging.  We match that default — but DEFERRED: the
        # convergence metadata stays device-side here (an immediate host
        # check would force a device sync per solve and serialize the
        # async band pipeline) and is checked at the next natural sync
        # point — `get_result` for mono solves, end-of-call for
        # `specint_pprts` (one sync per spectral call, not per band).
        # Set accept_incomplete_solve=True to tolerate stalled iterates.
        self._pending_convergence[uid] = (niter, res, tol)
        self.solutions[uid] = self._maybe_compress(sol)
        return sol

    def check_convergence(self, uid=None) -> None:
        """Host-side convergence check of pending solve(s) (reference
        abort-on-incomplete default, `src/pprts_explicit.F90:134-136`).

        Called from `get_result` (mono path) and the end of
        `specint_pprts`; a no-op when `accept_incomplete_solve=True`.
        Raises with the uid/band identity of every failed solve.
        """
        if self.options.get_bool("accept_incomplete_solve", False):
            return
        max_it = self.options.get_int("ksp_max_it", 3000)
        keys = list(self._pending_convergence) if uid is None else (
            [uid] if uid in self._pending_convergence else []
        )
        if not keys:
            return
        # ONE batched device->host fetch: per-buffer np.asarray costs a
        # full network round-trip each on tunneled chips (~30 ms x
        # 3 metrics x N chunks measured as +0.5 s per spectral call);
        # concatenating device-side first makes it 3 small transfers
        pend = [self._pending_convergence.pop(k) for k in keys]
        cat = lambda i: np.asarray(jnp.concatenate(
            [jnp.atleast_1d(jnp.max(p[i])).ravel().astype(jnp.float32) for p in pend]))
        niter_a, res_a, tol_a = cat(0), cat(1), cat(2)
        failed = []
        for j, k in enumerate(keys):
            niter_h = int(niter_a[j])
            res_h = float(res_a[j])
            tol_h = float(tol_a[j])
            # the residual is the failure signal: niter alone can reach
            # max_it legitimately (BiCGStab + polish counts are summed)
            # while a stalled solve always leaves res >> tol.  Margin:
            # the recorded res is the recurrence residual at the stop
            # test; the TRUE residual of an f32 BiCGStab iterate can sit
            # slightly above it (recurrence drift, O(sqrt(N)*eps*|b|) ~
            # 0.1%*|b| at 7.3M unknowns), so we allow 1.5x — far below
            # any stall (which leaves res >> 10x tol) yet tight enough
            # that a 5x regression trips the gate (round-3 verdict
            # weak #5; reference aborts at tol,
            # src/pprts_explicit.F90:134-136).
            if res_h > 1.5 * tol_h or not np.isfinite(res_h):
                failed.append((k, niter_h, res_h, tol_h))
        if failed:
            detail = "; ".join(
                f"uid={k!r}: niter={n}/max_it={max_it}, residual {r:.3e} "
                f"vs tol {t:.3e}" for (k, n, r, t) in failed
            )
            raise RuntimeError(
                "diffuse solve did not converge (" + detail + ") — a "
                "stalled iterate was accepted by the solver's stall exit; "
                "set accept_incomplete_solve=True to tolerate (reference "
                "-accept_incomplete_solve semantics)"
            )

    def _maybe_compress(self, sol: Solution) -> Solution:
        """bf16-compress cached solutions (reference `compress_solution`,
        `src/pprts_base.F90:425-462`, option `-pprts_compress_solutions`);
        warm starts decompress implicitly on use."""
        if not self.options.get_bool("pprts_compress_solutions", False):
            return sol
        cast = lambda a: None if a is None else a.astype(jnp.bfloat16)
        return sol._replace(edir=cast(sol.edir), ediff=cast(sol.ediff), abso=cast(sol.abso))

    # ------------------------------------------------------------------
    def _solve_1d(self, lthermal, lsolar, edirTOA, uid):
        """Column-solver dispatch (reference `src/pprts.F90:2606-2652`
        via `src/pprts_1D_solvers.F90`)."""
        from tenstream_tpu.pprts.oned import (
            solve_schwarzschild_columns,
            solve_twostream_columns,
        )

        atm = self._atm
        g = self.grid
        zero_lvl = jnp.zeros((g.nz + 1, g.nx, g.ny), ireals)
        S = edn = eup = None
        abso = jnp.zeros((g.nz, g.nx, g.ny), ireals)
        use_schwarz = self.options.get_bool("schwarzschild", self.solver_type == "schwarzschild")

        if self.solver_type == "disort":
            return self._solve_disort(lthermal, lsolar, edirTOA, uid)

        if lsolar and self.sun is not None and self.sun.sun_up:
            S, edn_s, eup_s, abso_s = solve_twostream_columns(
                atm["kabs"], atm["ksca"], atm["g"], g.dz3d, self.sun.mu,
                jnp.asarray(edirTOA, ireals), atm["albedo2d"],
            )
            # tilted -> horizontal units here, so thermal contributions
            # (absolute units) can be mixed in the same solve
            mu = jnp.asarray(self.sun.mu, ireals)
            S = S * mu
            edn = edn_s * mu
            eup = eup_s * mu
            abso = abso + abso_s * mu
        if lthermal and atm["planck"] is not None:
            if use_schwarz:
                edn_t, eup_t, abso_t = solve_schwarzschild_columns(
                    atm["kabs"], g.dz3d, atm["albedo2d"], atm["planck"],
                    planck_srfc=atm["planck_srfc"],
                )
            else:
                _, edn_t, eup_t, abso_t = solve_twostream_columns(
                    atm["kabs"], atm["ksca"], atm["g"], g.dz3d, -1.0,
                    0.0, atm["albedo2d"], planck=atm["planck"],
                    planck_srfc=atm["planck_srfc"],
                )
            edn = edn_t if edn is None else edn + edn_t
            eup = eup_t if eup is None else eup + eup_t
            abso = abso + abso_t

        if edn is None:
            edn = zero_lvl
            eup = zero_lvl
        self._oned_results = getattr(self, "_oned_results", {})
        # results already in horizontal [W/m2]; no rescale at get_result
        self._oned_results[uid] = (S, edn, eup, abso, False)
        sol = Solution(S, edn, abso, jnp.asarray(1.0, ireals), jnp.asarray(0))
        self.solutions[uid] = sol
        return sol

    def _solve_disort(self, lthermal, lsolar, edirTOA, uid):
        """Multi-stream 1-D reference solve (reference `t_solver_disort`
        dispatch, `src/pprts.F90:2606-2652`; see `ops/disort.py`)."""
        from tenstream_tpu.ops.disort import disort_fluxes

        atm = self._atm
        g = self.grid
        kext = atm["kabs"] + atm["ksca"]
        dtau = kext * g.dz3d
        w0 = atm["ksca"] / jnp.maximum(kext, jnp.finfo(ireals).tiny)
        nstr = self.options.get_int("disort_streams", 8)

        zero_lvl = jnp.zeros((g.nz + 1, g.nx, g.ny), ireals)
        S = None
        edn = jnp.zeros_like(zero_lvl)
        eup = jnp.zeros_like(zero_lvl)
        if lsolar and self.sun is not None and self.sun.sun_up:
            mu = jnp.asarray(self.sun.mu, ireals)
            S_t, edn_s, eup_s = disort_fluxes(
                dtau, w0, atm["g"], mu, jnp.asarray(edirTOA, ireals),
                atm["albedo2d"], nstreams=nstr,
            )
            # S is in tilted-plane units; the diffuse fluxes are already
            # horizontal [W/m2] (validated against MC in tests)
            S = S_t * mu
            edn = edn + edn_s
            eup = eup + eup_s
        if lthermal and atm["planck"] is not None:
            _, edn_t, eup_t = disort_fluxes(
                dtau, w0, atm["g"], None, 0.0, atm["albedo2d"],
                planck=atm["planck"], planck_srfc=atm["planck_srfc"],
                nstreams=nstr,
            )
            edn = edn + edn_t
            eup = eup + eup_t

        net = (edn - eup) + (S if S is not None else 0.0)
        abso = (net[:-1] - net[1:]) / g.dz3d
        self._oned_results = getattr(self, "_oned_results", {})
        self._oned_results[uid] = (S, edn, eup, abso, False)
        sol = Solution(S, edn, abso, jnp.asarray(1.0, ireals), jnp.asarray(0))
        self.solutions[uid] = sol
        return sol

    def _dz_solve(self) -> jnp.ndarray:
        """dz3d on the SOLVE grid (atm_collapse folds the top K layers
        into one)."""
        K = self.options.get_int("atm_collapse", 0)
        dz3 = self.grid.dz3d
        if K > 1:
            dz3 = jnp.concatenate([dz3[:K].sum(0, keepdims=True), dz3[K:]], axis=0)
        return dz3

    def _dir_scale_to_wm2(self) -> jnp.ndarray:
        """1 / (face area per dof): converts [W] -> [W/m2]
        (reference `gen_scale_dir_flx_vec_arr`, `src/pprts.F90:3902-3945`)."""
        s = self.scheme
        g = self.grid
        dz3 = self._dz_solve()
        nzs = self.nz_solve
        rows = []
        for d in range(s.ndir):
            if d < s.dirtop.dof:
                area = jnp.full((nzs + 1, g.nx, g.ny), g.az / s.dirtop.area_divider, ireals)
            else:
                a = (g.dy if d < s.dirtop.dof + s.dirside.dof else g.dx)
                layer_area = a * dz3 / s.dirside.area_divider
                area = jnp.concatenate(
                    [layer_area, jnp.ones((1, g.nx, g.ny), ireals)], axis=0
                )
            rows.append(1.0 / area)
        return jnp.stack(rows, 0)

    def _diff_scale_to_wm2(self) -> jnp.ndarray:
        s = self.scheme
        g = self.grid
        dz3 = self._dz_solve()
        nzs = self.nz_solve
        rows = []
        for d in range(s.ndiff):
            if d < s.difftop.dof:
                area = jnp.full((nzs + 1, g.nx, g.ny), g.az / s.difftop.area_divider, ireals)
            else:
                # NOTE: the reference scales y-faces by difftop's divider
                # (`src/pprts.F90:3975`), which looks like a typo; we use
                # the physically-consistent diffside divider for both.
                a = (g.dy if d < s.difftop.dof + s.diffside.dof else g.dx)
                layer_area = a * dz3 / s.diffside.area_divider
                area = jnp.concatenate(
                    [layer_area, jnp.ones((1, g.nx, g.ny), ireals)], axis=0
                )
            rows.append(1.0 / area)
        return jnp.stack(rows, 0)

    def get_result(self, uid: int = 0):
        """Fluxes in [W/m2] and absorption in [W/m3].

        Returns (edir, edn, eup, abso); edir is None for thermal-only.
        Reference `pprts_get_result` (`src/pprts.F90:5799-5919`).
        """
        if self.solver_type in ("2str", "schwarzschild", "disort"):
            S, edn, eup, abso, had_solar = self._oned_results[uid]
            if had_solar:
                mu = self.sun.mu
                S = S * mu
                edn = edn * mu
                eup = eup * mu
                abso = abso * mu
            return S, edn, eup, abso

        # deferred strict-convergence check: this is the natural sync
        # point (the caller is about to materialize fluxes anyway)
        self.check_convergence()

        sol = self.solutions[uid]
        s = self.scheme

        def extract(part):
            ediff_wm2 = part.ediff.astype(ireals) * self._diff_scale_to_wm2()
            inward = s.diff_inward()
            edn = sum(ediff_wm2[d] for d in range(s.difftop.dof) if inward[d]) / s.difftop.area_divider
            eup = sum(ediff_wm2[d] for d in range(s.difftop.dof) if not inward[d]) / s.difftop.area_divider
            abso = part.abso.astype(ireals)
            edir = None
            if part.edir is not None:
                edir_wm2 = part.edir.astype(ireals) * self._dir_scale_to_wm2()
                edir = edir_wm2[: s.dirtop.dof].sum(0) / s.dirtop.area_divider
                # TOA tilt rescale, solar solutions only (reference
                # :5885-5890; thermal is never mu-scaled)
                mu = self.sun.mu
                edir = edir * mu
                edn = edn * mu
                eup = eup * mu
                abso = abso * mu
            return edir, edn, eup, abso

        edir, edn, eup, abso = extract(sol)
        if sol.thermal is not None:
            _, edn_t, eup_t, abso_t = extract(sol.thermal)
            edn = edn + edn_t
            eup = eup + eup_t
            abso = abso + abso_t

        return edir, edn, eup, abso

    def get_building_fluxes(self, uid: int = 0):
        """Per-face radiation on exposed building faces [W/m2].

        Parity: reference `fill_buildings_arr` in `pprts_get_result`
        (`src/pprts.F90:5986-6249`) returns per-face `B%edir`,
        `B%incoming`, `B%outgoing`.  Dense equivalent: dicts keyed by
        face kind ('roof', 'floor', 'wall_x_low', 'wall_x_high',
        'wall_y_low', 'wall_y_high') of (Nz, Nx, Ny) fields that are
        nonzero on exposed faces of solid cells.  outgoing =
        albedo * incoming + (1 - albedo) * pi * B_face.
        """
        if self._buildings is None:
            raise RuntimeError("no buildings attached (set_buildings)")
        from tenstream_tpu.pprts.buildings import (
            building_incoming_from_fields,
            face_masks,
        )

        b = self._buildings
        s = self.scheme
        g = self.grid
        sol = self.solutions[uid]

        parts = [sol]
        if sol.thermal is not None:
            parts.append(sol.thermal)

        kinds = list(face_masks(b).keys())
        edir_f = {k: jnp.zeros(g.dz3d.shape, ireals) for k in kinds}
        incoming = {k: jnp.zeros(g.dz3d.shape, ireals) for k in kinds}
        for part in parts:
            mu = self.sun.mu if part.edir is not None else 1.0
            ef, inc = building_incoming_from_fields(
                s, b,
                part.ediff.astype(ireals) * mu,
                None if part.edir is None else part.edir.astype(ireals) * mu,
                g.az, g.dx, g.dy, g.dz3d,
                xinc=self.sun.xinc if self.sun is not None else 1,
                yinc=self.sun.yinc if self.sun is not None else 1,
            )
            for k in kinds:
                edir_f[k] = edir_f[k] + ef[k]
                incoming[k] = incoming[k] + inc[k]

        B_face = b.planck if b.planck is not None else 0.0
        out = {}
        for k, m in face_masks(b).items():
            inc = jnp.where(m, incoming[k], 0.0)
            ed = jnp.where(m, edir_f[k], 0.0)
            outg = jnp.where(
                m, b.albedo * incoming[k] + (1.0 - b.albedo) * PI * B_face, 0.0
            )
            out[k] = dict(edir=ed, incoming=inc, outgoing=outg)
        return out
