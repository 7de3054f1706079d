"""Wedge solver on unstructured triangle meshes (ICON grids).

Parity: reference `plexrt/plex_rt.F90` on DMPlex meshes built from ICON
grids (`plexrt/icon_plex_utils.F90`).  Same physics as the structured
`plexrt.solver.PlexrtSolver`; the mesh is a `plexrt.icon.TriMesh` and
every neighbor exchange is one gather through the mesh's flat
(cell, side) index table — no DMPlex, no MPI-SF.

State layout (flat cells, nc = mesh.ncell):
  edir per layer : (4, nc)      [top_in, side0..2 inflow]
  ediff z-faces  : E (2, nz+1, nc)   dof0 Edn, dof1 Eup
  ediff side OUT : F (2, nz, nc, 3)  [dn, up] outflow per cell side
Lateral domain boundaries are open (vacuum) — inflow gathers return
zero there (reference `plex_rt.F90:4341`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.planck import b_eff
from tenstream_tpu.plexrt.icon import TriMesh
from tenstream_tpu.plexrt.optprop import WedgeOptProp
from tenstream_tpu.plexrt.wedge_boxmc import NDIFF


class PlexSolutionU(NamedTuple):
    edir: Optional[jnp.ndarray]  # (nz+1, nc) [W] through z-faces
    edn: jnp.ndarray  # (nz+1, nc) [W]
    eup: jnp.ndarray
    abso: jnp.ndarray  # (nz, nc) [W/m3]
    # diffuse-solve convergence observability (pprts `Solution` parity)
    niter_diff: Any = 0
    diff_res: Any = 0.0
    diff_tol: Any = 0.0


class PlexrtSolverIcon:
    """Monochromatic wedge_5_8 solve on a TriMesh extruded over nz
    layers of thickness dz (TOA -> surface)."""

    def __init__(self, mesh: TriMesh, dz, opp: WedgeOptProp,
                 n_inner: int = 24, diff_iters: int = 1000,
                 diff_rtol: float = 1e-5, diff_solver: str = "bicgstab"):
        # bicgstab with residual-based stopping is the DEFAULT (round-4;
        # reference KSPFBCGS default, `plexrt/plex_rt.F90:2228`);
        # diff_iters is the safety cap, not the stopping rule.
        # 'fixedpoint' keeps the explicit-SOR-analogue iteration.
        self.diff_solver = diff_solver
        self.mesh = mesh
        self.dz = np.broadcast_to(np.asarray(dz, np.float32).ravel(), (np.size(dz),)).copy() \
            if np.ndim(dz) else np.asarray([dz], np.float32)
        self.nz = self.dz.shape[0]
        self.opp = opp
        self.n_inner = n_inner
        self.diff_iters = diff_iters
        self.diff_rtol = diff_rtol
        self._sundir = None

        self._ex_idx = jnp.asarray(mesh.exchange_index().reshape(-1))  # (nc*3,)
        self._ex_mask = jnp.asarray(mesh.exchange_mask(), ireals)  # (nc, 3)
        self._area = jnp.asarray(mesh.area, ireals)  # (nc,)
        self._side_len = jnp.asarray(mesh.side_len, ireals)  # (nc, 3)
        self._phi_rot = jnp.asarray(mesh.phi_rot, ireals)  # (nc,)

        # per-cell apex position in the cell-local frame (side 0 = AB on
        # +x, unit AB): feeds the param-phi shape-aware azimuth map
        # (`plexrt/param_phi.py`, reference `src/LUT_param_phi.F90`).
        v = mesh.verts[mesh.tris]  # (nc, 3, 2)
        ab = v[:, 1] - v[:, 0]
        ac = v[:, 2] - v[:, 0]
        L = np.maximum(np.linalg.norm(ab, axis=-1), 1e-30)
        abh = ab / L[:, None]
        cx = (ac * abh).sum(-1) / L
        cy = (ac[:, 1] * abh[:, 0] - ac[:, 0] * abh[:, 1]) / L
        self._wedge_C = (jnp.asarray(cx, ireals), jnp.asarray(np.maximum(cy, 1e-6), ireals))
        # shape-interpolating optprop (`WedgeOptPropShaped`): K sample
        # tables bracket the mesh's shape distribution and apply their
        # own per-table azimuth maps — the solver passes RAW azimuths
        # and skips its single-table param-phi path entirely
        self._shaped_opp = hasattr(opp, "bind_cells")
        if self._shaped_opp:
            opp.bind_cells(np.asarray(cx), np.asarray(np.maximum(cy, 1e-6)))
            self._table_apex = (1.0, 1.0)
            self._use_param_phi = False
            return
        # the table's own triangle shape (canonical right triangle
        # (1, 1) unless a shape-aware table was traced for this mesh,
        # `optprop.wedge_lut_for_mesh`); the param-phi azimuth map
        # targets THIS shape
        self._table_apex = tuple(getattr(opp.lut, "apex", (1.0, 1.0)))
        self._use_param_phi = bool(
            np.max(np.abs(cx - self._table_apex[0])) > 1e-3
            or np.max(np.abs(cy - self._table_apex[1])) > 1e-3
        )
        # quantified round-3 (tools/wedge_shape_error.py, PARITY.md):
        # evaluating a strongly different table shape costs ~10-16%
        # flux error even with the param-phi azimuth map — warn loudly
        dev = float(max(np.max(np.abs(cx - self._table_apex[0])),
                        np.max(np.abs(cy - self._table_apex[1]))))
        if dev > 0.15:
            import warnings

            warnings.warn(
                f"mesh cell shapes deviate from the coefficient table's "
                f"triangle by up to {dev:.2f} (apex units) — measured "
                f"~10-16% flux error at deviation 0.5 (PARITY.md); build "
                f"a shape-aware table with "
                f"tenstream_tpu.plexrt.optprop.wedge_lut_for_mesh(mesh)",
                stacklevel=2,
            )

    def set_angles(self, sundir) -> None:
        self._sundir = np.asarray(sundir, np.float64)

    # ------------------------------------------------------------------
    def set_mesh(self, dev_mesh) -> None:
        """Attach a device mesh: all per-cell fields are placed with the
        flat `nc` axis sharded over EVERY mesh axis (product sharding).
        The neighbor gathers in `_exchange` lower to GSPMD collectives
        (an all-gather of the (.., nc, 3) side-outflow field per sweep —
        the gather-based analogue of the structured solver's halo
        permutes; an arbitrary ICON adjacency has no static halo).  The
        reference decomposes plexrt over MPI ranks with PETSc SF
        exchanges (`plexrt/plex_rt.F90`, SURVEY §2.5)."""
        self._dev_mesh = dev_mesh
        for name in ("_ex_mask", "_area", "_side_len", "_phi_rot"):
            ax = {"_ex_mask": 0, "_area": 0, "_side_len": 0, "_phi_rot": 0}[name]
            setattr(self, name, self._shard(getattr(self, name), ax))
        self._wedge_C = tuple(self._shard(c, 0) for c in self._wedge_C)

    _dev_mesh = None

    def _shard(self, a, nc_axis: int):
        """Place `a` with axis `nc_axis` sharded over the attached device
        mesh (no-op without one)."""
        if self._dev_mesh is None or a is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = a.ndim + nc_axis if nc_axis < 0 else nc_axis
        names = tuple(self._dev_mesh.axis_names)
        spec = P(*([None] * ax), names, *([None] * (a.ndim - ax - 1)))
        return jax.device_put(a, NamedSharding(self._dev_mesh, spec))

    def set_optical_properties(self, albedo, kabs, ksca, g, planck=None,
                               planck_srfc=None) -> None:
        """kabs/ksca/g: (nz, nc); planck: (nz+1, nc)."""
        self._albedo = albedo
        self._kabs = self._shard(jnp.asarray(kabs, ireals), -1)
        self._ksca = self._shard(jnp.asarray(ksca, ireals), -1)
        self._g = self._shard(jnp.asarray(g, ireals), -1)
        self._planck = (None if planck is None
                        else self._shard(jnp.asarray(planck, ireals), -1))
        self._planck_srfc = (None if planck_srfc is None
                             else self._shard(jnp.asarray(planck_srfc, ireals), -1))

    # ------------------------------------------------------------------
    def _exchange(self, out_side):
        """in[..., c, s] = out[..., nbr[c,s], nbr_side[c,s]] (0 at open
        boundaries).  out_side: (..., nc, 3)."""
        flat = out_side.reshape(out_side.shape[:-2] + (-1,))
        gathered = jnp.take(flat, self._ex_idx, axis=-1)
        got = gathered.reshape(out_side.shape) * self._ex_mask
        if self._dev_mesh is not None:
            # the gather's output inherits the (replicated) index
            # sharding; pin it back onto the cell decomposition so the
            # sweep stays distributed
            from jax.sharding import NamedSharding, PartitionSpec as P

            names = tuple(self._dev_mesh.axis_names)
            spec = P(*([None] * (got.ndim - 2)), names, None)
            got = jax.lax.with_sharding_constraint(
                got, NamedSharding(self._dev_mesh, spec))
        return got

    def _sun_angles(self) -> Tuple[float, float, float]:
        s = self._sundir / np.linalg.norm(self._sundir)
        theta = float(np.rad2deg(np.arccos(np.clip(-s[2], -1.0, 1.0))))
        phi = float(np.rad2deg(np.arctan2(s[0], s[1])))  # photon azimuth
        mu = float(max(-s[2], 1e-6))
        return phi, theta, mu

    def _coeffs(self, need_dir: bool):
        dz3 = jnp.asarray(self.dz, ireals)[:, None]  # (nz, 1)
        kext = self._kabs + self._ksca
        tauz = kext * dz3
        w0 = self._ksca / jnp.maximum(kext, jnp.finfo(ireals).tiny)
        # characteristic horizontal length of the canonical triangle
        L = jnp.sqrt(2.0 * self._area)[None, :]
        aspect = dz3 / L
        f2f = self.opp.diff_coeffs(tauz, w0, self._g, aspect)
        d2d = d2f = None
        if need_dir:
            phi, theta, _ = self._sun_angles()
            # sun azimuth in each cell's canonical frame: the cell is the
            # canonical triangle rotated by phi_rot, so the azimuth seen
            # from the canonical frame shifts by -phi_rot... the
            # structured mesh (T1 = 180-degree rotation, looked up at
            # phi+180) pins the sign: +phi_rot.
            phi_cell = jnp.asarray(phi, ireals) + self._phi_rot[None, :]
            if self._use_param_phi:
                # shape-aware azimuth: evaluate the canonical table at
                # the azimuth with the same param-phi coordinate, so sun
                # alignment with a side face of the ACTUAL triangle maps
                # to alignment with the matching canonical side face
                from tenstream_tpu.plexrt.param_phi import canonical_azimuth_map

                phi_cell = canonical_azimuth_map(
                    phi_cell, self._wedge_C[0][None, :], self._wedge_C[1][None, :],
                    self._table_apex[0], self._table_apex[1],
                )
            d2d, d2f = self.opp.dir_coeffs(tauz, w0, self._g, aspect, phi_cell, theta)
        return f2f, d2d, d2f

    # ------------------------------------------------------------------
    def _solve_edir(self, d2d, edirTOA: float):
        nc = self.mesh.ncell
        sd = np.asarray(self._sundir, np.float64)
        mu = jnp.asarray(abs(sd[2]) / np.linalg.norm(sd), ireals)
        top0 = self._area * edirTOA * mu  # (nc,)

        def layer(top_in, C):  # C: (nc, 4, 5)
            I = jnp.zeros((3, nc), ireals)

            def inner(_, I):
                v = jnp.concatenate([top_in[None], I], axis=0)  # (4, nc)
                out = jnp.einsum("sc,csd->dc", v, C)  # (5, nc)
                out_side = jnp.moveaxis(out[1:4], 0, -1)  # (nc, 3)
                inflow = self._exchange(out_side)  # (nc, 3)
                return jnp.moveaxis(inflow, -1, 0)

            I = jax.lax.fori_loop(0, self.n_inner, inner, I)
            v = jnp.concatenate([top_in[None], I], axis=0)
            out = jnp.einsum("sc,csd->dc", v, C)
            bot = out[4]
            # open-boundary side outflow leaves the domain: count it as
            # escaped, not absorbed
            out_side = jnp.moveaxis(out[1:4], 0, -1)
            escaped = (out_side * (1.0 - self._ex_mask)).sum(-1)
            net = top_in + I.sum(0) - out.sum(0)
            return bot, (bot, net, I, escaped)

        _, (bots, net, sides, escaped) = jax.lax.scan(layer, top0, d2d)
        edir = jnp.concatenate([top0[None], bots], axis=0)  # (nz+1, nc)
        return edir, net, sides, escaped

    # ------------------------------------------------------------------
    def _gather_in(self, E, F):
        """Per-cell incoming 8-vector (wedge dof order)."""
        ins = [E[0, :-1]]  # (nz, nc)
        in_dn = self._exchange(F[0])  # (nz, nc, 3)
        in_up = self._exchange(F[1])
        for s in range(3):
            ins.append(in_dn[..., s])
            ins.append(in_up[..., s])
        ins.append(E[1, 1:])
        return jnp.stack(ins, axis=0)  # (8, nz, nc)

    def _diff_op(self, f2f, E, F, b, albedo, dir_sfc):
        v = self._gather_in(E, F)
        out = jnp.einsum("skc,kcsd->dkc", v, f2f)  # (8, nz, nc)

        Eup_new = jnp.zeros_like(E[1]).at[:-1].set(out[0])
        Edn_new = jnp.zeros_like(E[0]).at[1:].set(out[7])
        F_dn = jnp.stack([out[1 + 2 * s] for s in range(3)], axis=-1)
        F_up = jnp.stack([out[2 + 2 * s] for s in range(3)], axis=-1)
        F_new = jnp.stack([F_dn, F_up], axis=0) + b[1]
        E_new = jnp.stack([Edn_new, Eup_new], axis=0) + b[0]
        refl = albedo * (E_new[0, -1] + dir_sfc)
        E_new = E_new.at[1, -1].add(refl)
        E_new = E_new.at[0, 0].set(0.0)
        return E_new, F_new

    def _sources(self, f2f, d2f, sides_dir, edir):
        nz, nc = self.nz, self.mesh.ncell
        bE = jnp.zeros((2, nz + 1, nc), ireals)
        bF = jnp.zeros((2, nz, nc, 3), ireals)

        def scatter(src):  # src: (8, nz, nc)
            nonlocal bE, bF
            bE = bE.at[1, :-1].add(src[0])
            bE = bE.at[0, 1:].add(src[7])
            dn = jnp.stack([src[1 + 2 * s] for s in range(3)], axis=-1)
            up = jnp.stack([src[2 + 2 * s] for s in range(3)], axis=-1)
            bF = bF + jnp.stack([dn, up], axis=0)

        if d2f is not None and edir is not None:
            v = jnp.concatenate([edir[:-1][None], jnp.moveaxis(sides_dir, 1, 0)], axis=0)
            scatter(jnp.einsum("skc,kcsd->dkc", v, d2f))

        if self._planck is not None:
            dz3 = jnp.asarray(self.dz, ireals)[:, None]
            tauz = self._kabs * dz3
            b0, b1 = self._planck[:-1], self._planck[1:]
            btop = b_eff(b1, b0, tauz)
            bbot = b_eff(b0, b1, tauz)
            emis = jnp.clip(1.0 - f2f.sum(-1), 0.0, 1.0)  # (nz, nc, 8)
            em = []
            for d in range(NDIFF):
                if d == 0:
                    val = btop * PI * self._area[None] * emis[..., 0]
                elif d == 7:
                    val = bbot * PI * self._area[None] * emis[..., 7]
                else:
                    s = (d - 1) // 2
                    up = (d - 1) % 2
                    area = self._side_len[None, :, s] * dz3
                    bsrc = btop if up else bbot
                    val = bsrc * PI * area * 0.5 * emis[..., d]
                em.append(val)
            scatter(jnp.stack(em, axis=0))
            bsfc = self._planck[-1] if self._planck_srfc is None else self._planck_srfc
            bE = bE.at[1, -1].add((1.0 - self._albedo) * PI * self._area * bsfc)
        return bE, bF

    # ------------------------------------------------------------------
    def solve(self, lthermal: bool, lsolar: bool, edirTOA: float = 0.0) -> PlexSolutionU:
        nz, nc = self.nz, self.mesh.ncell
        need_dir = bool(lsolar and self._sundir is not None and -self._sundir[2] > 1e-6)
        f2f, d2d, d2f = self._coeffs(need_dir)

        edir = None
        sides_dir = None
        dir_net = jnp.zeros((nz, nc), ireals)
        if need_dir:
            edir, dir_net, sides_dir, _ = self._solve_edir(d2d, edirTOA)

        if need_dir or lthermal:
            bE, bF = self._sources(f2f, d2f if need_dir else None, sides_dir, edir)
        else:
            bE = jnp.zeros((2, nz + 1, nc), ireals)
            bF = jnp.zeros((2, nz, nc, 3), ireals)

        albedo = jnp.asarray(self._albedo, ireals)
        dir_sfc = edir[-1] if edir is not None else jnp.zeros((nc,), ireals)

        E = self._shard(jnp.zeros((2, nz + 1, nc), ireals), -1)
        F = self._shard(jnp.zeros((2, nz, nc, 3), ireals), -2)

        from tenstream_tpu.plexrt.solver import iterate_diffuse

        G = lambda x: self._diff_op(f2f, x[0], x[1], (bE, bF), albedo, dir_sfc)
        E, F, niter, res, tol = iterate_diffuse(
            G, E, F, self.diff_solver, self.diff_iters, self.diff_rtol
        )

        diff_net = self._diff_divergence(E, F, bE, bF, f2f)
        vol = jnp.asarray(self.dz, ireals)[:, None] * self._area[None]
        abso = (dir_net + diff_net) / vol
        return PlexSolutionU(edir, E[0], E[1], abso,
                             niter_diff=niter, diff_res=res, diff_tol=tol)

    def _diff_divergence(self, E, F, bE, bF, f2f):
        v = self._gather_in(E, F)
        out = jnp.einsum("skc,kcsd->dkc", v, f2f)
        src_tot = bE[1, :-1] + bE[0, 1:] + bF.sum(axis=(0, -1))
        return v.sum(0) - out.sum(0) - src_tot

    # ------------------------------------------------------------------
    def get_result(self, sol: PlexSolutionU):
        """(edir, edn, eup, abso) in W/m2 / W/m3 per triangle column."""
        a = self._area[None]
        edir = None if sol.edir is None else sol.edir / a
        return edir, sol.edn / a, sol.eup / a, sol.abso

    def nca_absorption(self, sol: PlexSolutionU, tables=None) -> jnp.ndarray:
        """3-D-corrected thermal heating rates via the Neighbouring
        Column Approximation, [W/m^3] (reference `-plexrt_nca`,
        `plexrt_external_solvers.F90:plexrt_nca_compute`).  Thermal
        only: requires planck to be set and a thermal `sol`."""
        if self._planck is None:
            raise RuntimeError("NCA is a thermal correction: set planck first")
        from tenstream_tpu.plexrt.nca import nca_icon

        a = self._area[None]
        return nca_icon(
            self.mesh, self.dz, self._kabs, self._planck,
            sol.edn / a, sol.eup / a, tables,
        )
