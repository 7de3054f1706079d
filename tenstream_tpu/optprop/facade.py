"""Batched transfer-coefficient lookups over whole grids.

Parity: reference `src/optprop.F90` (`get_coeff_cube`:550 — LUT lookup,
range clipping, sun-octant symmetry unfolding `dir3_to_diff*_coeff_symmetry`
:1009-1120) and the per-cell dispatch `get_coeff` in
`src/pprts_base.F90:1491-1544` (tauz/w0/aspect computation + clipping).

TPU-first redesign: one call interpolates the coefficient blocks for every
grid cell at once.  The per-solve sun angles (phi, theta) are constant, so
the 6-D direct tables are first blended down to 4-D (bilinear in phi/theta)
and then a single batched 4-D multilinear gather produces the
(cell, src, dst) coefficient fields.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals
from tenstream_tpu.ops.interp import (
    fractional_index,
    interp_4d_layered_onehot_cf,
    interp_multilinear_cf,
    interp_simplex_cf,
)
from tenstream_tpu.optprop.lut import LUT
from tenstream_tpu.streams import StreamScheme, get_scheme


def _diff_dst_permutation(scheme: StreamScheme, switch_x: bool, switch_y: bool) -> np.ndarray:
    """Destination permutation unfolding the LUT's canonical sun octant.

    Parity: `dir3_to_diff10/16_coeff_symmetry` etc.
    (`src/optprop.F90:1009+`); structural rules in
    `StreamScheme.diff_switch_perm`.
    """
    return scheme.diff_switch_perm(switch_x, switch_y)


def _diff_pair_orbits(scheme: StreamScheme, with_mz: bool = True) -> Tuple[np.ndarray, int]:
    """Orbit id of every (src, dst) diffuse stream pair under the cube
    symmetry group (x/y/z mirrors + x<->y exchange); with_mz=False drops
    the z-mirror (the SOLVER storage subgroup — atm-collapse folded
    blocks are up/down asymmetric, see `operators.OrbitCoeff`).

    Symmetrized tables (`lut.symmetrize_tables`) carry IDENTICAL values
    for all pairs of an orbit, so the (ndiff*ndiff)-channel interpolation
    gather only needs one channel per orbit (12 instead of 100 for 3_10
    — an 8.3x cut in the dominant assembly gather traffic) followed by a
    static index expansion.

    Returns (orbit[src, dst] int array, n_orbits).
    """
    from tenstream_tpu.optprop.lut import _perm_group

    p = scheme.diff_mirror_perms()
    gens = [p["mx"], p["my"], p["mxy"]] + ([p["mz"]] if with_mz else [])
    group = _perm_group(gens)
    n = scheme.ndiff
    orbit = -np.ones((n, n), np.int64)
    norb = 0
    for s in range(n):
        for d in range(n):
            if orbit[s, d] >= 0:
                continue
            for g in group:
                orbit[g[s], g[d]] = norb
            norb += 1
    return orbit, norb


class OptProp:
    """Device-resident coefficient tables for one scheme.

    Tables default to f32 storage.  bf16 (opt-in via `table_dtype`)
    halves the gather traffic of the batched interpolation, but the
    near-conservative transmissions (diagonal entries 1 - eps at small
    tau) lose eps to the 8-bit mantissa, and that error compounds
    multiplicatively through deep stacks of optically thin layers
    (measured: 0.5% OLR bias on the reference regression scene from the
    tables alone, 42% when the assembled per-cell fields were also
    bf16)."""

    def __init__(
        self,
        lut: LUT,
        scheme: StreamScheme | None = None,
        table_dtype=jnp.float32,
        analytic_dir2dir: bool | None = None,
        interp_mode: str = "onehot",
        loop_gathers: bool = False,
    ):
        self.lut = lut
        self.scheme = scheme or get_scheme(lut.scheme)
        self._table_dtype = table_dtype
        # "onehot" (default): full multilinear accuracy via per-z-layer
        # one-hot MXU contractions — no table gather at all (see
        # `interp_4d_layered_onehot_cf`); requires aspect constant per
        # layer (frac shape (nz, 1, 1)), otherwise it silently falls
        # back to the multilinear gather path per call.
        # "simplex" cuts the per-cell gathers from 16 to 5 (reference
        # `interp_vec_simplex_nd`, src/interpolation.F90:292) at the
        # cost of O(h^2) in-cell deviation from multilinear.
        # loop_gathers accumulates the corner gathers with a lax.scan so
        # only one corner temp is live — the large-grid memory knob.
        if interp_mode not in ("onehot", "multilinear", "simplex"):
            raise ValueError(f"unknown interp_mode {interp_mode!r}")
        base = interp_simplex_cf if interp_mode == "simplex" else interp_multilinear_cf
        self._interp_gather = partial(base, loop_gathers=loop_gathers)
        self.interp_mode = interp_mode
        self.loop_gathers = loop_gathers
        # exact closed-form dir2dir evaluated at the cell's ACTUAL
        # (tauz, aspect, phi, theta) — no table interpolation error and
        # no axis clipping on the direct-transport backbone (see
        # `boxmc.direct_transmission`).  Default on where supported.
        if analytic_dir2dir is None:
            from tenstream_tpu.boxmc.direct_transmission import supports_scheme

            analytic_dir2dir = supports_scheme(self.scheme.name)
        self.analytic_dir2dir = analytic_dir2dir
        self._dir2dir = jnp.asarray(lut.dir2dir, table_dtype)
        self._dir2diff = jnp.asarray(lut.dir2diff, table_dtype)
        self._diff2diff = jnp.asarray(lut.diff2diff, table_dtype)
        self._dir_grids = tuple(
            jnp.asarray(a, ireals)
            for a in (lut.dir_axes.tau, lut.dir_axes.w0, lut.dir_axes.aspect, lut.dir_axes.g)
        )
        self._phi_grid = jnp.asarray(lut.dir_axes.phi, ireals)
        self._theta_grid = jnp.asarray(lut.dir_axes.theta, ireals)
        self._diff_grids = tuple(
            jnp.asarray(a, ireals)
            for a in (lut.diff_axes.tau, lut.diff_axes.w0, lut.diff_axes.aspect, lut.diff_axes.g)
        )
        # orbit-compressed diffuse channels: symmetrized tables repeat
        # each value over its cube-group (src, dst) orbit, so gather only
        # one channel per orbit and expand with a static index map.  The
        # consistency gate keeps unsymmetrized tables on the full path.
        self._diff_orbit_idx = None
        try:
            orbit, norb = _diff_pair_orbits(self.scheme)
            t = np.asarray(lut.diff2diff, np.float32)
            flat = t.reshape(t.shape[:4] + (-1,))
            oflat = orbit.ravel()
            acc = np.zeros(t.shape[:4] + (norb,), np.float64)
            cnt = np.zeros(norb)
            np.add.at(acc, (..., oflat), flat)
            np.add.at(cnt, oflat, 1.0)
            mean = (acc / cnt).astype(np.float32)
            if np.abs(flat - mean[..., oflat]).max() <= 1e-5:
                self._diff2diff_orb = jnp.asarray(mean, table_dtype)
                self._diff_orbit_idx = jnp.asarray(oflat, jnp.int32)
                # solver-storage subgroup (no z-mirror): full-group orbits
                # refine into subgroup orbits, so one static take maps the
                # gathered channels onto the storage channels
                osub, nsub = _diff_pair_orbits(self.scheme, with_mz=False)
                sub2full = np.zeros(nsub, np.int32)
                nf = self.scheme.ndiff
                for s in range(nf):
                    for d in range(nf):
                        sub2full[osub[s, d]] = orbit[s, d]
                self._solver_orbit_idx = osub  # (ndiff, ndiff) static
                self._sub2full = jnp.asarray(sub2full)
        except Exception:
            self._diff_orbit_idx = None
        if self._diff_orbit_idx is None:
            self._solver_orbit_idx = None

    # ------------------------------------------------------------------
    def _interp(self, table, fr):
        """Dispatch one 4-D lookup: one-hot MXU path when aspect is
        per-layer constant (frac shape (nz, 1, 1) against 3-D tau/w0),
        else the configured gather path."""
        ft, fw, fa, fg = fr
        if (
            self.interp_mode == "onehot"
            and jnp.ndim(fa) == 3 and fa.shape[-2:] == (1, 1)
            and jnp.ndim(ft) == 3 and ft.shape[-2:] != (1, 1)
        ):
            return interp_4d_layered_onehot_cf(
                table, ft, fw, fa.reshape(-1), fg
            )
        return self._interp_gather(table, fr)

    def _slice_angles(self, table, phi_deg, theta_deg):
        """Bilinear blend of the (phi, theta) axes -> 4-D table."""
        fp = fractional_index(self._phi_grid, jnp.asarray(phi_deg, ireals))
        ft = fractional_index(self._theta_grid, jnp.asarray(theta_deg, ireals))
        ip = jnp.clip(jnp.floor(fp), 0, self._phi_grid.shape[0] - 2).astype(jnp.int32)
        it = jnp.clip(jnp.floor(ft), 0, self._theta_grid.shape[0] - 2).astype(jnp.int32)
        wp = fp - ip
        wt = ft - it
        t00 = table[:, :, :, :, ip, it]
        t10 = table[:, :, :, :, ip + 1, it]
        t01 = table[:, :, :, :, ip, it + 1]
        t11 = table[:, :, :, :, ip + 1, it + 1]
        return (
            t00 * (1 - wp) * (1 - wt)
            + t10 * wp * (1 - wt)
            + t01 * (1 - wp) * wt
            + t11 * wp * wt
        )

    def _fracs(self, grids, tauz, w0, aspect, g):
        return (
            fractional_index(grids[0], tauz),
            fractional_index(grids[1], w0),
            fractional_index(grids[2], aspect),
            fractional_index(grids[3], g),
        )

    # ------------------------------------------------------------------
    def dir_coeffs(
        self,
        tauz,
        w0,
        g,
        aspect,
        phi_deg,
        theta_deg,
        switch_x: bool = False,
        switch_y: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(dir2dir, dir2diff) with shapes (ndir,ndir)+B and (ndir,ndiff)+B.

        Stream dims LEAD the batch so the huge cell axes stay on the TPU
        minor tiles (channels-last gathers pad the stream dim to 128
        lanes — a measured 4.3x HBM blowup at 256^2x127 scale).

        phi_deg is the symmetry azimuth in [0, 90]; switch_x/switch_y
        unfold the actual sun octant (reference `lswitch_east/north`).
        """
        # blend promotes to f32; cast back so the heavy per-cell gather
        # stays at table precision
        t2f = self._slice_angles(self._dir2diff, phi_deg, theta_deg).astype(self._table_dtype)
        fr = self._fracs(self._dir_grids, tauz, w0, aspect, g)
        ndir, ndiff = self.scheme.ndir, self.scheme.ndiff
        if self.analytic_dir2dir:
            from tenstream_tpu.boxmc.direct_transmission import dir2dir_analytic

            c_dd = dir2dir_analytic(
                self.scheme.name, tauz, aspect, phi_deg, theta_deg
            ).astype(ireals)
            c_dd = jnp.moveaxis(c_dd, (-2, -1), (0, 1))
        else:
            t2d = self._slice_angles(self._dir2dir, phi_deg, theta_deg).astype(self._table_dtype)
            c_dd = self._interp(t2d.reshape(t2d.shape[:4] + (ndir * ndir,)), fr)
            c_dd = c_dd.reshape((ndir, ndir) + c_dd.shape[1:])
        c_df = self._interp(t2f.reshape(t2f.shape[:4] + (ndir * ndiff,)), fr)
        c_df = c_df.reshape((ndir, ndiff) + c_df.shape[1:])
        if switch_x or switch_y:
            q = _diff_dst_permutation(self.scheme, switch_x, switch_y)
            p = self.scheme.dir_switch_perm(switch_x, switch_y)
            c_dd = c_dd[p, :][:, p]
            c_df = c_df[p, :][:, q]
        return c_dd, c_df

    def diff_coeffs(self, tauz, w0, g, aspect) -> jnp.ndarray:
        """diff2diff with shape (ndiff, ndiff) + B (stream dims lead)."""
        fr = self._fracs(self._diff_grids, tauz, w0, aspect, g)
        nd = self.scheme.ndiff
        if self._diff_orbit_idx is not None:
            # gather norb orbit channels, expand to (ndiff*ndiff) with a
            # static take — exact for symmetrized tables (init gate)
            c = self._interp(self._diff2diff_orb, fr)
            c = jnp.take(c, self._diff_orbit_idx, axis=0)
        else:
            tbl = self._diff2diff.reshape(self._diff2diff.shape[:4] + (nd * nd,))
            c = self._interp(tbl, fr)
        return c.reshape((nd, nd) + c.shape[1:])

    def diff_coeffs_orbit(self, tauz, w0, g, aspect) -> jnp.ndarray:
        """diff2diff in solver-orbit channel form: (norb,) + B, where
        norb are the (src, dst) pair orbits of the no-z-mirror subgroup
        (see `operators.OrbitCoeff`).  Requires a symmetrized table
        (`_solver_orbit_idx is not None`)."""
        fr = self._fracs(self._diff_grids, tauz, w0, aspect, g)
        c = self._interp(self._diff2diff_orb, fr)  # (norb16,) + B
        return jnp.take(c, self._sub2full, axis=0)  # (norb_sub,) + B


def check_energy_conservation(coeff_src_dst: jnp.ndarray, extra=None, tol: float = 1e-3) -> jnp.ndarray:
    """Row sums (over dst) must not exceed 1 (+MC noise).

    Parity: reference `src/optprop_LUT.F90:1489-1504`.
    Returns the per-src max violation.
    """
    total = coeff_src_dst.sum(-1)
    if extra is not None:
        total = total + extra.sum(-1)
    return jnp.maximum(total - 1.0, 0.0).max()
