"""Buildings: solid cells with reflecting/emitting faces.

Parity: reference `src/buildings.F90` (`t_pprts_buildings` — face lists
with per-face albedo/temperature) and its hooks in the solver: zeroing
transmission through building faces during coefficient assembly
(`src/pprts.F90:3188-3212`), reflection of the direct beam and thermal
emission as diffuse sources (`set_buildings_reflection/emission`,
:4989-5082).

TPU-first redesign: instead of sparse face index lists, buildings are a
dense boolean `solid` cell mask (+ dense albedo / planck fields) — the
coefficient masking and source terms become fused `where` operations over
the whole grid.  Exposed faces are derived from the mask by shifts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.pprts.coeffs import CoeffFields
from tenstream_tpu.streams import StreamScheme


@dataclass
class Buildings:
    solid: jnp.ndarray  # (Nz, Nx, Ny) bool: cell is inside a building
    albedo: float = 0.2  # building face albedo
    planck: Optional[jnp.ndarray] = None  # (Nz, Nx, Ny) face Planck [W/m2/sr]

    def exposed_top(self):
        """Faces where radiation travelling down hits a roof: cell solid,
        cell above (k-1) not solid (TOA-adjacent roofs included)."""
        s = self.solid
        above = jnp.concatenate([jnp.zeros_like(s[:1]), s[:-1]], axis=0)
        return s & (~above)

    def exposed_bottom(self):
        s = self.solid
        below = jnp.concatenate([s[1:], jnp.zeros_like(s[:1])], axis=0)
        return s & (~below)

    def exposed_side(self, axis: int, low: bool):
        """Exposed vertical walls: cell solid, horizontal neighbour not.
        axis: 1 = x, 2 = y; low=True is the XMIN/YMIN wall (at face index
        i / j), low=False the XMAX/YMAX wall (face i+1 / j+1).  Periodic
        horizontally, like the solver."""
        s = self.solid
        nb = jnp.roll(s, 1 if low else -1, axis=axis)
        return s & (~nb)


def mask_coeffs(coeffs: CoeffFields, b: Buildings) -> CoeffFields:
    """Zero all transfer blocks of solid cells: nothing propagates
    through a building (reference zeroes the face coefficients,
    `src/pprts.F90:3197-3212`; with per-cell blocks the cell mask is
    equivalent for whole-cell buildings)."""
    m = b.solid[None, None]  # broadcast over (src, dst)
    dd = None if coeffs.dir2dir is None else jnp.where(m, 0.0, coeffs.dir2dir)
    df = None if coeffs.dir2diff is None else jnp.where(m, 0.0, coeffs.dir2diff)
    ff = jnp.where(m, 0.0, coeffs.diff2diff)
    return CoeffFields(dd, df, ff)


def building_sources(
    scheme: StreamScheme,
    b: Buildings,
    edir: Optional[jnp.ndarray],  # (ndir, Nz+1, Nx, Ny) [W]
    az: float,
    dz3d: Optional[jnp.ndarray] = None,  # (Nz, Nx, Ny) layer thickness [m]
    dx: float = 0.0,
    dy: float = 0.0,
    xinc: int = 1,
    yinc: int = 1,
) -> jnp.ndarray:
    """Diffuse source from building faces: reflection of the direct beam
    and thermal emission (reference `set_buildings_reflection/emission`,
    `src/pprts.F90:4989-5082`) — roofs plus, when the scheme carries
    side streams and `dz3d` is given, the exposed vertical walls.
    """
    inward = scheme.diff_inward()
    ntd = scheme.dirtop.dof
    axis = scheme.diff_axis()
    dir_axis = scheme.dir_axis()
    roof = b.exposed_top()  # (Nz, Nx, Ny): roof at z-face index k
    nz = roof.shape[0]

    out = jnp.zeros((scheme.ndiff,) + (nz + 1,) + roof.shape[1:], ireals)
    wtop = scheme.difftop_weights()
    for d in range(scheme.difftop.dof):
        if inward[d]:
            continue  # only upward dofs emitted/reflected at roofs
        contrib = jnp.zeros(roof.shape, ireals)
        if edir is not None:
            edir_dn = edir[:ntd, :-1].sum(0)  # direct arriving at face k
            contrib = contrib + jnp.where(
                roof, edir_dn * b.albedo * float(wtop[d]), 0.0
            )
        if b.planck is not None:
            contrib = contrib + jnp.where(
                roof,
                b.planck * (1.0 - b.albedo) * PI * az * float(wtop[d]),
                0.0,
            )
        # upward dof at face k (top of the solid cell layer k)
        out = out.at[d, :-1].add(contrib)

    if scheme.diffside.dof == 0 or dz3d is None:
        return out

    # --- vertical walls -------------------------------------------------
    # Side stream fields store the dof of x-face i (between columns
    # i-1, i) at column index i, layer slot k; a wall contribution of
    # cell (k,i,j) therefore lands at column i (low wall, outward dofs)
    # or i+1 (high wall, inward dofs; periodic roll).
    wside = scheme.diffside_weights()
    nt, ns = scheme.difftop.dof, scheme.diffside.dof
    wall_area = {1: dy, 2: dx}

    for ax in (1, 2):
        low_wall = b.exposed_side(ax, True)  # beam +axis hits this wall
        high_wall = b.exposed_side(ax, False)
        beam_pos = (xinc == 1) if ax == 1 else (yinc == 1)
        if edir is not None:
            # direct power crossing the wall face (side dir dofs, [W])
            side_dir = sum(
                edir[d, :-1] for d in range(scheme.ndir) if dir_axis[d] == ax
            )
            # the face value at column i is the flux at x-face i; the
            # beam-facing wall sits at face i (beam +x) or i+1 (beam -x)
            hit_low = jnp.where(low_wall, side_dir, 0.0)
            hit_high = jnp.where(
                high_wall, jnp.roll(side_dir, -1, axis=ax), 0.0
            )
        emit = None
        if b.planck is not None:
            a_wall = wall_area[ax] * dz3d
            emit = b.planck * (1.0 - b.albedo) * PI * a_wall
        for d in range(nt, scheme.ndiff):
            if axis[d] != ax:
                continue
            side_pos = (d - nt) % ns
            w = float(wside[side_pos])
            # outward dof (moving -axis): sourced by the low wall at
            # face i; inward dof: by the high wall at face i+1
            if not inward[d]:
                contrib = jnp.zeros(roof.shape, ireals)
                if edir is not None and beam_pos:
                    contrib = contrib + hit_low * b.albedo * w
                if emit is not None:
                    contrib = contrib + jnp.where(low_wall, emit * w, 0.0)
                out = out.at[d, :-1].add(contrib)
            else:
                contrib = jnp.zeros(roof.shape, ireals)
                if edir is not None and not beam_pos:
                    contrib = contrib + hit_high * b.albedo * w
                if emit is not None:
                    contrib = contrib + jnp.where(high_wall, emit * w, 0.0)
                out = out.at[d, :-1].add(jnp.roll(contrib, 1, axis=ax))
    return out
