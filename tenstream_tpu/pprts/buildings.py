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
    # face temperature [K] (scalar or (Nz, Nx, Ny)); consumed by specint,
    # which derives the per-g-point Planck emission from it (reference
    # `opt_buildings%temp` -> `ecckd_planck` per band,
    # `ecckd/ecckd_pprts.F90:348-412`)
    temp: Optional[jnp.ndarray] = None
    # filled by specint_pprts: spectrally integrated per-face fluxes
    # [W/m2], face kind -> dict(edir, incoming, outgoing) (reference
    # fills `opt_buildings%incoming/outgoing`, `ecckd_pprts.F90:440-448`)
    fluxes: Optional[dict] = None

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


def face_masks(b: Buildings):
    """Exposed-face boolean masks keyed by face kind."""
    return {
        "roof": b.exposed_top(),
        "floor": b.exposed_bottom(),
        "wall_x_low": b.exposed_side(1, True),
        "wall_x_high": b.exposed_side(1, False),
        "wall_y_low": b.exposed_side(2, True),
        "wall_y_high": b.exposed_side(2, False),
    }


def building_incoming_from_fields(
    scheme: StreamScheme,
    b: Buildings,
    ediff: jnp.ndarray,  # (ndiff, Nz+1, Nx, Ny) [W], mu-scaled if solar
    edir: Optional[jnp.ndarray],  # (ndir, Nz+1, Nx, Ny) [W] or None
    az: float,
    dx: float,
    dy: float,
    dz3d: jnp.ndarray,
    xinc: int = 1,
    yinc: int = 1,
):
    """Per-face direct and total incoming radiation [W/m2] on exposed
    building faces from raw stream-resolved [W] flux fields (reference
    `fill_buildings_arr`, `src/pprts.F90:5986-6249`).  Returns
    (edir_faces, incoming) dicts of UNMASKED (Nz, Nx, Ny) fields keyed by
    face kind; linear in the fields, so spectrally accumulated inputs
    yield spectrally accumulated face fluxes."""
    nt = scheme.difftop.dof
    ntd = scheme.dirtop.dof
    inward = scheme.diff_inward()
    axis = scheme.diff_axis()
    dir_axis = scheme.dir_axis()
    shape = dz3d.shape
    wall_area = {
        "wall_x_low": dy * dz3d, "wall_x_high": dy * dz3d,
        "wall_y_low": dx * dz3d, "wall_y_high": dx * dz3d,
    }

    kinds = list(face_masks(b).keys())
    edir_f = {k: jnp.zeros(shape, ireals) for k in kinds}
    incoming = {k: jnp.zeros(shape, ireals) for k in kinds}

    # roofs/floors: vertical streams at the z-face of the solid cell
    edn_W = sum(ediff[d] for d in range(nt) if inward[d])
    eup_W = sum(ediff[d] for d in range(nt) if not inward[d])
    incoming["roof"] = incoming["roof"] + edn_W[:-1] / az
    incoming["floor"] = incoming["floor"] + eup_W[1:] / az
    if edir is not None:
        ed = edir[:ntd].sum(0)
        edir_f["roof"] = edir_f["roof"] + ed[:-1] / az
        incoming["roof"] = incoming["roof"] + ed[:-1] / az

    # walls: side streams arriving at the exposed vertical faces.  Side
    # fields store x-face i at column index i, layer slot k.
    for ax, (klo, khi) in ((1, ("wall_x_low", "wall_x_high")),
                           (2, ("wall_y_low", "wall_y_high"))):
        into_pos = sum(  # moving +axis, hits the low wall (face i)
            ediff[d, :-1] for d in range(nt, scheme.ndiff)
            if axis[d] == ax and inward[d]
        )
        into_neg = sum(  # moving -axis, hits the high wall (face i+1)
            ediff[d, :-1] for d in range(nt, scheme.ndiff)
            if axis[d] == ax and not inward[d]
        )
        incoming[klo] = incoming[klo] + into_pos / wall_area[klo]
        incoming[khi] = incoming[khi] + jnp.roll(into_neg, -1, axis=ax) / wall_area[khi]
        if edir is not None and scheme.dirside.dof > 0:
            beam_pos = (xinc == 1) if ax == 1 else (yinc == 1)
            side_dir = sum(
                edir[d, :-1] for d in range(scheme.ndir) if dir_axis[d] == ax
            )
            if beam_pos:
                v = side_dir / wall_area[klo]
                edir_f[klo] = edir_f[klo] + v
                incoming[klo] = incoming[klo] + v
            else:
                v = jnp.roll(side_dir, -1, axis=ax) / wall_area[khi]
                edir_f[khi] = edir_f[khi] + v
                incoming[khi] = incoming[khi] + v

    return edir_f, incoming


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
    planck: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Diffuse source from building faces: reflection of the direct beam
    and thermal emission (reference `set_buildings_reflection/emission`,
    `src/pprts.F90:4989-5082`) — roofs plus, when the scheme carries
    side streams and `dz3d` is given, the exposed vertical walls.

    `planck` overrides `b.planck` (traced per-band emission from specint;
    pass None to statically disable emission).
    """
    b_planck = planck if planck is not None else b.planck
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
        if b_planck is not None:
            contrib = contrib + jnp.where(
                roof,
                b_planck * (1.0 - b.albedo) * PI * az * float(wtop[d]),
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
        if b_planck is not None:
            a_wall = wall_area[ax] * dz3d
            emit = b_planck * (1.0 - b.albedo) * PI * a_wall
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
