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
) -> jnp.ndarray:
    """Diffuse source from building roofs: reflection of the direct beam
    and thermal emission (reference `set_buildings_reflection/emission`).

    Side-face reflection/emission is not yet modelled (the dominant
    building effect for heating rates is the roof/shadow term); noted as
    a TODO toward full parity.
    """
    inward = scheme.diff_inward()
    ntd = scheme.dirtop.dof
    roof = b.exposed_top()  # (Nz, Nx, Ny): roof at z-face index k
    nz = roof.shape[0]

    bsrc = None
    rows = []
    for d in range(scheme.ndiff):
        rows.append(None)

    out = jnp.zeros((scheme.ndiff,) + (nz + 1,) + roof.shape[1:], ireals)
    for d in range(scheme.difftop.dof):
        if inward[d]:
            continue  # only upward dofs emitted/reflected at roofs
        contrib = jnp.zeros(roof.shape, ireals)
        if edir is not None:
            edir_dn = edir[:ntd, :-1].sum(0)  # direct arriving at face k
            contrib = contrib + jnp.where(
                roof, edir_dn * b.albedo / scheme.difftop_streams, 0.0
            )
        if b.planck is not None:
            contrib = contrib + jnp.where(
                roof,
                b.planck * (1.0 - b.albedo) * PI * az / scheme.difftop_streams,
                0.0,
            )
        # upward dof at face k (top of the solid cell layer k)
        out = out.at[d, :-1].add(contrib)
    return out
