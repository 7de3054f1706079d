"""Diffuse source-vector assembly (solar scattering + thermal emission).

Parity: reference `setup_b` (`src/pprts.F90:4641-5150`):
  * `set_solar_source` — dir2diff blocks applied to the direct solution
    (implemented in `operators.dir2diff_source`) plus ground reflection
    of the direct beam.
  * `set_thermal_source` — per-stream emission with emissivity from the
    coefficient row sums (reciprocity), B_eff effective Planck values,
    and surface emission.

All sources are in [W] (face-area scaled), matching the reference's
solve units.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.planck import b_eff
from tenstream_tpu.pprts.operators import scatter_diff_dst
from tenstream_tpu.streams import StreamScheme


def thermal_source(
    scheme: StreamScheme,
    diff2diff: jnp.ndarray,  # (ndiff, ndiff, Nz, Nx, Ny)
    planck: jnp.ndarray,  # (Nz+1, Nx, Ny) [W/m2/sr]
    kabs: jnp.ndarray,  # (Nz, Nx, Ny)
    dz3d: jnp.ndarray,
    dx: float,
    dy: float,
    albedo2d: jnp.ndarray,
    l1d: jnp.ndarray,  # (Nz,) bool
    planck_srfc: Optional[jnp.ndarray] = None,
    collapse_btop: Optional[jnp.ndarray] = None,  # (Nx, Ny) [W/m2/sr]
    collapse_bbot: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Thermal emission source b [W], shape (ndiff, Nz+1, Nx, Ny).

    Reference `set_thermal_source` (`src/pprts.F90:4848-4989`).
    With `collapse_btop/bbot`, layer 0 is an atm-collapse super-layer
    whose effective emission (emissivity included) was integrated by
    schwarzschild over the folded stack (reference `:4875-4877`).
    """
    tauz = kabs * dz3d
    b0 = planck[:-1]
    b1 = planck[1:]
    btop = b_eff(b1, b0, tauz)
    bbot = b_eff(b0, b1, tauz)

    az = dx * dy / scheme.difftop.area_divider
    ax = dy * dz3d / scheme.diffside.area_divider
    ay = dx * dz3d / scheme.diffside.area_divider

    inward = scheme.diff_inward()
    ntop, nside = scheme.difftop.dof, scheme.diffside.dof
    l1d_mask = jnp.asarray(l1d, bool)[:, None, None]

    # per-dof emissivity from coefficient row sums (reciprocity),
    # reference :4906-4950: emis = 1 - sum(diff2diff(src, :))
    from tenstream_tpu.pprts.operators import diff_dst_sums

    emis = jnp.clip(1.0 - diff_dst_sums(diff2diff, None), 0.0, 1.0)  # (ndiff, Nz, Nx, Ny)

    wtop = scheme.difftop_weights()
    wside = scheme.diffside_weights()
    ftop = scheme.diffside_bsrc_top()
    rows = []
    for d in range(scheme.ndiff):
        if d < ntop:
            bfac = PI * az * float(wtop[d])
            val = (bbot if inward[d] else btop) * bfac * emis[d]
            if collapse_btop is not None:
                ov = collapse_bbot if inward[d] else collapse_btop
                val = val.at[0].set(ov * bfac)
        else:
            side_pos = (d - ntop) % nside
            area = ax if d < ntop + nside else ay
            bfac = PI * area * float(wside[side_pos])
            # bins couple to the layer-bottom/-top Planck value by their
            # z sense (reference :4920-4924: iside > dof/2 -> btop)
            f = float(ftop[side_pos])
            bsrc = bbot * (1.0 - f) + btop * f
            val = bsrc * bfac * emis[d]
            val = jnp.where(l1d_mask, 0.0, val)  # no side emission in 1-D layers
        rows.append(val)
    contrib = jnp.stack(rows, axis=0)

    b = scatter_diff_dst(scheme, contrib, planck.shape[0] - 1)

    # surface emission into the upward dofs (reference :4962-4988)
    bsrfc = planck[-1] if planck_srfc is None else jnp.asarray(planck_srfc, ireals)
    for d in range(ntop):
        if not inward[d]:
            b = b.at[d, -1].add(
                bsrfc * (dx * dy / scheme.difftop.area_divider)
                * (1.0 - albedo2d) * PI * float(wtop[d])
            )
    return b
