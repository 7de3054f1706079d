"""Absorption (flux divergence) computation.

Parity: reference `calc_flx_div` (`src/pprts.F90:5152-5509`).  Default is
absorption by COEFFICIENT divergence: every unit of power entering a cell
that is not re-emitted through any (src -> dst) coefficient was absorbed:
    abso = sum_src  e_src * (1 - sum_dst c[src, dst])
For thermal solves the emitted source power is subtracted.  1-D layers
use the Beer-Lambert form for the direct part (reference :5303-5310).
Finally scaled by 1/cell volume (`gen_abso_scalevec_arr`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from tenstream_tpu.core.types import ireals
from tenstream_tpu.pprts.coeffs import CoeffFields
from tenstream_tpu.pprts.operators import gather_diff_src, gather_dir_src
from tenstream_tpu.pprts.sun import SunInfo
from tenstream_tpu.streams import StreamScheme


def gather_diff_dst(scheme: StreamScheme, b: jnp.ndarray) -> jnp.ndarray:
    """Per-cell view of what each cell deposited at its dst faces —
    the inverse of `scatter_diff_dst` (used to subtract thermal sources,
    reference :5380-5409)."""
    axis = scheme.diff_axis()
    inward = scheme.diff_inward()
    rows = []
    for d in range(scheme.ndiff):
        v = b[d]
        if axis[d] == 0:
            rows.append(v[1:] if inward[d] else v[:-1])
        elif axis[d] == 1:
            rows.append(jnp.roll(v[:-1], -1, axis=1) if inward[d] else v[:-1])
        else:
            rows.append(jnp.roll(v[:-1], -1, axis=2) if inward[d] else v[:-1])
    return jnp.stack(rows, axis=0)


def calc_flx_div(
    scheme: StreamScheme,
    coeffs: CoeffFields,
    ediff: jnp.ndarray,  # [W]
    volumes: jnp.ndarray,  # (Nz, Nx, Ny)
    l1d: jnp.ndarray,
    kabs: jnp.ndarray,
    dz3d: jnp.ndarray,
    a11: jnp.ndarray,
    a12: jnp.ndarray,
    sun: Optional[SunInfo] = None,
    edir: Optional[jnp.ndarray] = None,  # [W]
    b_thermal: Optional[jnp.ndarray] = None,  # [W]
    cdiv_dir: Optional[jnp.ndarray] = None,  # (ndir, Nz, Nx, Ny)
) -> jnp.ndarray:
    """Absorbed power per cell / volume -> [W/m3].

    `cdiv_dir` is the per-source direct coefficient divergence
    1 - sum_dst(dir2dir) - sum_dst(dir2diff), REDUCED before the diffuse
    iteration: passing it (ndir channels) instead of reading
    coeffs.dir2dir/dir2diff here keeps the full (ndir x (ndir+ndiff))
    fields from staying live across the whole diffuse while-loop —
    2.3 GB of the BASELINE-scale (256^2x113, band_chunk=2) peak.
    """
    l1d_mask = jnp.asarray(l1d, bool)[:, None, None]
    abso = jnp.zeros(volumes.shape, ireals)

    if edir is not None and (cdiv_dir is not None or coeffs.dir2dir is not None):
        src = gather_dir_src(scheme, edir, sun.xinc, sun.yinc)
        cdiv = cdiv_dir if cdiv_dir is not None else jnp.clip(
            1.0
            - coeffs.dir2dir.astype(ireals).sum(axis=1)
            - coeffs.dir2diff.astype(ireals).sum(axis=1),
            0.0,
            1.0,
        )
        # 1-D layers: Beer-Lambert absorption of the direct beam for the
        # top streams (reference :5303-5310), side streams carry nothing.
        mu = jnp.maximum(jnp.asarray(sun.mu, ireals), 1e-6)
        bl = -jnp.expm1(-kabs * dz3d / mu)
        ntd = scheme.dirtop.dof
        cdiv_1d = jnp.concatenate(
            [
                jnp.broadcast_to(bl[None], (ntd,) + bl.shape),
                jnp.zeros((scheme.ndir - ntd,) + bl.shape, ireals),
            ],
            axis=0,
        )
        cdiv = jnp.where(l1d_mask[None], cdiv_1d, cdiv)
        abso = abso + jnp.einsum("skij,skij->kij", src, cdiv)

    src = gather_diff_src(scheme, ediff)
    from tenstream_tpu.pprts.operators import diff_dst_sums

    cdiv = jnp.clip(1.0 - diff_dst_sums(coeffs.diff2diff, ireals), 0.0, 1.0)
    # 1-D layers: cdiv = 1 - a11 - a12 for top streams, zero for sides
    ntop = scheme.difftop.dof
    cdiv_1d_top = jnp.clip(1.0 - a11 - a12, 0.0, 1.0)
    cdiv_1d = jnp.concatenate(
        [
            jnp.broadcast_to(cdiv_1d_top[None], (ntop,) + cdiv_1d_top.shape),
            jnp.zeros((scheme.ndiff - ntop,) + cdiv_1d_top.shape, ireals),
        ],
        axis=0,
    )
    cdiv = jnp.where(l1d_mask[None], cdiv_1d, cdiv)
    abso = abso + jnp.einsum("skij,skij->kij", src, cdiv)

    if b_thermal is not None:
        emitted = gather_diff_dst(scheme, b_thermal).sum(axis=0)
        abso = abso - emitted

    return abso / volumes
