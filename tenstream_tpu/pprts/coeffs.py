"""Per-cell transfer-coefficient field assembly.

Parity: reference `alloc_coeff_dir2dir/dir2diff/diff2diff`
(`src/pprts.F90:3088-3680`) — for every 3-D cell, interpolate the LUT at
(tauz, w0, aspect, g, phi, theta) into dense (src, dst) blocks; layers
flagged 1-D (aspect >= twostr_ratio, `determine_1d_layers`,
`src/pprts.F90:649`) instead get analytic delta-Eddington blocks
(`src/optprop.F90:455-459` and the l1d branches of the explicit sweep,
`src/pprts_explicit.F90:383-390,892-903`).

TPU-first: the whole grid interpolates in one batched call; the 1-D
fallback is blended in with a `where` mask on the z-layer axis, so the
downstream solvers have NO 1-D special case at all — the physics lives
entirely in the coefficients.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals
from tenstream_tpu.ops.eddington import eddington_coeff_ec, eddington_coeff_zdun
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.pprts.sun import SunInfo
from tenstream_tpu.streams import StreamScheme


class CoeffFields(NamedTuple):
    dir2dir: Optional[jnp.ndarray]  # (ndir, ndir, Nz, Nx, Ny)
    dir2diff: Optional[jnp.ndarray]  # (ndir, ndiff, Nz, Nx, Ny)
    diff2diff: jnp.ndarray  # (ndiff, ndiff, Nz, Nx, Ny)


def optical_state(kabs, ksca, g, dz3d, dx):
    """(tauz, w0, aspect) per cell (reference `get_coeff` dispatch,
    `src/pprts_base.F90:1516-1533`)."""
    kext = kabs + ksca
    tauz = kext * dz3d
    w0 = ksca / jnp.maximum(kext, jnp.finfo(ireals).tiny)
    aspect = dz3d / dx
    return tauz, w0, aspect


def _onedee_blocks(scheme: StreamScheme, a11, a12, a13, a23, a33):
    """Analytic per-cell blocks for 1-D (plane-parallel) layers.

    Shapes of a..: (Nz, Nx, Ny).  Returns (dir2dir, dir2diff, diff2diff)
    with stream dims leading.
    """
    shp = a11.shape
    nd, nf = scheme.ndir, scheme.ndiff
    ntd = scheme.dirtop.dof
    inward = scheme.diff_inward()
    inv = scheme.diff_inv_dof()

    dir2dir = jnp.zeros((nd, nd) + shp, a11.dtype)
    for t in range(ntd):
        dir2dir = dir2dir.at[t, t].set(a33)

    wtop = scheme.difftop_weights()
    dir2diff = jnp.zeros((nd, nf) + shp, a11.dtype)
    for t in range(ntd):
        for d in range(scheme.difftop.dof):
            val = a23 if inward[d] else a13
            dir2diff = dir2diff.at[t, d].set(val * float(wtop[d]))

    diff2diff = jnp.zeros((nf, nf) + shp, a11.dtype)
    for d in range(scheme.difftop.dof):
        diff2diff = diff2diff.at[d, d].set(a11)
        diff2diff = diff2diff.at[int(inv[d]), d].set(a12)
    return dir2dir, dir2diff, diff2diff


def assemble_coeffs(
    scheme: StreamScheme,
    opp: OptProp,
    kabs,
    ksca,
    g,
    dz3d,
    dx: float,
    l1d: jnp.ndarray,  # (Nz,) bool
    sun: Optional[SunInfo],
    need_dir: bool,
    use_zdun: bool = False,
) -> Tuple[CoeffFields, Tuple[jnp.ndarray, ...]]:
    """Build the coefficient fields and the eddington coefficient set.

    Returns (CoeffFields, (a11, a12, a13, a23, a33)).
    """
    tauz, w0, aspect = optical_state(kabs, ksca, g, dz3d, dx)

    mu = sun.mu if (sun is not None and need_dir) else 1.0
    coeff_fn = eddington_coeff_zdun if use_zdun else eddington_coeff_ec
    a11, a12, a13, a23, a33 = coeff_fn(tauz, w0, g, jnp.asarray(mu, ireals))

    c_ff = opp.diff_coeffs(tauz, w0, g, aspect)  # (s,d,Nz,Nx,Ny) — streams lead

    dd1, df1, ff1 = _onedee_blocks(scheme, a11, a12, a13, a23, a33)
    mask = jnp.asarray(l1d, bool)[None, None, :, None, None]
    c_ff = jnp.where(mask, ff1, c_ff)

    c_dd = c_df = None
    if need_dir and sun is not None and sun.sun_up:
        dd, df = opp.dir_coeffs(
            tauz,
            w0,
            g,
            aspect,
            sun.symmetry_phi,
            sun.theta,
            switch_x=sun.switch_x,
            switch_y=sun.switch_y,
        )
        c_dd = jnp.where(mask, dd1, dd)
        c_df = jnp.where(mask, df1, df)

    return CoeffFields(c_dd, c_df, c_ff), (a11, a12, a13, a23, a33)


def determine_1d_layers(dz3d, dx: float, twostr_ratio: float) -> jnp.ndarray:
    """Layers whose aspect ratio exceeds the threshold solve 1-D.

    Parity: `determine_1d_layers` (`src/pprts.F90:649`), default
    twostr_ratio = 2 (`src/tenstream_options.F90:102`).  Reduced over the
    horizontal: a layer is 1-D only if every column agrees (the reference
    decides per layer from the max aspect).
    """
    aspect = dz3d / dx
    return jnp.max(aspect, axis=(1, 2)) >= twostr_ratio
