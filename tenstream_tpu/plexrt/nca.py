"""Neighbouring Column Approximation (NCA) for triangle columns.

Parity: reference `plexrt/nca_multi_tri.F90` (Klinger & Mayer 2019) —
a thermal-only post-process that replaces the 1-D heating rates of a
wedge-column solve with 3-D-corrected ones built from the fluxes of the
three side-neighbouring columns and the cells above/below.  The driver
semantics mirror `plexrt/plexrt_external_solvers.F90:compute_nca` (the
per-cell geometry/flux gathering around `plexrt_nca`, :560-760).

Scientific data: Carolin Klinger's emissivity/correction tables
(`misc/nca_data.nc` in the reference tree), re-packed by
`tools/extract_nca.py` into `data/nca/nca_tables.npz`.

TPU-first redesign: the reference visits one cell at a time through
DMPlex cone/support walks; here every (layer, cell) computes at once —
neighbour access is ONE gather through the TriMesh index table and the
table lookups are batched clamped-bilinear interpolations.  The
reference's hand-rolled edge-case ladder in `interpol_emis` /
`interpol_2d` (nca_multi_tri.F90:384-535) is exactly clamped bilinear
interpolation plus a thin-optical-depth analytic limit; we implement
that directly (documented deviation: the reference holds the nearest
row constant in a few out-of-range corners instead of clamping the
query — the tables are clamped consistently here).

Weight/correction fit constants (the `atan` fits in
`determine_weights` / `Absside`, nca_multi_tri.F90:345-376) are the
published parameterization — the formulas ARE the component.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import PI, ireals
from tenstream_tpu.ops.interp import fractional_index

# height of the unit equilateral triangle: hc = H * edge
_H = 0.86603

_DEFAULT_TABLE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "data", "nca", "nca_tables.npz"
)


@dataclass(frozen=True)
class NcaTables:
    """Device-resident NCA lookup tables, [tau_hx/var1, tau_z/var2] order.

    The npz (C-order, from the reference's netCDF) stores 2-D tables as
    (second-Fortran-index, first-Fortran-index); the constructor
    transposes so eps tables index as [tau_hx, tau_z] and corr tables
    as [aspect(var_1), tau(var_2)] — matching `eps_tab(ix, iy)` in
    `nca_multi_tri.F90:430`.
    """

    eps_top: jnp.ndarray  # (n_tau_hx, n_tau_z)
    eps_side: jnp.ndarray
    corr_top: jnp.ndarray  # (n_var1=aspect, n_var2=tau)
    corr_side: jnp.ndarray
    tau_hx: jnp.ndarray
    tau_z: jnp.ndarray
    var_1: jnp.ndarray  # aspect axis
    var_2: jnp.ndarray  # tau axis

    @classmethod
    def load(cls, path: str = _DEFAULT_TABLE_PATH) -> "NcaTables":
        d = np.load(path)
        as_f = lambda k: jnp.asarray(d[k], ireals)
        return cls(
            eps_top=as_f("eps_top").T,
            eps_side=as_f("eps_side").T,
            corr_top=as_f("corr_top").T,
            corr_side=as_f("corr_side").T,
            tau_hx=as_f("tau_hx"),
            tau_z=as_f("tau_z"),
            var_1=as_f("var_1"),
            var_2=as_f("var_2"),
        )


def _bilinear(tab, ax0, ax1, x0, x1):
    """Clamped bilinear lookup of tab[(ax0), (ax1)] at (x0, x1)."""
    f0 = fractional_index(ax0, x0)
    f1 = fractional_index(ax1, x1)
    i0 = jnp.clip(jnp.floor(f0), 0, ax0.shape[0] - 2).astype(jnp.int32)
    i1 = jnp.clip(jnp.floor(f1), 0, ax1.shape[0] - 2).astype(jnp.int32)
    w0 = f0 - i0
    w1 = f1 - i1
    t00 = tab[i0, i1]
    t10 = tab[i0 + 1, i1]
    t01 = tab[i0, i1 + 1]
    t11 = tab[i0 + 1, i1 + 1]
    return (
        t00 * (1 - w0) * (1 - w1)
        + t10 * w0 * (1 - w1)
        + t01 * (1 - w0) * w1
        + t11 * w0 * w1
    )


def interpol_emis(tables: NcaTables, tauhx, tauz, side: bool):
    """Face emissivity (reference `interpol_emis`, nca_multi_tri.F90:384).

    Below the table range the analytic thin limit 1 - exp(-min(tau))
    applies; inside/above it is clamped bilinear, capped at 1 (the
    tables carry MC noise in the thick limit)."""
    tab = tables.eps_side if side else tables.eps_top
    emis = _bilinear(tab, tables.tau_hx, tables.tau_z, tauhx, tauz)
    thin = 1.0 - jnp.exp(-jnp.minimum(tauz, tauhx))
    below = jnp.logical_or(tauhx < tables.tau_hx[0], tauz < tables.tau_z[0])
    return jnp.minimum(jnp.where(below, thin, emis), 1.0)


def interpol_corr(tables: NcaTables, asp, tau, side: bool):
    """Correction factor (reference `interpol_2d`, nca_multi_tri.F90:464)."""
    tab = tables.corr_side if side else tables.corr_top
    return _bilinear(tab, tables.var_1, tables.var_2, asp, tau)


def _determine_weights(dz, hc, kabs_nb):
    """Top/bottom-face flux blend weights (nca_multi_tri.F90:345-362).

    w1 weights the side-column fluxes, w2 = 1 - w1 the own-column flux;
    kabs_nb is the absorption of the vertically adjacent cell."""
    asp = jnp.clip(dz / hc, 0.1, 10.0)
    wa = jnp.arctan(asp * 1.29) * (-0.75) + 1.21
    wb = asp**0.027 * (-7.98) + asp * (-0.01) + jnp.arctan(asp * 0.11) + 7.36
    wc = asp**0.49 * 1.46 + asp * (-0.25) + jnp.arctan(asp * (-0.29)) - 0.12
    w1 = jnp.arctan(kabs_nb * dz * wa) * wb + wc
    return w1, 1.0 - w1


def _side_split(kabs_s, dz, dx_s):
    """Blend of entry-level vs exit-level flux on a side face
    (nca_multi_tri.F90:364-376, `Absside` f1/f2)."""
    f1 = jnp.arctan(kabs_s * dz * (-2.08 / (dz / dx_s))) * 0.31192 + 0.49
    f1 = jnp.maximum(f1, 0.0)
    return f1, 1.0 - f1


def nca_heating_rate(
    tables: NcaTables,
    # geometry (broadcastable against the flux fields)
    dx_s,  # (..., 3) side edge lengths [m]
    dz,  # layer thickness [m]
    atop,
    abot,  # top/bottom face areas [m^2]
    area_s,  # (..., 3) side face areas [m^2]
    vol,  # cell volume [m^3]
    # own column
    kabs,
    kabs_top,
    kabs_bot,  # [1/m] cell / cell-above / cell-below
    edn_top,
    eup_bot,  # fluxes through own top/bottom faces [W/m^2]
    b_top,
    b_bot,  # Planck RADIANCE at top/bottom faces [W/m^2/sr]
    # side neighbours, trailing axis = side
    kabs_s,  # (..., 3)
    edn_top_s,
    eup_top_s,
    edn_bot_s,
    eup_bot_s,  # (..., 3) [W/m^2]
):
    """Vectorized `plexrt_nca` (nca_multi_tri.F90:161-377): the 3-D
    thermal heating rate of every cell, [W/m^3].

    Works in flux units throughout: the reference converts fluxes to
    radiance (/pi) and scales the result back (*pi); with Planck given
    as radiance the two factors land on the emission terms as pi*B."""
    dxm = jnp.sum(dx_s, axis=-1) / 3.0
    b_layer = PI * (b_top + b_bot) / 2.0  # isotropic emission flux

    tauz = kabs * dz

    # face emissivities + correction factors
    hc_top = 2.0 * atop / dxm
    asp_top = jnp.clip(dz / hc_top, 0.11, 11.0)
    tauhx_m = kabs * dxm * _H
    eps_top = interpol_emis(tables, tauhx_m, tauz, side=False)
    f_top = interpol_corr(tables, asp_top, tauz, side=False)

    hc_bot = 2.0 * abot / dxm
    asp_bot = jnp.clip(dz / hc_bot, 0.11, 11.0)
    eps_bot = interpol_emis(tables, tauhx_m, tauz, side=False)
    f_bot = interpol_corr(tables, asp_bot, tauz, side=False)

    tauhx_s = kabs[..., None] * dx_s * _H  # (..., 3)
    eps_s = interpol_emis(tables, tauhx_s, tauz[..., None], side=True)
    # reference uses the BOTTOM aspect for the side correction (the
    # in-scope `asp` at nca_multi_tri.F90:277 is the abot one)
    f_s = interpol_corr(tables, asp_bot[..., None], tauhx_s, side=True)

    # ---- downwelling ------------------------------------------------
    w1, w2 = _determine_weights(dz, hc_top, kabs_top)
    l_dn = w1 * jnp.sum(edn_top_s, -1) / 3.0 + w2 * edn_top
    abs_dn = l_dn * atop * eps_top * f_top
    em_dn = -b_layer * atop * eps_top * f_top

    # side fields carry a trailing side axis: align dz explicitly
    f1, f2 = _side_split(kabs_s, dz[..., None], dx_s)
    gain_s = area_s * eps_s * f_s
    abs_dns = jnp.sum((f1 * edn_top_s + f2 * edn_bot_s) * gain_s, -1)
    em_dns = jnp.sum(-b_layer[..., None] * gain_s, -1)

    # ---- upwelling --------------------------------------------------
    w1, w2 = _determine_weights(dz, hc_bot, kabs_bot)
    l_up = w1 * jnp.sum(eup_bot_s, -1) / 3.0 + w2 * eup_bot
    abs_up = l_up * abot * eps_bot * f_bot
    em_up = -b_layer * abot * eps_bot * f_bot

    abs_ups = jnp.sum((f1 * eup_bot_s + f2 * eup_top_s) * gain_s, -1)
    em_ups = jnp.sum(-b_layer[..., None] * gain_s, -1)

    return (
        abs_up + em_up + abs_dn + em_dn
        + (abs_ups + em_ups + abs_dns + em_dns) / 2.0
    ) / vol


def nca_icon(mesh, dz, kabs, planck, edn, eup, tables: NcaTables | None = None):
    """NCA absorption for a TriMesh wedge column stack, [W/m^3].

    Parity: the cell/flux gathering of `compute_nca`
    (plexrt/plexrt_external_solvers.F90:560-760); vertical neighbours
    fall back to the own cell at TOA/surface, side neighbours at open
    boundaries (reference `get_neigh_face_info`).

    Args:
      mesh: `plexrt.icon.TriMesh`.
      dz: scalar or (nz,) layer thickness, TOA -> surface.
      kabs: (nz, nc) absorption [1/m].
      planck: (nz+1, nc) Planck radiance at levels [W/m^2/sr].
      edn, eup: (nz+1, nc) diffuse fluxes at levels [W/m^2].
    """
    if tables is None:
        tables = NcaTables.load()
    kabs = jnp.asarray(kabs, ireals)
    planck = jnp.asarray(planck, ireals)
    edn = jnp.asarray(edn, ireals)
    eup = jnp.asarray(eup, ireals)
    nz, nc = kabs.shape
    dzc = jnp.broadcast_to(jnp.asarray(dz, ireals).reshape(-1), (nz,))[:, None]

    own = np.arange(mesh.ncell)[:, None]
    nbr_eff = jnp.asarray(np.where(mesh.nbr >= 0, mesh.nbr, own))  # (nc, 3)

    gather = lambda fld: jnp.take(fld, nbr_eff, axis=-1)  # (nz*, nc, 3)

    kabs_top = jnp.concatenate([kabs[:1], kabs[:-1]], axis=0)
    kabs_bot = jnp.concatenate([kabs[1:], kabs[-1:]], axis=0)

    dx_s = jnp.asarray(mesh.side_len, ireals)[None]  # (1, nc, 3)
    area = jnp.asarray(mesh.area, ireals)[None]  # (1, nc)
    area_s = dx_s * dzc[..., None]
    vol = area * dzc

    return nca_heating_rate(
        tables,
        dx_s, dzc, area, area, area_s, vol,
        kabs, kabs_top, kabs_bot,
        edn[:-1], eup[1:],
        planck[:-1], planck[1:],
        gather(kabs), gather(edn[:-1]), gather(eup[:-1]),
        gather(edn[1:]), gather(eup[1:]),
    )


def nca_structured(grid, kabs, planck, edn, eup, tables: NcaTables | None = None):
    """NCA absorption on the structured fish-mesh wedge grid, [W/m^3].

    Same physics as `nca_icon`; side-neighbour access is the structured
    mesh's periodic roll exchange (T0(i,j) side s <-> T1(i+di, j+dj)
    side s, `plexrt.mesh.SIDE_OFFSETS`) instead of a gather table.

    Args:
      grid: `plexrt.mesh.PlexGrid`.
      kabs: (nz, 2, nx, ny); planck/edn/eup: (nz+1, 2, nx, ny)
            [radiance / W/m^2].
    """
    from tenstream_tpu.plexrt.mesh import SIDE_OFFSETS

    if tables is None:
        tables = NcaTables.load()
    kabs = jnp.asarray(kabs, ireals)
    planck = jnp.asarray(planck, ireals)
    edn = jnp.asarray(edn, ireals)
    eup = jnp.asarray(eup, ireals)
    nz = kabs.shape[0]
    dzc = jnp.asarray(grid.dz, ireals)[:, None, None, None]

    def _roll2(a, di, dj):
        if di:
            a = jnp.roll(a, di, axis=-2)
        if dj:
            a = jnp.roll(a, dj, axis=-1)
        return a

    def gather(fld):  # (nz*, 2, nx, ny) -> (nz*, 2, nx, ny, 3)
        outs = []
        for s, (di, dj) in enumerate(SIDE_OFFSETS):
            # T0(i,j)'s side-s partner is T1(i+di, j+dj) and vice versa
            nb0 = _roll2(fld[:, 1], -di, -dj)
            nb1 = _roll2(fld[:, 0], di, dj)
            outs.append(jnp.stack([nb0, nb1], axis=1))
        return jnp.stack(outs, axis=-1)

    kabs_top = jnp.concatenate([kabs[:1], kabs[:-1]], axis=0)
    kabs_bot = jnp.concatenate([kabs[1:], kabs[-1:]], axis=0)

    dx_s = jnp.asarray(grid.side_lengths, ireals).reshape(1, 1, 1, 1, 3)
    area = jnp.asarray(grid.area_tri, ireals)
    area_s = dx_s * dzc[..., None]
    vol = area * dzc

    return nca_heating_rate(
        tables,
        dx_s, dzc, area, area, area_s, vol,
        kabs, kabs_top, kabs_bot,
        edn[:-1], eup[1:],
        planck[:-1], planck[1:],
        gather(kabs), gather(edn[:-1]), gather(eup[:-1]),
        gather(edn[1:]), gather(eup[1:]),
    )
