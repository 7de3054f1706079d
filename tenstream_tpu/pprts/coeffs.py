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

import jax
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


def _onedee_diff_orbit(scheme: StreamScheme, orbit_idx: np.ndarray, norb: int, a11, a12):
    """The 1-D diff2diff blocks of `_onedee_blocks` in orbit-channel
    form: every top-pair orbit gets the same a11/a12 for all its group
    images (the blocks ARE orbit-consistent under the no-z-mirror
    subgroup), side channels stay zero."""
    shp = a11.shape
    inv = scheme.diff_inv_dof()
    orb = jnp.zeros((norb,) + shp, a11.dtype)
    for d in range(scheme.difftop.dof):
        orb = orb.at[int(orbit_idx[d, d])].set(a11)
        orb = orb.at[int(orbit_idx[int(inv[d]), d])].set(a12)
    return orb


def fold_thermal_emission(a11, a12, btop, bbot):
    """Fold per-layer thermal emission (btop up at each layer top, bbot
    down at each bottom, emissivity already applied) through the stack
    with the exact interface recursion of `fold_eddington_adding`.

    Returns (B_top_out, B_bot_out): the stack's net emission exiting its
    top/bottom faces — block-model exact, including in-stack scattering
    (the reference approximates this with a no-scattering schwarzschild
    integral, `src/pprts.F90:2192-2197`)."""
    def down(carry, layer):
        T, Rb, Eup, Edn = carry
        t, r, s_up, s_dn = layer
        denom = 1.0 - Rb * r
        B = (r * Edn + s_up) / denom
        A = Edn + Rb * B
        Edn2 = t * A + s_dn
        Eup2 = Eup + T * B
        T2 = T * t / denom
        Rb2 = r + t * Rb * t / denom
        return (T2, Rb2, Eup2, Edn2), None

    init = (a11[0], a12[0], btop[0], bbot[0])
    (T, Rb, Eup, Edn), _ = jax.lax.scan(
        down, init, (a11[1:], a12[1:], btop[1:], bbot[1:])
    )
    return Eup, Edn


def fold_eddington_adding(a11, a12, a13, a23, a33):
    """Fold a stack of plane-parallel layers into ONE effective layer via
    the adding method (reference `adding`, `src/pprts.F90:2125-2198`).

    Inputs are per-layer symmetric two-stream sets with leading z axis
    (K, Nx, Ny); per-layer a21 = a12 and a22 = a11 (homogeneous slabs).
    Returns the ASYMMETRIC combined set
      (Ttop, Rtop, Tbot, Rbot, rdir, sdir, tdir)
    where Ttop/Rtop act on radiation incident from the top, Tbot/Rbot
    from below, and (rdir, sdir, tdir) are the combined direct->diffuse
    up/down and direct->direct transmissions.
    """
    # Exact adding: one top-down pass tracking BOTH composite
    # reflectivities.  NB the reference recursion is approximate — it
    # uses the composite's TOP reflectivity in the interface denominator
    # where the BOTTOM one belongs (`src/pprts.F90:2146-2156`); here the
    # Schur elimination of the interior faces is exact, verified against
    # a dense two-stream chain solve (tests/test_collapse.py).
    def down(carry, layer):
        T, Rt, Rb, tdir, rdir, sdir = carry  # T = Tdn = Tup (reciprocity)
        t, r, s_up, s_dn, t_dir = layer  # per-layer a11, a12, a13, a23, a33
        denom = 1.0 - Rb * r
        # diffuse composition: composite above + symmetric layer below
        T2 = T * t / denom
        Rt2 = Rt + T * r * T / denom
        Rb2 = r + t * Rb * t / denom
        # direct-scattered sources at the interface: the new layer sees
        # direct tdir at its top; its upward source bounces between the
        # composite bottom (Rb) and the layer top (r)
        B = (r * sdir + s_up * tdir) / denom  # upward INTO the composite
        A = sdir + Rb * B  # downward onto the new layer
        sdir2 = t * A + s_dn * tdir
        rdir2 = rdir + T * B
        tdir2 = tdir * t_dir
        return (T2, Rt2, Rb2, tdir2, rdir2, sdir2), None

    init = (a11[0], a12[0], a12[0], a33[0], a13[0], a23[0])
    (T, Rtop, Rbot, tdir, rdir, sdir), _ = jax.lax.scan(
        down, init, (a11[1:], a12[1:], a13[1:], a23[1:], a33[1:])
    )
    return T, Rtop, T, Rbot, rdir, sdir, tdir


def onedee_blocks_collapsed(scheme: StreamScheme, folded):
    """Per-cell blocks of the collapsed super-layer from the asymmetric
    folded set: downward top dofs transmit Ttop / reflect Rtop, upward
    dofs Tbot / Rbot (reference writes Tbot/Rtop/Rbot/Ttop into
    a11/a12/a21/a22 of the collapsed index, `src/pprts.F90:2178-2182`).
    Returns (dir2dir, dir2diff, diff2diff) with shapes
    (nd, nd, Nx, Ny) / (nd, nf, Nx, Ny) / (nf, nf, Nx, Ny)."""
    Ttop, Rtop, Tbot, Rbot, rdir, sdir, tdir = folded
    shp = Ttop.shape
    nd, nf = scheme.ndir, scheme.ndiff
    ntd = scheme.dirtop.dof
    inward = scheme.diff_inward()
    inv = scheme.diff_inv_dof()

    dir2dir = jnp.zeros((nd, nd) + shp, Ttop.dtype)
    for t in range(ntd):
        dir2dir = dir2dir.at[t, t].set(tdir)

    wtop = scheme.difftop_weights()
    dir2diff = jnp.zeros((nd, nf) + shp, Ttop.dtype)
    for t in range(ntd):
        for d in range(scheme.difftop.dof):
            val = sdir if inward[d] else rdir
            dir2diff = dir2diff.at[t, d].set(val * float(wtop[d]))

    # (src, dst) ordering: src d transmits into dst d and reflects into
    # dst inv[d]; downward sources see Ttop/Rtop, upward ones Tbot/Rbot
    diff2diff = jnp.zeros((nf, nf) + shp, Ttop.dtype)
    for d in range(scheme.difftop.dof):
        tr = Ttop if inward[d] else Tbot
        rf = Rtop if inward[d] else Rbot
        diff2diff = diff2diff.at[d, d].set(tr)
        diff2diff = diff2diff.at[d, int(inv[d])].set(rf)
    return dir2dir, dir2diff, diff2diff


def _zslab_map(fn, inputs, nz: int, z_slab: int, out_nz=None, z_offset: int = 0):
    """Apply `fn` (slab-of-(zc,Nx,Ny)-fields -> tuple of (C.., zc,Nx,Ny)
    arrays) over z-slabs, writing into preallocated full-z buffers.

    Memory wall at BASELINE scale: one batched LUT lookup over a
    256x256x127 grid keeps 16 corner-gather temps of (B, C) rows live at
    once — 34.7 GB unpadded, 138 GB with the 128-lane padding XLA's
    gather canonicalization re-introduces (measured OOM report).  The
    fori_loop + dynamic_update_slice structure bounds the live set to
    ONE slab of temps plus the output buffers themselves.
    """
    n_full = nz // z_slab
    tail = nz - n_full * z_slab

    out0 = jax.eval_shape(fn, *[x[:z_slab] for x in inputs])
    zax = [o.ndim - 3 for o in out0]  # z is always 3rd-from-last
    # EXACT-size output buffers: padding inputs to a slab multiple and
    # slicing the outputs back kept BOTH the padded and the sliced copy
    # of every coefficient field live at the slice point — measured
    # +3.5 GB at 256^2x112 with z_slab=15 (113-prime-adjacent pad to
    # 120).  The remainder layers run as ONE separate tail call instead
    # (a second compiled instance of the lookup, zero extra buffers).
    # out_nz/z_offset let the caller allocate the FULL-z field here and
    # write the 3-D block at its final offset, so no separate restricted
    # field + embed copy ever exists.
    if out_nz is None:
        out_nz = nz
    bufs = tuple(
        jnp.zeros(o.shape[: ax] + (out_nz,) + o.shape[ax + 1:], o.dtype)
        for o, ax in zip(out0, zax)
    )

    def body(i, bufs):
        sl = [jax.lax.dynamic_slice_in_dim(x, i * z_slab, z_slab, axis=0) for x in inputs]
        outs = fn(*sl)
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(b, o, z_offset + i * z_slab, axis=ax)
            for b, o, ax in zip(bufs, outs, zax)
        )

    bufs = jax.lax.fori_loop(0, n_full, body, bufs)
    if tail:
        outs = fn(*[x[n_full * z_slab:] for x in inputs])
        bufs = tuple(
            jax.lax.dynamic_update_slice_in_dim(b, o, z_offset + n_full * z_slab, axis=ax)
            for b, o, ax in zip(bufs, outs, zax)
        )
    return bufs


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
    z_slab: int = 0,
    orbit: bool = False,
) -> Tuple[CoeffFields, Tuple[jnp.ndarray, ...]]:
    """Build the coefficient fields and the eddington coefficient set.

    z_slab > 0 evaluates the LUT lookups z-slab-wise (see `_zslab_map`)
    to bound assembly temp memory on large grids; 0 = one batched call.

    orbit=True stores diff2diff as `operators.OrbitCoeff` (one channel
    per symmetry-subgroup (src, dst) orbit, 24 instead of 100 for 3_10)
    — 4.2x less assembly write traffic and per-iteration operator read
    traffic; requires a symmetrized LUT (`opp._solver_orbit_idx`).

    Returns (CoeffFields, (a11, a12, a13, a23, a33)).
    """
    tauz, w0, aspect = optical_state(kabs, ksca, g, dz3d, dx)

    mu = sun.mu if (sun is not None and need_dir) else 1.0
    coeff_fn = eddington_coeff_zdun if use_zdun else eddington_coeff_ec
    a11, a12, a13, a23, a33 = coeff_fn(tauz, w0, g, jnp.asarray(mu, ireals))

    want_dir = bool(need_dir and sun is not None and sun.sun_up)
    nz = tauz.shape[0]

    # Static 1-D layer partition: layers flagged l1d get ANALYTIC
    # (eddington) blocks, so the expensive LUT gathers only need to run
    # on the 3-D layers.  l1d is static per compiled config (it is part
    # of the solve cache key), so when it arrives as a host array the
    # z axis is restricted before the lookups; a contiguous 3-D block
    # (the common LES case: fine layers below, coarse 1-D layers above)
    # lowers to plain slice/update-slice ops.
    idx3d = None
    if isinstance(l1d, np.ndarray) and l1d.any() and not l1d.all():
        idx3d = np.nonzero(~np.asarray(l1d, bool))[0]
    contig = idx3d is not None and idx3d.size == idx3d[-1] - idx3d[0] + 1

    def _restrict(x):
        if idx3d is None:
            return x
        if contig:
            return jax.lax.slice_in_dim(x, int(idx3d[0]), int(idx3d[-1]) + 1, axis=0)
        return jnp.take(x, jnp.asarray(idx3d), axis=0)

    def _embed(full, part, zax: int = 2):
        """Write the 3-D-layer block into the full-z analytic field."""
        if contig:
            return jax.lax.dynamic_update_slice_in_dim(full, part, int(idx3d[0]), axis=zax)
        if zax == 2:
            return full.at[:, :, jnp.asarray(idx3d)].set(part)
        return full.at[:, jnp.asarray(idx3d)].set(part)

    tz_r, w0_r, g_r, asp_r = (_restrict(x) for x in (tauz, w0, g, aspect))
    nz_r = tz_r.shape[0]

    if orbit and getattr(opp, "_solver_orbit_idx", None) is None:
        raise ValueError("orbit coefficient storage needs a symmetrized LUT")
    diff_lookup = opp.diff_coeffs_orbit if orbit else opp.diff_coeffs

    if z_slab and 0 < z_slab < nz_r:
        if want_dir:
            def lookup(tz, w, gg, asp):
                ff = diff_lookup(tz, w, gg, asp)
                dd, df = opp.dir_coeffs(
                    tz, w, gg, asp, sun.symmetry_phi, sun.theta,
                    switch_x=sun.switch_x, switch_y=sun.switch_y,
                )
                return ff, dd, df
        else:
            def lookup(tz, w, gg, asp):
                return (diff_lookup(tz, w, gg, asp),)

        if contig:
            # full-z buffers written at the 3-D offset; the (small) 1-D
            # regions get their analytic blocks computed ONLY on those
            # layers and update-sliced in place — the old
            # restricted-field + full-z-analytic + embed dance kept an
            # extra full copy of every coefficient field live (measured
            # ~3.5 GB at 256^2x112, band_chunk=2)
            z0, z1 = int(idx3d[0]), int(idx3d[-1]) + 1
            outs = _zslab_map(lookup, (tz_r, w0_r, g_r, asp_r), nz_r,
                              z_slab, out_nz=nz, z_offset=z0)
            c_ff = outs[0]
            c_dd, c_df = (outs[1], outs[2]) if want_dir else (None, None)
            ff_zax = 1 if orbit else 2
            for r0, r1 in ((0, z0), (z1, nz)):
                if r1 <= r0:
                    continue
                sl = slice(r0, r1)
                dd1, df1, ff1 = _onedee_blocks(
                    scheme, a11[sl], a12[sl], a13[sl], a23[sl], a33[sl]
                )
                if orbit:
                    oidx = opp._solver_orbit_idx
                    ff1 = _onedee_diff_orbit(
                        scheme, oidx, int(oidx.max()) + 1, a11[sl], a12[sl]
                    )
                c_ff = jax.lax.dynamic_update_slice_in_dim(c_ff, ff1, r0, axis=ff_zax)
                if want_dir:
                    c_dd = jax.lax.dynamic_update_slice_in_dim(c_dd, dd1, r0, axis=2)
                    c_df = jax.lax.dynamic_update_slice_in_dim(c_df, df1, r0, axis=2)
            if orbit:
                from tenstream_tpu.pprts.operators import OrbitCoeff

                c_ff = OrbitCoeff(c_ff, opp._solver_orbit_idx)
            return CoeffFields(c_dd, c_df, c_ff), (a11, a12, a13, a23, a33)

        outs = _zslab_map(lookup, (tz_r, w0_r, g_r, asp_r), nz_r, z_slab)
        c_ff = outs[0]
        if want_dir:
            dd, df = outs[1], outs[2]
    else:
        c_ff = diff_lookup(tz_r, w0_r, g_r, asp_r)  # (s,d,nz_r,Nx,Ny) | (norb,nz_r,Nx,Ny)
        if want_dir:
            dd, df = opp.dir_coeffs(
                tz_r, w0_r, g_r, asp_r, sun.symmetry_phi, sun.theta,
                switch_x=sun.switch_x, switch_y=sun.switch_y,
            )

    dd1, df1, ff1 = _onedee_blocks(scheme, a11, a12, a13, a23, a33)
    if orbit:
        oidx = opp._solver_orbit_idx
        ff1 = _onedee_diff_orbit(scheme, oidx, int(oidx.max()) + 1, a11, a12)
    ff_zax = 1 if orbit else 2
    if idx3d is not None:
        c_ff = _embed(ff1, c_ff, zax=ff_zax)
        c_dd = c_df = None
        if want_dir:
            c_dd = _embed(dd1, dd)
            c_df = _embed(df1, df)
    else:
        mask = jnp.asarray(l1d, bool)[None, None, :, None, None]
        mask_ff = mask[0] if orbit else mask
        c_ff = jnp.where(mask_ff, ff1, c_ff)
        c_dd = c_df = None
        if want_dir:
            c_dd = jnp.where(mask, dd1, dd)
            c_df = jnp.where(mask, df1, df)

    if orbit:
        from tenstream_tpu.pprts.operators import OrbitCoeff

        c_ff = OrbitCoeff(c_ff, opp._solver_orbit_idx)
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
