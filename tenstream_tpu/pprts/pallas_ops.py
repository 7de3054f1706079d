"""Fused Pallas kernel for the diffuse transport operator.

The plain XLA path (`operators.diffuse_scatter`) materializes the
gather -> (src,dst) einsum -> scatter chain, moving ~10x the necessary
bytes per application (rolls, stacks, and the big per-cell coefficient
field all round-trip through HBM).  The iterative diffuse solvers
apply this operator ~30x per g-point, so it dominates the solve.

This kernel fuses the chain into one pass: for every OUTPUT face dof
the producing cell and the source-face reads are static +-1 shifts
(see `operators.gather_diff_src` / `scatter_diff_dst`).  Blocks tile
the x axis with 1-cell halos (element-indexed overlapping windows),
the z axis rides the sublane dimension in full, and y-axis (lane)
shifts are `pltpu.roll`s.  HBM traffic drops to one read of the
coefficient field + one read/write of the flux field per application —
the speed-of-light for this operator.

Layout note: the kernel consumes x-major fields,
  x:     (nd, Nx+2, Nz+3, Ny)   halo-padded (periodic x, zero z)
  coeff: (nd, nd, Nx+2, Nz+2, Ny)
`prepare_coeff_pallas` builds the coefficient layout ONCE per solve;
the x padding/transpose happens per application (the flux field is
small).

Semantics are EXACTLY `scatter_diff_dst(scheme, einsum(c,
gather_diff_src(scheme, x)))` — the surface-albedo closure stays
outside (cheap 2-D op).  Verified element-exact against the XLA path
in interpret mode (tests/test_pallas_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tenstream_tpu.streams import StreamScheme


def _shift_tables(scheme: StreamScheme):
    """Static shift metadata per dof (z, x, y):
    dst dof d: producing cell = face + cshift[d];
    src dof s: face read = cell + gshift[s]."""
    axis = scheme.diff_axis()
    inward = scheme.diff_inward()
    cshift, gshift = [], []
    for d in range(scheme.ndiff):
        a, inw = int(axis[d]), bool(inward[d])
        if a == 0:
            cshift.append((-1, 0, 0) if inw else (0, 0, 0))
            gshift.append((0, 0, 0) if inw else (1, 0, 0))
        elif a == 1:
            cshift.append((0, -1, 0) if inw else (0, 0, 0))
            gshift.append((0, 0, 0) if inw else (0, 1, 0))
        else:
            cshift.append((0, 0, -1) if inw else (0, 0, 0))
            gshift.append((0, 0, 0) if inw else (0, 0, 1))
    return tuple(cshift), tuple(gshift)


def _kernel(cshift, gshift, nzp1, tx, ny, x_ref, c_ref, o_ref):
    # Contributions accumulate in CELL space over an extended window
    # (cells -1..tx-1 in x, -1..nz in z), then shift to face space per
    # dst dof.  Only f32 tensors are ever lane-rotated (Mosaic cannot
    # dynamic-rotate bf16 vectors); the bf16 coefficients are read with
    # static slices only.
    nd = len(cshift)
    xs_all = []
    for s in range(nd):
        gz, gx, gy = gshift[s]
        # x at cell+gshift over the extended cell window (d-independent)
        xs = x_ref[s, gx:gx + tx + 1, gz:gz + nzp1 + 1, :]
        if gy:
            xs = pltpu.roll(xs, (-gy) % ny, 2)
        xs_all.append(xs)
    for d in range(nd):
        dzc, dxc, dyc = cshift[d]
        acc = None
        for s in range(nd):
            cs = c_ref[s, d, 0:tx + 1, 0:nzp1 + 1, :]
            term = xs_all[s] * cs.astype(xs_all[s].dtype)
            acc = term if acc is None else acc + term
        out = acc[1 + dxc:1 + dxc + tx, 1 + dzc:1 + dzc + nzp1, :]
        if dyc:
            out = pltpu.roll(out, (-dyc) % ny, 2)
        o_ref[d] = out


def prepare_coeff_pallas(coeff: jnp.ndarray) -> jnp.ndarray:
    """(nd, nd, Nz, Nx, Ny) -> halo-padded x-major kernel layout
    (do this ONCE per solve; the field is large)."""
    c = jnp.moveaxis(coeff, 3, 2)  # (nd, nd, Nx, Nz, Ny)
    c = jnp.pad(c, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate([c[:, :, -1:], c, c[:, :, :1]], axis=2)


def _contract_kernel(groups, s_ref, c_ref, o_ref):
    """Pure per-cell orbit contraction: contrib[d] = sum over orbit
    groups of orb[o] * sum(src[s in group]).  No halos, no shifts —
    trivially partitionable blocks."""
    nd = len(groups)
    for d in range(nd):
        acc = None
        for o, ss in groups[d]:
            ssum = s_ref[ss[0]]
            for s in ss[1:]:
                ssum = ssum + s_ref[s]
            term = ssum * c_ref[o].astype(ssum.dtype)
            acc = term if acc is None else acc + term
        o_ref[d] = acc


@functools.partial(jax.jit, static_argnames=("idx_bytes", "tz", "tx", "interpret"))
def orbit_contract_pallas(
    idx_bytes: bytes,  # static (nd, nd) orbit-id table (OrbitCoeff.idx)
    orb: jnp.ndarray,  # (norb, Nz, Nx, Ny)
    src: jnp.ndarray,  # (nd, Nz, Nx, Ny) per-cell source values
    tz: int = 4,
    tx: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """contrib[d] = sum_s orb[idx[s, d]] * src[s], as one fused kernel.

    This is the hot inner contraction of the diffuse operator: the XLA
    fusion re-reads the inputs per output channel (~200 channel-reads
    per cell measured as 7.9 GB/apply at 256^2x113); here each block
    loads the 10 src + norb (24) coeff channels into VMEM ONCE and
    writes 10 — the bandwidth speed-of-light for the contraction.
    Blocks partition (z, x) with no halos (the +-1 shift handling lives
    in the XLA gather/scatter wrappers, which fuse into cheap rolls), so
    the TPU (8, 128) tiling constraints are satisfied by construction.
    """
    import numpy as np

    nd, nz, nx, ny = src.shape
    norb = orb.shape[0]
    idx = np.frombuffer(idx_bytes, np.int64).reshape(nd, nd)
    groups = []
    for d in range(nd):
        by_orbit = {}
        for s in range(nd):
            by_orbit.setdefault(int(idx[s, d]), []).append(s)
        groups.append(tuple(sorted((o, tuple(ss)) for o, ss in by_orbit.items())))
    groups = tuple(groups)

    tx = min(tx, nx)
    tz = min(tz, nz)
    kern = functools.partial(_contract_kernel, groups)
    return pl.pallas_call(
        kern,
        grid=(-(-nz // tz), -(-nx // tx)),
        in_specs=[
            pl.BlockSpec((nd, tz, tx, ny), lambda j, i: (0, j, i, 0)),
            pl.BlockSpec((norb, tz, tx, ny), lambda j, i: (0, j, i, 0)),
        ],
        out_specs=pl.BlockSpec((nd, tz, tx, ny), lambda j, i: (0, j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((nd, nz, nx, ny), src.dtype),
        interpret=interpret,
    )(src, orb)


def diffuse_apply_pallas_orbit(
    scheme: StreamScheme,
    idx_bytes: bytes,
    orb: jnp.ndarray,  # (norb, Nz, Nx, Ny) — raw OrbitCoeff channels
    x: jnp.ndarray,  # (nd, Nz+1, Nx, Ny)
    tx: int = 32,
    tz: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """S(x) with the Pallas orbit contraction: XLA gather (face->cell
    shifts, fuses to rolls/slices) -> `orbit_contract_pallas` ->
    XLA scatter (cell->face shifts)."""
    from tenstream_tpu.pprts.operators import gather_diff_src, scatter_diff_dst

    src = gather_diff_src(scheme, x)
    contrib = orbit_contract_pallas(idx_bytes, orb, src, tz=tz, tx=tx,
                                    interpret=interpret)
    return scatter_diff_dst(scheme, contrib, x.shape[1] - 1)


@functools.partial(jax.jit, static_argnames=("scheme", "tx", "interpret"))
def diffuse_apply_pallas(
    scheme: StreamScheme,
    coeff_prepared: jnp.ndarray,  # from prepare_coeff_pallas
    x: jnp.ndarray,  # (nd, Nz+1, Nx, Ny)
    tx: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    nd, nzp1, nx, ny = x.shape
    nz = nzp1 - 1
    assert nx % tx == 0, (nx, tx)
    cshift, gshift = _shift_tables(scheme)

    xp = jnp.moveaxis(x, 1, 2)  # (nd, Nx, Nz+1, Ny)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xp = jnp.concatenate([xp[:, -1:], xp, xp[:, :1]], axis=1)

    kern = functools.partial(_kernel, cshift, gshift, nzp1, tx, ny)
    out = pl.pallas_call(
        kern,
        grid=(nx // tx,),
        in_specs=[
            # Mosaic requires all dims Element or none: element-index
            # every dim (only x actually overlaps between blocks)
            pl.BlockSpec((pl.Element(nd), pl.Element(tx + 2),
                          pl.Element(nzp1 + 2), pl.Element(ny)),
                         lambda i: (0, i * tx, 0, 0)),
            pl.BlockSpec((pl.Element(nd), pl.Element(nd), pl.Element(tx + 2),
                          pl.Element(nz + 2), pl.Element(ny)),
                         lambda i: (0, 0, i * tx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nd, tx, nzp1, ny), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nd, nx, nzp1, ny), x.dtype),
        interpret=interpret,
    )(xp, coeff_prepared)
    return jnp.moveaxis(out, 1, 2)  # back to (nd, Nz+1, Nx, Ny)




# ---------------------------------------------------------------------------
# Round 5: fused A-apply kernel — A(u) = u - S(u) with the gather/scatter
# shifts, orbit contraction, surface-albedo closure, AND the BiCGStab dot
# partials all inside one pallas_call.
#
# Why: the round-3/4 finding was that the standalone orbit contraction
# kernel wins on bytes (1.47 vs 7.91 GB/apply) but LOSES in-context: the
# pallas_call boundary stops XLA from fusing the surrounding face<->cell
# shift ops and the Krylov vector ops, which then each re-materialize
# ~0.3 GB fields.  Moving the shifts (static +-1 window slices + lane
# rolls), the subtraction, the albedo row, and two reduction partials
# INTO the kernel removes those boundary losses: per apply the kernel
# reads u + orbit coeffs (24 channels, 4.2x below the dense field) + w
# and writes A(u) + two scalars — the bandwidth speed-of-light for the
# operator half of a BiCGStab iteration (VERDICT r4 item 2, the "fused
# operator+PC+axpy/dot iteration body").
#
# Layout: (Z, X, dof, Y).  Mosaic constrains a block's LAST TWO dims to
# be divisible by (8, 128) or equal to the full array dims — halo
# windows (tz+2, tx+2) can never satisfy that, so the windowed z/x dims
# ride the third/fourth-minor positions and the constrained last two
# carry (dof, Y) in FULL.  (The first fused-kernel attempt used the
# natural (dof, Z, X, Y) order and failed exactly that check on chip —
# interpret mode does not enforce it.)  The dof sublane dim pads 10->16
# for the flux fields (the 24 orbit channels tile exactly); the padding
# waste is bounded and the kernel still moves ~4x fewer bytes than the
# XLA path.  Transposes into this layout ride the per-apply pad (u) and
# the output moveaxis; the orbit field is prepared once per solve.
# ---------------------------------------------------------------------------


def pick_tile(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap."""
    for t in range(min(cap, n), 0, -1):
        if n % t == 0:
            return t
    return 1


def _fused_A_kernel(groups, cshift, gshift, alb_rows, tzf, txs, ny, jlast,
                    u_ref, c_ref, w_ref, alb_ref, o_ref, p1_ref, p2_ref):
    """One (z, x) tile of A(u) = u - S(u) plus dot partials.

    u_ref:   (tzf+2, txs+2, nd, ny)  padded faces [f0-1, f0+tzf+1) x
             padded cells [x0-1, x0+txs+1)
    c_ref:   (tzf+1, txs+1, norb, ny) cells [f0-1, f0+tzf) x [x0-1, x0+txs)
    w_ref:   (tzf, txs, nd, ny) the dot partner (rhat or s)
    alb_ref: (txs, 1, ny) surface albedo
    o_ref:   (tzf, txs, nd, ny) A(u)
    p1_ref/p2_ref: (1, 1) SMEM partials: sum(w*Au), sum(Au*Au)
    """
    nd = len(gshift)
    dn_list, up_list, w_list = alb_rows  # static albedo-closure metadata

    j = pl.program_id(0)

    # per-src cell-window values (tzf+1, txs+1, ny)
    us_all = []
    for s in range(nd):
        gz, gx, gy = gshift[s]
        us = u_ref[gz:gz + tzf + 1, gx:gx + txs + 1, s, :]
        if gy:
            us = pltpu.roll(us, (-gy) % ny, 2)
        us_all.append(us)

    # albedo closure (only the tile holding face Nz, local out row tzf-1):
    # S picks up  + albedo * w_d * sum_dn(Edn[Nz])  on each up-top dof,
    # so A(u) subtracts it.  Computed unconditionally (cheap 2-D term),
    # zero-masked on every other tile.
    edn_sfc = u_ref[tzf, 1:1 + txs, dn_list[0], :]  # face Nz when j == jlast
    for d in dn_list[1:]:
        edn_sfc = edn_sfc + u_ref[tzf, 1:1 + txs, d, :]

    p1 = jnp.float32(0.0)
    p2 = jnp.float32(0.0)
    for d in range(nd):
        acc = None
        for o, ss in groups[d]:
            ssum = us_all[ss[0]]
            for s in ss[1:]:
                ssum = ssum + us_all[s]
            term = ssum * c_ref[0:tzf + 1, 0:txs + 1, o, :].astype(ssum.dtype)
            acc = term if acc is None else acc + term
        cz, cx, cy = cshift[d]
        out = acc[1 + cz:1 + cz + tzf, 1 + cx:1 + cx + txs, :]
        if cy:
            out = pltpu.roll(out, (-cy) % ny, 2)
        Au = u_ref[1:1 + tzf, 1:1 + txs, d, :] - out
        if d in up_list:
            wd_alb = w_list[up_list.index(d)]
            mask = jnp.where(j == jlast, jnp.float32(wd_alb), 0.0)
            alb_term = mask * alb_ref[:, 0, :] * edn_sfc  # (txs, ny)
            # row-mask add: Mosaic has no scatter-add lowering for
            # Au.at[row].add(...)
            row = jax.lax.broadcasted_iota(jnp.int32, (tzf, 1, 1), 0)
            rowm = (row == (tzf - 1)).astype(Au.dtype)
            Au = Au - rowm * alb_term[None, :, :]
        o_ref[:, :, d, :] = Au
        p1 = p1 + jnp.sum(w_ref[:, :, d, :] * Au)
        p2 = p2 + jnp.sum(Au * Au)
    # whole-array SMEM outputs with per-tile dynamic stores: blocked
    # (1, 1) SMEM specs trip Mosaic's last-two-dims constraint
    i = pl.program_id(1)
    p1_ref[j, i] = p1
    p2_ref[j, i] = p2


def prepare_orbit_fused(orb: jnp.ndarray) -> jnp.ndarray:
    """(norb, Nz, Nx, Ny) -> (Nz+2, Nx+2, norb, Ny): channel-third
    kernel layout with zero z-cell halos and periodic-wrap x halos.
    Once per solve."""
    c = jnp.moveaxis(orb, 0, 2)  # (Nz, Nx, norb, Ny)
    c = jnp.pad(c, ((1, 1), (0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([c[:, -1:], c, c[:, :1]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("idx_bytes", "scheme", "tzf", "txs", "interpret"),
)
def fused_A_dots(
    scheme: StreamScheme,
    idx_bytes: bytes,
    orb_prepared: jnp.ndarray,  # from prepare_orbit_fused
    u: jnp.ndarray,  # (nd, Nz+1, Nx, Ny)
    w: jnp.ndarray,  # (nd, Nz+1, Nx, Ny) dot partner
    albedo2d: jnp.ndarray,  # (Nx, Ny)
    tzf: int = 0,
    txs: int = 0,
    interpret: bool = False,
):
    """Returns (A(u), dot(w, A(u)), dot(A(u), A(u))) in one fused pass.

    Semantics EXACTLY match `x - diffuse_scatter(scheme, coeff, x,
    albedo2d)` with orbit-stored coeffs plus jnp.vdot for the dots
    (tests/test_pallas_ops.py, element-exact in interpret mode).
    """
    import numpy as np

    nd, nzp1, nx, ny = u.shape
    norb = orb_prepared.shape[2]
    idx = np.frombuffer(idx_bytes, np.int64).reshape(nd, nd)
    groups = []
    for d in range(nd):
        by_orbit = {}
        for s in range(nd):
            by_orbit.setdefault(int(idx[s, d]), []).append(s)
        groups.append(tuple(sorted((o, tuple(ss)) for o, ss in by_orbit.items())))
    groups = tuple(groups)
    cshift, gshift = _shift_tables(scheme)

    # static albedo-closure metadata: the downward top dofs feeding the
    # surface, and the up-top dofs with their hemisphere weights
    inward = scheme.diff_inward()
    ntop = scheme.difftop.dof
    wtop = scheme.difftop_weights()
    dns = tuple(d for d in range(ntop) if inward[d])
    ups = tuple(d for d in range(ntop) if not inward[d])
    wts = tuple(float(wtop[d]) for d in ups)
    alb_rows = (dns, ups, wts)

    if tzf <= 0:
        tzf = pick_tile(nzp1, 8)
    if txs <= 0:
        txs = pick_tile(nx, 8)
    assert nzp1 % tzf == 0 and nx % txs == 0, (nzp1, tzf, nx, txs)
    gz, gx = nzp1 // tzf, nx // txs
    jlast = gz - 1  # face Nz lives in the last z tile at local row tzf-1

    # per-apply prep: channel-third layout + zero z halos + periodic x
    # halos (one fused transpose+pad); w transposes without halos
    up_ = jnp.moveaxis(u, 0, 2)  # (Nz+1, Nx, nd, Ny)
    up_ = jnp.pad(up_, ((1, 1), (0, 0), (0, 0), (0, 0)))
    up_ = jnp.concatenate([up_[:, -1:], up_, up_[:, :1]], axis=1)
    wt_ = jnp.moveaxis(w, 0, 2)
    alb3 = albedo2d[:, None, :]  # (Nx, 1, Ny): keeps the last-two-dims
    # Mosaic constraint satisfied for any txs (block (txs, 1, ny))

    kern = functools.partial(_fused_A_kernel, groups, cshift, gshift,
                             alb_rows, tzf, txs, ny, jlast)
    Au, p1, p2 = pl.pallas_call(
        kern,
        grid=(gz, gx),
        in_specs=[
            pl.BlockSpec((pl.Element(tzf + 2), pl.Element(txs + 2),
                          pl.Element(nd), pl.Element(ny)),
                         lambda j, i: (j * tzf, i * txs, 0, 0)),
            pl.BlockSpec((pl.Element(tzf + 1), pl.Element(txs + 1),
                          pl.Element(norb), pl.Element(ny)),
                         lambda j, i: (j * tzf, i * txs, 0, 0)),
            pl.BlockSpec((tzf, txs, nd, ny), lambda j, i: (j, i, 0, 0)),
            pl.BlockSpec((txs, 1, ny), lambda j, i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tzf, txs, nd, ny), lambda j, i: (j, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nzp1, nx, nd, ny), u.dtype),
            jax.ShapeDtypeStruct((gz, gx), jnp.float32),
            jax.ShapeDtypeStruct((gz, gx), jnp.float32),
        ],
        interpret=interpret,
    )(up_, orb_prepared, wt_, alb3)
    return jnp.moveaxis(Au, 2, 0), jnp.sum(p1), jnp.sum(p2)
