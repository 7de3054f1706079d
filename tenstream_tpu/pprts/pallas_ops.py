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


def _orbit_kernel(cshift, gshift, groups, nzp1, tx, ny, x_ref, c_ref, o_ref):
    """Orbit-channel variant of `_kernel`: the coefficient block holds
    only the `norb` (24 for 3_10) symmetry-orbit channels instead of the
    dense nd^2 (100) field, cutting the kernel's HBM traffic from
    ~480 B/cell to ~176 B/cell per application — the bandwidth
    speed-of-light for this operator (reads: 10 flux + 24 coeff
    channels; writes: 10).  `groups[d]` is the static
    (orbit -> source list) map; sources sharing an orbit for the same
    destination are summed BEFORE the multiply (same algebra as
    `operators._orbit_contrib`)."""
    nd = len(cshift)
    xs_all = []
    for s in range(nd):
        gz, gx, gy = gshift[s]
        xs = x_ref[s, gx:gx + tx + 1, gz:gz + nzp1 + 1, :]
        if gy:
            xs = pltpu.roll(xs, (-gy) % ny, 2)
        xs_all.append(xs)
    for d in range(nd):
        dzc, dxc, dyc = cshift[d]
        acc = None
        for o, ss in groups[d]:
            ssum = xs_all[ss[0]]
            for s in ss[1:]:
                ssum = ssum + xs_all[s]
            cs = c_ref[o, 0:tx + 1, 0:nzp1 + 1, :]
            term = ssum * cs.astype(ssum.dtype)
            acc = term if acc is None else acc + term
        out = acc[1 + dxc:1 + dxc + tx, 1 + dzc:1 + dzc + nzp1, :]
        if dyc:
            out = pltpu.roll(out, (-dyc) % ny, 2)
        o_ref[d] = out


def prepare_orbit_coeff_pallas(orb: jnp.ndarray) -> jnp.ndarray:
    """(norb, Nz, Nx, Ny) orbit channels -> halo-padded x-major layout."""
    c = jnp.moveaxis(orb, 2, 1)  # (norb, Nx, Nz, Ny)
    c = jnp.pad(c, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate([c[:, -1:], c, c[:, :1]], axis=1)


@functools.partial(jax.jit, static_argnames=("scheme", "idx_bytes", "tx", "interpret"))
def diffuse_apply_pallas_orbit(
    scheme: StreamScheme,
    idx_bytes: bytes,  # static (nd, nd) orbit-id table (OrbitCoeff.idx)
    coeff_prepared: jnp.ndarray,  # from prepare_orbit_coeff_pallas
    x: jnp.ndarray,  # (nd, Nz+1, Nx, Ny)
    tx: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    import numpy as np

    nd, nzp1, nx, ny = x.shape
    nz = nzp1 - 1
    norb = coeff_prepared.shape[0]
    assert nx % tx == 0, (nx, tx)
    idx = np.frombuffer(idx_bytes, np.int64).reshape(nd, nd)
    cshift, gshift = _shift_tables(scheme)
    groups = []
    for d in range(nd):
        by_orbit = {}
        for s in range(nd):
            by_orbit.setdefault(int(idx[s, d]), []).append(s)
        groups.append(tuple(sorted((o, tuple(ss)) for o, ss in by_orbit.items())))
    groups = tuple(groups)

    xp = jnp.moveaxis(x, 1, 2)  # (nd, Nx, Nz+1, Ny)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xp = jnp.concatenate([xp[:, -1:], xp, xp[:, :1]], axis=1)

    kern = functools.partial(_orbit_kernel, cshift, gshift, groups, nzp1, tx, ny)
    out = pl.pallas_call(
        kern,
        grid=(nx // tx,),
        in_specs=[
            pl.BlockSpec((pl.Element(nd), pl.Element(tx + 2),
                          pl.Element(nzp1 + 2), pl.Element(ny)),
                         lambda i: (0, i * tx, 0, 0)),
            pl.BlockSpec((pl.Element(norb), pl.Element(tx + 2),
                          pl.Element(nz + 2), pl.Element(ny)),
                         lambda i: (0, i * tx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nd, tx, nzp1, ny), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nd, nx, nzp1, ny), x.dtype),
        interpret=interpret,
    )(xp, coeff_prepared)
    return jnp.moveaxis(out, 1, 2)  # back to (nd, Nz+1, Nx, Ny)


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
