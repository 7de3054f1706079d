"""Direct (solar beam) transport solver.

Parity: reference `explicit_edir` (`src/pprts_explicit.F90:60-459`): a
wavefront forward sweep down z with sun-aligned x/y iteration order,
repeated until the residual converges (the repeats resolve the periodic
wrap-around and cross-rank coupling).

TPU-first redesign: the z recursion stays sequential (`lax.scan` over
layers — exact, like the sweep), but the in-layer side-stream recursions
are solved EXACTLY as cyclic affine recurrences with
`lax.associative_scan` (log-depth), including the periodic closure
X[0] = (I - prod A)^-1 Q.  The x<->y cross coupling is relaxed with a few
inner passes (the coupling coefficient is second-order small).  This
removes the reference's outer iteration entirely: one pass down z is the
converged answer, where the reference needs several full-domain sweeps.

The sun octant enters as static (xinc, yinc): the recurrences run in the
upwind direction via compile-time axis flips.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.streams import StreamScheme


def _flip_cell(arr, axis):
    return jnp.flip(arr, axis=axis)


def _flip_face(arr, axis):
    # face f -> (N - f) mod N : reverse then roll by one
    return jnp.roll(jnp.flip(arr, axis=axis), 1, axis=axis)


def _cyclic_affine_solve(A, B, axis):
    """Solve the periodic recurrence X[i+1] = A[i] X[i] + B[i].

    A: (ds, ds, ...) per-cell transfer blocks, B: (ds, ...), recurrence
    along `axis` of the trailing grid dims of B (0-based within grid
    dims).  Returns X face-indexed, same shape as B.
    """
    ds = B.shape[0]
    # move the scan axis to the front: work shapes (N, ds[, ds], batch...)
    Bm = jnp.moveaxis(B, 1 + axis, 0)  # (N, ds, batch...)
    Am = jnp.moveaxis(A, 2 + axis, 0)  # (N, ds, ds, batch...)

    def combine(prev, cur):
        Ap, Bp = prev
        Ac, Bc = cur
        Anew = jnp.einsum("nab...,nbc...->nac...", Ac, Ap)
        Bnew = jnp.einsum("nab...,nb...->na...", Ac, Bp) + Bc
        return Anew, Bnew

    P, Q = jax.lax.associative_scan(combine, (Am, Bm), axis=0)
    # periodic closure: X0 = (I - P[-1])^-1 Q[-1]
    Pl, Ql = P[-1], Q[-1]  # (ds, ds, batch...), (ds, batch...)
    if ds == 1:
        X0 = Ql / jnp.maximum(1.0 - Pl[:, 0], 1e-20)
    elif ds == 2:
        a = 1.0 - Pl[0, 0]
        b = -Pl[0, 1]
        c = -Pl[1, 0]
        d = 1.0 - Pl[1, 1]
        det = jnp.maximum(a * d - b * c, 1e-20)
        X0 = jnp.stack(
            [(d * Ql[0] - b * Ql[1]) / det, (-c * Ql[0] + a * Ql[1]) / det], axis=0
        )
    else:  # pragma: no cover - no scheme has ds > 2
        raise NotImplementedError("dirside dof > 2")
    # X[i] for i >= 1 from prefixes; X[0] known
    Xrest = jnp.einsum("nab...,b...->na...", P[:-1], X0) + Q[:-1]
    X = jnp.concatenate([X0[None], Xrest], axis=0)
    return jnp.moveaxis(X, 0, 1 + axis)


@partial(jax.jit, static_argnames=("scheme", "xinc", "yinc", "n_inner"))
def solve_edir(
    scheme: StreamScheme,
    dir2dir: jnp.ndarray,
    incoming_top: jnp.ndarray,
    xinc: int,
    yinc: int,
    n_inner: int = 8,
) -> jnp.ndarray:
    """March the direct beam down through all layers.

    Args:
      dir2dir: (ndir, ndir, Nz, Nx, Ny) [src, dst] per-cell blocks.
      incoming_top: (ntop, Nx, Ny) TOA source in [W] per top dof.
      xinc/yinc: static sun octant; 1 means photons travel toward +axis.

    Returns edir: (ndir, Nz+1, Nx, Ny) [W], face-indexed (top dofs on
    z-faces; side dofs at their layer's upwind faces in canonical
    orientation, i.e. stored at the face the radiation crosses).
    """
    nt = scheme.dirtop.dof
    ns = scheme.dirside.dof
    nd = scheme.ndir
    assert dir2dir.shape[0] == nd

    # canonicalize to photons travelling (+x, +y)
    c = dir2dir
    if xinc == 0:
        c = _flip_cell(c, axis=3)
        incoming_top = _flip_cell(incoming_top, axis=1)
    if yinc == 0:
        c = _flip_cell(c, axis=4)
        incoming_top = _flip_cell(incoming_top, axis=2)

    sl_t = slice(0, nt)
    sl_x = slice(nt, nt + ns)
    sl_y = slice(nt + ns, nt + 2 * ns)

    def layer(T_in, c_k):
        # c_k: (ndir, ndir, Nx, Ny)
        ctt = c_k[sl_t, sl_t]  # top -> top, [src, dst]
        ctx = c_k[sl_t, sl_x]
        cty = c_k[sl_t, sl_y]
        # recurrence matrices must be [dst, src] for the affine composition
        cxx = jnp.swapaxes(c_k[sl_x, sl_x], 0, 1)
        cyy = jnp.swapaxes(c_k[sl_y, sl_y], 0, 1)
        cxy = c_k[sl_x, sl_y]
        cxt = c_k[sl_x, sl_t]
        cyx = c_k[sl_y, sl_x]
        cyt = c_k[sl_y, sl_t]

        # in-layer cyclic recurrences; sources from the fixed top input
        bx_top = jnp.einsum("sdij,sij->dij", ctx, T_in)
        by_top = jnp.einsum("sdij,sij->dij", cty, T_in)

        Y = jnp.zeros((ns,) + T_in.shape[1:], T_in.dtype)
        X = jnp.zeros_like(Y)
        for _ in range(n_inner):
            # X[i+1] = cxx X[i] + (top + y contributions)   along x
            bx = bx_top + jnp.einsum("sdij,sij->dij", cyx, Y)
            X = _cyclic_affine_solve(cxx, bx, axis=0)
            by = by_top + jnp.einsum("sdij,sij->dij", cxy, X)
            Y = _cyclic_affine_solve(cyy, by, axis=1)

        T_out = (
            jnp.einsum("sdij,sij->dij", ctt, T_in)
            + jnp.einsum("sdij,sij->dij", cxt, X)
            + jnp.einsum("sdij,sij->dij", cyt, Y)
        )
        return T_out, (T_in, X, Y)

    c_scan = jnp.moveaxis(c, 2, 0)  # (Nz, ndir, ndir, Nx, Ny)
    T_sfc, (T_levels, X_layers, Y_layers) = jax.lax.scan(layer, incoming_top, c_scan)

    nz = c.shape[2]
    nx, ny = c.shape[3], c.shape[4]
    edir = jnp.zeros((nd, nz + 1, nx, ny), incoming_top.dtype)
    edir = edir.at[sl_t, :-1].set(jnp.moveaxis(T_levels, 0, 1))
    edir = edir.at[sl_t, -1].set(T_sfc)
    edir = edir.at[sl_x, :-1].set(jnp.moveaxis(X_layers, 0, 1))
    edir = edir.at[sl_y, :-1].set(jnp.moveaxis(Y_layers, 0, 1))

    # un-canonicalize: cell-indexed z stays, flip faces on flipped axes.
    if xinc == 0:
        top = _flip_cell(edir[sl_t], axis=2)
        xs = _flip_face(edir[sl_x], axis=2)
        ys = _flip_cell(edir[sl_y], axis=2)
        edir = jnp.concatenate([top, xs, ys], axis=0)
    if yinc == 0:
        top = _flip_cell(edir[sl_t], axis=3)
        xs = _flip_cell(edir[sl_x], axis=3)
        ys = _flip_face(edir[sl_y], axis=3)
        edir = jnp.concatenate([top, xs, ys], axis=0)
    return edir
