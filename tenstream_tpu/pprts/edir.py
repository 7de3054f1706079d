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


def _affine_combine(prev, cur):
    Ap, Bp = prev
    Ac, Bc = cur
    Anew = jnp.einsum("nab...,nbc...->nac...", Ac, Ap)
    Bnew = jnp.einsum("nab...,nb...->na...", Ac, Bp) + Bc
    return Anew, Bnew


def _closure_solve(Pl, Ql):
    """X0 = (I - Pl)^-1 Ql for ds in {1, 2} block sizes."""
    ds = Ql.shape[0]
    if ds == 1:
        return Ql / jnp.maximum(1.0 - Pl[:, 0], 1e-20)
    if ds == 2:
        a = 1.0 - Pl[0, 0]
        b = -Pl[0, 1]
        c = -Pl[1, 0]
        d = 1.0 - Pl[1, 1]
        det = jnp.maximum(a * d - b * c, 1e-20)
        return jnp.stack(
            [(d * Ql[0] - b * Ql[1]) / det, (-c * Ql[0] + a * Ql[1]) / det], axis=0
        )
    raise NotImplementedError("dirside dof > 2")  # pragma: no cover


def _cyclic_affine_solve(A, B, axis):
    """Solve the periodic recurrence X[i+1] = A[i] X[i] + B[i].

    A: (ds, ds, ...) per-cell transfer blocks, B: (ds, ...), recurrence
    along `axis` of the trailing grid dims of B (0-based within grid
    dims).  Returns X face-indexed, same shape as B.
    """
    # move the scan axis to the front: work shapes (N, ds[, ds], batch...)
    Bm = jnp.moveaxis(B, 1 + axis, 0)  # (N, ds, batch...)
    Am = jnp.moveaxis(A, 2 + axis, 0)  # (N, ds, ds, batch...)

    P, Q = jax.lax.associative_scan(_affine_combine, (Am, Bm), axis=0)
    # periodic closure: X0 = (I - P[-1])^-1 Q[-1]
    X0 = _closure_solve(P[-1], Q[-1])
    # X[i] for i >= 1 from prefixes; X[0] known
    Xrest = jnp.einsum("nab...,b...->na...", P[:-1], X0) + Q[:-1]
    X = jnp.concatenate([X0[None], Xrest], axis=0)
    return jnp.moveaxis(X, 0, 1 + axis)


def _cyclic_affine_solve_sharded(A, B, axis, axis_name):
    """Distributed cyclic affine solve inside a `shard_map` region.

    Redesign of the round-1 GSPMD path (associative scans along sharded
    axes): each shard runs a LOCAL prefix scan (no comms), then ONE
    `all_gather` of the per-shard (ds x ds) carry summaries closes the
    periodic ring — S tiny block compositions instead of log(N) staged
    collective segments per scan.  Reference semantics: the sun-ordered
    sweep + halo exchange of `explicit_edir_forward_sweep`
    (`src/pprts_explicit.F90:232-459`), solved exactly instead of
    iterated.
    """
    Bm = jnp.moveaxis(B, 1 + axis, 0)  # (Nloc, ds, batch...)
    Am = jnp.moveaxis(A, 2 + axis, 0)

    P_loc, Q_loc = jax.lax.associative_scan(_affine_combine, (Am, Bm), axis=0)
    A_sum, B_sum = P_loc[-1], Q_loc[-1]  # (ds, ds, batch...), (ds, batch...)

    A_all = jax.lax.all_gather(A_sum, axis_name)  # (S, ds, ds, batch...)
    B_all = jax.lax.all_gather(B_sum, axis_name)
    S = A_all.shape[0]

    ds = B.shape[0]
    eye = jnp.zeros_like(A_all[0])
    for i in range(ds):
        eye = eye.at[i, i].set(1.0)

    # prefix composition around the ring: pre[k] maps the ring origin's
    # boundary value to shard k's left-boundary value
    preA, preB = [eye], [jnp.zeros_like(B_all[0])]
    M_A, M_B = eye, jnp.zeros_like(B_all[0])
    for k in range(S):
        M_A, M_B = (
            jnp.einsum("ab...,bc...->ac...", A_all[k], M_A),
            jnp.einsum("ab...,b...->a...", A_all[k], M_B) + B_all[k],
        )
        if k < S - 1:
            preA.append(M_A)
            preB.append(M_B)
    # full-ring closure, then my shard's left-boundary value
    X0 = _closure_solve(M_A, M_B)
    idx = jax.lax.axis_index(axis_name)
    myA = jax.lax.dynamic_index_in_dim(jnp.stack(preA, 0), idx, keepdims=False)
    myB = jax.lax.dynamic_index_in_dim(jnp.stack(preB, 0), idx, keepdims=False)
    X_start = jnp.einsum("ab...,b...->a...", myA, X0) + myB

    Xrest = jnp.einsum("nab...,b...->na...", P_loc[:-1], X_start) + Q_loc[:-1]
    X = jnp.concatenate([X_start[None], Xrest], axis=0)
    return jnp.moveaxis(X, 0, 1 + axis)


def _edir_core(scheme, c, incoming_top, n_inner, axis_names=None,
               aitken=False, cleanup=True):
    """Canonical-orientation direct solve (photons travel +x, +y, -z).

    With `axis_names` = (x_name, y_name) the in-layer recurrences use the
    distributed shard_map solver; otherwise the single-region
    associative scan.

    `aitken` (round 5): the x<->y pair iteration is a linear fixed-point
    map whose contraction rate degrades toward grazing sun (measured at
    32^3, 50 m layers: rho ~ 0.01 at theta=40, 0.09 at 60, 0.55 at 80 —
    plain n_inner=8 leaves a 2.7 W error at theta=80).  One vector Aitken
    step (geometric extrapolation with rho estimated from the last two
    global delta norms) recovers 1-2 orders per pass budget: ni=3+aitken
    beats plain ni=8 at every measured angle.  `cleanup` re-solves the
    pair once from the extrapolated iterate (consistency; worth ~10x at
    mid angles, skippable at near-vertical sun).
    """
    nt = scheme.dirtop.dof
    ns = scheme.dirside.dof
    nd = scheme.ndir

    if axis_names is None:
        solve_x = lambda A, B: _cyclic_affine_solve(A, B, axis=0)
        solve_y = lambda A, B: _cyclic_affine_solve(A, B, axis=1)
        gsum = jnp.sum
    else:
        xn, yn = axis_names
        solve_x = lambda A, B: _cyclic_affine_solve_sharded(A, B, 0, xn)
        solve_y = lambda A, B: _cyclic_affine_solve_sharded(A, B, 1, yn)
        # Aitken's rho must be GLOBAL for 1-vs-N-device equality
        gsum = lambda v: jax.lax.psum(jax.lax.psum(jnp.sum(v), xn), yn)

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

        def pair(X, Y):
            # X[i+1] = cxx X[i] + (top + y contributions)   along x
            bx = bx_top + jnp.einsum("sdij,sij->dij", cyx, Y)
            X = solve_x(cxx, bx)
            by = by_top + jnp.einsum("sdij,sij->dij", cxy, X)
            Y = solve_y(cyy, by)
            return X, Y

        Y = jnp.zeros((ns,) + T_in.shape[1:], T_in.dtype)
        X = jnp.zeros_like(Y)
        Xp, Yp = X, Y
        for _ in range(n_inner):
            Xpp, Ypp = Xp, Yp
            Xp, Yp = X, Y
            X, Y = pair(X, Y)

        if aitken and n_inner >= 3:
            dX1, dY1 = X - Xp, Y - Yp
            dX0, dY0 = Xp - Xpp, Yp - Ypp
            num = gsum(dX1 * dX1) + gsum(dY1 * dY1)
            den = gsum(dX0 * dX0) + gsum(dY0 * dY0)
            rho = jnp.minimum(jnp.sqrt(num / jnp.maximum(den, 1e-30)), 0.95)
            f = (rho / (1.0 - rho)).astype(X.dtype)
            X = X + f * dX1
            Y = Y + f * dY1
            if cleanup:
                X, Y = pair(X, Y)

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
    return edir


def _canonicalize(dir2dir, incoming_top, xinc, yinc):
    c = dir2dir
    if xinc == 0:
        c = _flip_cell(c, axis=3)
        incoming_top = _flip_cell(incoming_top, axis=1)
    if yinc == 0:
        c = _flip_cell(c, axis=4)
        incoming_top = _flip_cell(incoming_top, axis=2)
    return c, incoming_top


def _uncanonicalize(scheme, edir, xinc, yinc):
    nt, ns = scheme.dirtop.dof, scheme.dirside.dof
    sl_t = slice(0, nt)
    sl_x = slice(nt, nt + ns)
    sl_y = slice(nt + ns, nt + 2 * ns)
    # cell-indexed z stays, flip faces on flipped axes
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


def inner_iter_policy(theta_deg: float) -> Tuple[int, bool, bool]:
    """(n_inner, aitken, cleanup) by static sun zenith angle.

    Measured error vs a 40-pass reference (32^3, aspect 0.5, cloud,
    field max ~400-1050 W): theta=40: 3 passes + Aitken -> 1.1e-3 W;
    theta=60: 3+Aitken+cleanup (4 passes) -> 2.8e-2 W; theta=80:
    6+Aitken+cleanup (7 passes) -> 0.19 W — every tier beats the old
    fixed plain n_inner=8 (2.7 W at theta=80) with fewer passes.

    Round-5 retune: the pair iteration's contraction rate depends on the
    SCENE (cell aspect, optical depth), not just theta — on the golden
    regression scene (12^2, aspect 1.0, theta=45) the original
    (3, aitken, no-cleanup) tier left 1.13 W where fixed-8 was converged
    to 1.8e-4 (tests/test_regression_golden.py caught it).  Measured
    there: 3+A+C 0.13 W, 4+A+C 0.014 W, 5+A+C 1.5e-3 W.  Tiers carry a
    one-pass safety margin over the 32^3 study and always run the
    cleanup pass (the 0.1 W/m2 reference-gate headroom costs ~1 extra
    pass, <1% of a solve)."""
    if theta_deg < 50.0:
        return 4, True, True
    if theta_deg < 70.0:
        return 4, True, True
    return 7, True, True


@partial(jax.jit, static_argnames=("scheme", "xinc", "yinc", "n_inner",
                                   "aitken", "cleanup"))
def solve_edir(
    scheme: StreamScheme,
    dir2dir: jnp.ndarray,
    incoming_top: jnp.ndarray,
    xinc: int,
    yinc: int,
    n_inner: int = 8,
    aitken: bool = False,
    cleanup: bool = True,
) -> jnp.ndarray:
    """March the direct beam down through all layers.

    Args:
      dir2dir: (ndir, ndir, Nz, Nx, Ny) [src, dst] per-cell blocks.
      incoming_top: (ntop, Nx, Ny) TOA source in [W] per top dof.
      xinc/yinc: static sun octant; 1 means photons travel toward +axis.
      n_inner/aitken/cleanup: x<->y pair iteration budget; see
        `inner_iter_policy` for the measured theta-tiered defaults.

    Returns edir: (ndir, Nz+1, Nx, Ny) [W], face-indexed (top dofs on
    z-faces; side dofs at their layer's upwind faces in canonical
    orientation, i.e. stored at the face the radiation crosses).
    """
    assert dir2dir.shape[0] == scheme.ndir
    c, inc = _canonicalize(dir2dir, incoming_top, xinc, yinc)
    edir = _edir_core(scheme, c, inc, n_inner, aitken=aitken, cleanup=cleanup)
    return _uncanonicalize(scheme, edir, xinc, yinc)


def solve_edir_sharded(
    scheme: StreamScheme,
    dir2dir: jnp.ndarray,
    incoming_top: jnp.ndarray,
    xinc: int,
    yinc: int,
    mesh,
    n_inner: int = 8,
    aitken: bool = False,
    cleanup: bool = True,
) -> jnp.ndarray:
    """`solve_edir` over an ('x', 'y') device mesh via `shard_map`.

    The in-layer cyclic recurrences run as LOCAL prefix scans with one
    small all-gathered (ds x ds) carry closure per solve, instead of
    GSPMD associative scans along sharded axes (round-1 design, flagged
    in ROUND1_NOTES item 2).  The octant flips stay OUTSIDE the
    shard_map region (they are global data movements).  Aitken's rho
    uses psum'd global norms, so 1-vs-N-device equality holds.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # newer jax
        from jax.sharding import shard_map

    assert dir2dir.shape[0] == scheme.ndir
    c, inc = _canonicalize(dir2dir, incoming_top, xinc, yinc)

    core = partial(_edir_core, scheme, n_inner=n_inner, axis_names=("x", "y"),
                   aitken=aitken, cleanup=cleanup)
    fn = shard_map(
        lambda cc, ii: core(cc, ii),
        mesh=mesh,
        in_specs=(P(None, None, None, "x", "y"), P(None, "x", "y")),
        out_specs=P(None, None, "x", "y"),
    )
    edir = fn(c, inc)
    return _uncanonicalize(scheme, edir, xinc, yinc)
