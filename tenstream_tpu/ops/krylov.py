"""Generic (pytree-valued) matrix-free BiCGStab.

Parity: the reference's default diffuse solver is PETSc KSPFBCGS
(`setup_ksp`, `src/pprts.F90:4311-4437`); the plexrt wedge solvers use
the same KSP machinery (`plexrt/plex_rt.F90:2228,2408`).  The cube
solver's specialized implementation lives in `pprts/ediff.py` (adds the
vertical-line preconditioner); this module is the scheme-agnostic
variant for state that is a PYTREE of arrays (e.g. the wedge solvers'
(E, F) top/side flux pair), with the same three load-bearing features:
observability (niter/res returned), in-loop breakdown restarts, and a
stagnation exit tracking the best iterate.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _t(op, *trees):
    return jax.tree_util.tree_map(op, *trees)


def _dot(u, v):
    parts = jax.tree_util.tree_leaves(_t(lambda a, b: jnp.vdot(a.ravel(), b.ravel()), u, v))
    return sum(parts)


def _norm(u):
    return jnp.sqrt(jnp.maximum(_dot(u, u), 0.0))


def _safe(v, eps):
    return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)


def bicgstab_tree(
    A: Callable,
    b,
    x0=None,
    M: Optional[Callable] = None,
    rtol: float = 1e-5,
    atol: float = 1e-8,
    maxiter: int = 1000,
    stall_limit: int = 30,
    restart_every: int = 10,
) -> Tuple:
    """Right-preconditioned BiCGStab on A(x) = b over pytree states.

    Returns (x, niter, res, tol).  See `pprts/ediff.solve_bicgstab` for
    the rationale of the restart/stall machinery (round-2 regression
    lessons); this is the same algorithm with `jax.tree_util` arithmetic.
    """
    if M is None:
        M = lambda r: r

    leaves = jax.tree_util.tree_leaves(b)
    dtype = leaves[0].dtype
    eps = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)
    one = jnp.asarray(1.0, dtype)

    x = _t(jnp.zeros_like, b) if x0 is None else x0
    r = _t(lambda bb, ax: bb - ax, b, A(x))
    bnorm = _norm(b)
    tol = jnp.maximum(rtol * bnorm, atol)
    res0 = _norm(r)
    zeros = _t(jnp.zeros_like, b)

    def cond(state):
        (it, x, r, rhat, p, v, rho, alpha, omega,
         best_x, best_r, best_res, stall) = state
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_and(_norm(r) > tol, stall < stall_limit),
        )

    def body(state):
        (it, x, r, rhat, p, v, rho, alpha, omega,
         best_x, best_r, best_res, stall) = state

        do_restart = (stall > 0) & (stall % restart_every == 0)
        sel = lambda a, bb: _t(lambda u, w: jnp.where(do_restart, u, w), a, bb)
        x = sel(best_x, x)
        r = sel(best_r, r)
        rhat = sel(best_r, rhat)
        p = sel(zeros, p)
        v = sel(zeros, v)
        rho = jnp.where(do_restart, one, rho)
        alpha = jnp.where(do_restart, one, alpha)
        omega = jnp.where(do_restart, one, omega)

        rho_new = _dot(rhat, r)
        breakdown = jnp.abs(rho_new) < eps * jnp.maximum(_norm(rhat) * _norm(r), eps)
        rhat = _t(lambda rh, rr: jnp.where(breakdown, rr, rh), rhat, r)
        rho_new = jnp.where(breakdown, _dot(r, r), rho_new)
        beta = (rho_new / _safe(rho, eps)) * (alpha / _safe(omega, eps))
        p = _t(
            lambda rr, pp, vv: jnp.where(breakdown, rr, rr + beta * (pp - omega * vv)),
            r, p, v,
        )

        phat = M(p)
        v = A(phat)
        alpha = rho_new / _safe(_dot(rhat, v), eps)
        s = _t(lambda rr, vv: rr - alpha * vv, r, v)
        shat = M(s)
        t = A(shat)
        omega_new = _dot(t, s) / _safe(_dot(t, t), eps)
        x_new = _t(lambda xx, ph, sh: xx + alpha * ph + omega_new * sh, x, phat, shat)
        r_new = _t(lambda ss, tt: ss - omega_new * tt, s, t)

        ok = jnp.isfinite(_dot(r_new, r_new)) & jnp.isfinite(_dot(x_new, x_new))
        x_new = _t(lambda a, bb: jnp.where(ok, a, bb), x_new, best_x)
        r_new = _t(
            lambda a, bb: jnp.where(ok, a, bb),
            r_new, _t(lambda u, w: u - w, b, A(best_x)),
        )

        res_new = _norm(r_new)
        improved = res_new < best_res * (1.0 - 1e-4)
        keep = lambda a, bb: _t(lambda u, w: jnp.where(improved, u, w), a, bb)
        best_x = keep(x_new, best_x)
        best_r = keep(r_new, best_r)
        best_res = jnp.where(improved, res_new, best_res)
        stall = jnp.where(improved & ok, 0, stall + 1)

        return (it + 1, x_new, r_new, rhat, p, v, rho_new, alpha,
                omega_new, best_x, best_r, best_res, stall)

    state = (
        jnp.asarray(0), x, r, r, zeros, zeros,
        one, one, one, x, r, res0, jnp.asarray(0),
    )
    state = jax.lax.while_loop(cond, body, state)
    it, x, r = state[0], state[1], state[2]
    best_x, best_res = state[9], state[11]
    final_res = _norm(r)
    use_best = best_res < final_res
    x_out = _t(lambda a, bb: jnp.where(use_best, a, bb), best_x, x)
    return x_out, it, jnp.minimum(best_res, final_res), tol
