"""Diffuse transport solvers: (I - S) x = b, matrix-free.

Parity: the reference solves the diffuse system either with PETSc KSP
(FBCGS + ILU/BJACOBI/SOR, `setup_ksp`, `src/pprts.F90:4311-4437`) or with
adaptive-omega SOR sweeps (`explicit_ediff`,
`src/pprts_explicit.F90:461-714`).

TPU-first redesign: two matrix-free solvers over the einsum operator from
`operators.py`:

  * `solve_richardson` — damped Richardson iteration
    x <- (1-w) x + w (b + S x), with the reference's adaptive-omega
    controller (log-rate feedback, bounds [omega_min, omega_max],
    stagnation freeze; `src/pprts_explicit.F90:523-543,662-686`) ported
    into a `lax.while_loop`.  One iteration is one fused
    gather/matvec/scatter — the analogue of a Jacobi sweep.  Where the
    reference's Gauss-Seidel updates in place, we compensate with more
    (much cheaper, fully parallel) iterations.

  * `solve_bicgstab` — custom instrumented BiCGStab on A(x) = x - S(x)
    (iteration counts + residuals surfaced, in-loop breakdown restarts,
    stagnation exit), matching the reference's default KSPFBCGS.

Residual/tolerance convention follows `determine_ksp_tolerances`
(`src/pprts_base.F90:1097-1131`): rtol 1e-5, atol scaled by the number of
unknowns.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.pprts.operators import (
    OrbitCoeff,
    add_surface_reflection,
    diffuse_scatter,
)
from tenstream_tpu.streams import StreamScheme


def _pick_tx(nx: int) -> int:
    for tx in (4, 2, 1):
        if nx % tx == 0:
            return tx
    return 1


def _make_pc(scheme, coeff, albedo2d, precond):
    """Preconditioner closure from the `diff_precond` option value.

    True/"line" — vertical-line solve (round-1 default);
    "two_level"  — vertical line + spectral coarse solve
                   (`precond.make_two_level_pc`, round-4: kills the
                   horizontally-smooth error modes that cost 600-1291
                   iterations at 256^2 with the line PC alone);
    False/"none" — identity.
    """
    if precond in (True, "line"):
        return make_line_pc(scheme, coeff, albedo2d)
    if isinstance(precond, str) and precond.startswith("two_level"):
        from tenstream_tpu.pprts.precond import make_two_level_pc

        # "two_level" = auto coarse-grid target: 64 points at BASELINE-
        # scale grids, 32 below.  Measured 256^2x127 A/B (docs/
        # BENCH_256_r5.log B vs D, same code/cache): the 64^2 coarse grid
        # (cf=4) cuts the hardest solar chunks from 70-89 to <= 27
        # BiCGStab iterations and the perturbed headline 428.7 -> 527.1
        # cols/s; the bigger per-band factorization is repaid ~3x.
        # "two_level_<N>" pins the target explicitly.
        tail = precond[len("two_level"):]
        if tail == "":
            nxy = max(coeff.shape[-2], coeff.shape[-1])
            target = 64 if nxy >= 256 else 32
        elif tail.startswith("_") and tail[1:].isdigit() and int(tail[1:]) > 0:
            target = int(tail[1:])
        else:
            raise ValueError(
                f"unknown diff_precond value {precond!r}: expected 'two_level'"
                " or 'two_level_<positive int>' (or 'line'/'none')"
            )
        return make_two_level_pc(scheme, coeff, albedo2d, coarse_target=target)
    if precond in (False, "none"):
        return lambda r: r
    raise ValueError(
        f"unknown diff_precond value {precond!r}: expected 'line', "
        "'two_level', 'two_level_<N>', or 'none'"
    )


def _make_apply(scheme, coeff, albedo2d, use_pallas: bool, shape):
    """The diffuse transport operator S(x), either the XLA
    gather->einsum->scatter path or the fused Pallas kernel
    (`pprts/pallas_ops.py`; option `-pprts_pallas_diffuse`).  With
    orbit-compressed coefficients the Pallas path uses the orbit kernel
    (24 coeff channels/cell instead of 100 — the bandwidth
    speed-of-light form)."""
    if not use_pallas:
        return lambda x: diffuse_scatter(scheme, coeff, x, albedo2d)

    tx = _pick_tx(shape[2])
    interp = jax.default_backend() != "tpu"  # interpret off-TPU

    if isinstance(coeff, OrbitCoeff):
        from tenstream_tpu.pprts.pallas_ops import diffuse_apply_pallas_orbit

        idx_bytes = coeff.idx.tobytes()

        def apply(x):
            out = diffuse_apply_pallas_orbit(
                scheme, idx_bytes, coeff.orb, x, interpret=interp)
            return add_surface_reflection(scheme, out, x, albedo2d)

        return apply

    from tenstream_tpu.pprts.pallas_ops import (
        diffuse_apply_pallas,
        prepare_coeff_pallas,
    )

    cprep = prepare_coeff_pallas(coeff)

    def apply(x):
        out = diffuse_apply_pallas(scheme, cprep, x, tx=tx, interpret=interp)
        return add_surface_reflection(scheme, out, x, albedo2d)

    return apply


def vertical_line_solve(
    scheme: StreamScheme,
    coeff: jnp.ndarray,
    r: jnp.ndarray,
    albedo2d: jnp.ndarray,
) -> jnp.ndarray:
    """Solve M x = r where M keeps only the VERTICAL couplings of
    (I - S): the difftop up/down pair per column (block-tridiagonal in z,
    solved exactly by backward/forward scans — the same elimination as
    the two-stream solver) plus the albedo closure row; side dofs are
    identity.

    This is the line-relaxation preconditioner: vertical transport
    dominates the diffuse operator (the reference's strongest PC choices,
    ILU/SOR on a z-major ordering, capture the same structure), so
    M^-1-preconditioned Richardson converges in O(10) iterations where
    plain Richardson needs hundreds.

    Currently specialized to difftop.dof == 2 (one up/down pair); other
    schemes fall back to identity (no preconditioning).
    """
    if scheme.difftop.dof != 2:
        return r

    inward = scheme.diff_inward()
    d_up = 0 if not inward[0] else 1
    d_dn = 1 - d_up

    # full precision for the tridiagonal elimination even when the coeff
    # field is stored compressed (bf16)
    f32 = jnp.float32
    if isinstance(coeff, OrbitCoeff):
        a_dn = coeff.entry(d_dn, d_dn).astype(f32)
        b_dn = coeff.entry(d_up, d_dn).astype(f32)
        a_up = coeff.entry(d_up, d_up).astype(f32)
        b_up = coeff.entry(d_dn, d_up).astype(f32)
    else:
        a_dn = coeff[d_dn, d_dn].astype(f32)  # (Nz, Nx, Ny): src Edn -> dst Edn
        b_dn = coeff[d_up, d_dn].astype(f32)  # src Eup -> dst Edn
        a_up = coeff[d_up, d_up].astype(f32)
        b_up = coeff[d_dn, d_up].astype(f32)
    r_dn = r[d_dn]  # (Nz+1, Nx, Ny)
    r_up = r[d_up]

    def back(carry, inp):
        R_next, Q_next = carry
        a_dn_k, b_dn_k, a_up_k, b_up_k, r_dn_k1, r_up_k = inp
        D = 1.0 - b_dn_k * R_next
        R = b_up_k + a_up_k * R_next * a_dn_k / D
        Q = a_up_k * (R_next * (b_dn_k * Q_next + r_dn_k1) / D + Q_next) + r_up_k
        return (R, Q), (R_next, Q_next, D)

    (R0, Q0), (R_next, Q_next, D) = jax.lax.scan(
        back,
        (albedo2d, r_up[-1]),
        (a_dn, b_dn, a_up, b_up, r_dn[1:], r_up[:-1]),
        reverse=True,
    )

    def fwd(edn_k, inp):
        a_dn_k, b_dn_k, Qn, Dk, r_dn_k1 = inp
        edn_next = (a_dn_k * edn_k + b_dn_k * Qn + r_dn_k1) / Dk
        return edn_next, edn_next

    edn0 = r_dn[0]
    _, Edn_rest = jax.lax.scan(fwd, edn0, (a_dn, b_dn, Q_next, D, r_dn[1:]))
    Edn = jnp.concatenate([edn0[None], Edn_rest], axis=0)
    R_all = jnp.concatenate([R0[None], R_next], axis=0)
    Q_all = jnp.concatenate([Q0[None], Q_next], axis=0)
    Eup = R_all * Edn + Q_all

    x = r
    x = x.at[d_dn].set(Edn)
    x = x.at[d_up].set(Eup)
    return x


def _affine_prefix(A, c, x0):
    """All values of the affine recurrence X[k+1] = A[k] X[k] + c[k]
    with X[0] = x0, via a log-depth associative scan over axis 0.
    A, c: (n, ...); returns (n+1, ...) including x0."""
    def combine(prev, cur):
        Ap, cp = prev
        Ac, cc = cur
        return Ap * Ac, Ac * cp + cc

    P, Q = jax.lax.associative_scan(combine, (A, c), axis=0)
    return jnp.concatenate([x0[None], P * x0[None] + Q], axis=0)


def _affine_suffix(A, c, xn):
    """All values of the backward recurrence X[k] = A[k] X[k+1] + c[k]
    with X[n] = xn.  A, c: (n, ...); returns (n+1, ...) including xn."""
    out = _affine_prefix(jnp.flip(A, 0), jnp.flip(c, 0), xn)
    return jnp.flip(out, 0)


def make_line_pc(scheme: StreamScheme, coeff, albedo2d: jnp.ndarray):
    """Factored vertical-line preconditioner (round 5).

    Same math as `vertical_line_solve` but split into a once-per-solve
    FACTORIZATION and a cheap per-apply path:

      * The R/D elimination recursion is r-INDEPENDENT (it only sees the
        coefficients and the albedo), yet the fused form re-derived it on
        every apply — 2x/BiCGStab-iteration.  Here R and the derived
        apply factors are computed at closure-build time and become
        loop-invariant constants of the jitted solve.
      * The per-apply Q (backward) and Edn (forward) recursions are
        affine with precomputed slopes, so they run as two log-depth
        `associative_scan`s batched over all columns instead of 2*Nz
        sequential (Nx, Ny) steps — the same latency-vs-depth trade that
        fixed the coarse-PC build (ROUND4_NOTES item 1).

    Bit-compatibility with `vertical_line_solve` is tested to f32
    roundoff (tests/test_line_pc.py).
    """
    if scheme.difftop.dof != 2:
        return lambda r: r

    from tenstream_tpu.pprts.operators import OrbitCoeff

    inward = scheme.diff_inward()
    d_up = 0 if not inward[0] else 1
    d_dn = 1 - d_up

    f32 = jnp.float32
    if isinstance(coeff, OrbitCoeff):
        a_dn = coeff.entry(d_dn, d_dn).astype(f32)
        b_dn = coeff.entry(d_up, d_dn).astype(f32)
        a_up = coeff.entry(d_up, d_up).astype(f32)
        b_up = coeff.entry(d_dn, d_up).astype(f32)
    else:
        a_dn = coeff[d_dn, d_dn].astype(f32)
        b_dn = coeff[d_up, d_dn].astype(f32)
        a_up = coeff[d_up, d_up].astype(f32)
        b_up = coeff[d_dn, d_up].astype(f32)

    # --- factorization (once): R[k] backward from R[Nz] = albedo ---
    def back_R(R_next, inp):
        a_dn_k, b_dn_k, a_up_k, b_up_k = inp
        D = 1.0 - b_dn_k * R_next
        R = b_up_k + a_up_k * R_next * a_dn_k / D
        return R, (R_next, D)

    _, (R_next, D) = jax.lax.scan(
        back_R, albedo2d.astype(f32), (a_dn, b_dn, a_up, b_up), reverse=True
    )
    R0 = b_up[0] + a_up[0] * R_next[0] * a_dn[0] / D[0]
    R_all = jnp.concatenate([R0[None], R_next], axis=0)  # (Nz+1, ...)

    # derived apply factors (all (Nz, ...)):
    #   Q[k]     = A_q[k] Q[k+1] + f_dn[k] r_dn[k+1] + r_up[k]
    #   Edn[k+1] = A_e[k] Edn[k] + (b_dn[k] Q[k+1] + r_dn[k+1]) / D[k]
    f_dn = a_up * R_next / D
    A_q = a_up * (R_next * b_dn / D + 1.0)
    A_e = a_dn / D
    inv_D = 1.0 / D

    def M(r):
        r_dn = r[d_dn]
        r_up = r[d_up]
        cq = f_dn * r_dn[1:] + r_up[:-1]
        Q_all = _affine_suffix(A_q, cq, r_up[-1])  # (Nz+1, ...)
        ce = (b_dn * Q_all[1:] + r_dn[1:]) * inv_D
        Edn = _affine_prefix(A_e, ce, r_dn[0])
        Eup = R_all * Edn + Q_all
        x = r
        x = x.at[d_dn].set(Edn.astype(r.dtype))
        x = x.at[d_up].set(Eup.astype(r.dtype))
        return x

    return M


def default_tolerances(n_unknowns: int, unconstrained_fraction: float = 1.0):
    """Parity: `determine_ksp_tolerances` (`src/pprts_base.F90:1097-1131`)."""
    rtol = 1e-5
    atol = max(1e-8, 1e-4 * n_unknowns * unconstrained_fraction * 1e-6)
    return rtol, atol


@partial(
    jax.jit,
    static_argnames=("scheme", "max_iter", "precond", "use_pallas"),
)
def solve_richardson(
    scheme: StreamScheme,
    coeff: jnp.ndarray,
    b: jnp.ndarray,
    albedo2d: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    omega0: float = 1.0,
    rtol: float = 1e-5,
    atol: float = 1e-8,
    max_iter: int = 3000,
    precond: bool = True,
    use_pallas: bool = False,
    tol: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Adaptive-omega (preconditioned) Richardson iteration:
        x <- x + omega * M^-1 (b + S x - x)
    with M the vertical-line preconditioner (`vertical_line_solve`) or
    identity.  Returns (x, niter, omega_final); omega_final warm-starts
    the next solve of the same band (reference `solution%diff_sor_omega`).

    `tol` overrides the default relative-to-initial stopping criterion
    with an absolute residual-norm target — used when Richardson runs as
    the convergence-guaranteed POLISH phase after a stalled BiCGStab
    (where "relative to the stalled residual" would be meaningless).
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    M = _make_pc(scheme, coeff, albedo2d, precond)
    S_apply = _make_apply(scheme, coeff, albedo2d, use_pallas, b.shape)

    # NOTE deviation from the reference bounds [1, 1.25]
    # (`src/pprts_explicit.F90:530-533`): those are safe for Gauss-Seidel
    # SOR, but this is a Jacobi-type Richardson iteration, for which
    # omega > 1 diverges once the scattering operator's spectral radius
    # approaches 1 (thick conservative clouds).  Bound omega <= 1.
    omega_min, omega_max = 0.6, 1.0

    def cond(state):
        it, x, res, res0, *_ = state
        if tol is not None:
            unconverged = res >= tol
        else:
            unconverged = jnp.logical_and(res >= atol, res >= rtol * res0)
        return jnp.logical_and(it < max_iter, unconverged)

    def body(state):
        it, x, res, res0, res_prev2, omega, omega_dir, omega_step, log_rate_prev = state
        r = b + S_apply(x) - x
        res_new = jnp.linalg.norm(r.ravel())
        z = M(r)
        x_new = x + omega * z
        res0_new = jnp.where(it == 0, jnp.maximum(res_new, 1e-30), res0)

        # adaptive omega controller (log-rate feedback)
        can_adapt = jnp.logical_and(it >= 2, jnp.logical_and(res_new > 0, res_prev2 > 0))
        log_rate = 0.5 * jnp.log(jnp.maximum(res_new, 1e-30) / jnp.maximum(res_prev2, 1e-30))
        improving = log_rate < log_rate_prev
        omega_step_new = jnp.where(
            improving,
            jnp.minimum(omega_step * 1.3, omega_max - omega_min),
            jnp.maximum(omega_step * 0.5, 0.01),
        )
        omega_dir_new = jnp.where(improving, omega_dir, -omega_dir)
        omega_new = jnp.clip(omega + omega_dir_new * omega_step_new, omega_min, omega_max)
        omega = jnp.where(can_adapt, omega_new, omega)
        omega_dir = jnp.where(can_adapt, omega_dir_new, omega_dir)
        omega_step = jnp.where(can_adapt, omega_step_new, omega_step)
        log_rate_prev = jnp.where(can_adapt, log_rate, log_rate_prev)

        return (it + 1, x_new, res_new, res0_new, res, omega, omega_dir, omega_step, log_rate_prev)

    state = (
        jnp.asarray(0),
        x,
        jnp.asarray(jnp.inf, b.dtype),
        jnp.asarray(1.0, b.dtype),
        jnp.asarray(jnp.inf, b.dtype),
        jnp.asarray(omega0, b.dtype),
        jnp.asarray(1.0, b.dtype),
        jnp.asarray(0.05, b.dtype),
        jnp.asarray(0.0, b.dtype),
    )
    state = jax.lax.while_loop(cond, body, state)
    it, x, res, *_ = state
    omega_final = state[5]
    return x, it, omega_final, res


@partial(jax.jit, static_argnames=("scheme", "maxiter", "precond", "use_pallas"))
def solve_bicgstab(
    scheme: StreamScheme,
    coeff: jnp.ndarray,
    b: jnp.ndarray,
    albedo2d: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    rtol: float = 1e-5,
    atol: float = 1e-8,
    maxiter: int = 1000,
    precond: bool = True,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Matrix-free right-preconditioned BiCGStab on A(x) = x - S(x) with
    the vertical-line preconditioner (the analogue of the reference's
    KSPFBCGS + ILU/SOR default, `src/pprts.F90:4311-4437`).

    Custom `lax.while_loop` implementation instead of
    `jax.scipy.sparse.linalg.bicgstab` for three load-bearing reasons:

      * **observability** — returns (x, niter, final_residual) so the
        solver/bench layers can surface per-band iteration counts and
        convergence, matching the reference's residual histories
        (`src/pprts_base.F90:163-164`);
      * **breakdown handling in-loop** — rho/omega breakdowns (tiny b,
        near-transparent systems) restart the Krylov directions from the
        current residual instead of producing NaNs; round 1 handled this
        with a post-hoc `lax.cond` fallback solve that, under `vmap`
        (band-batched chunks), lowered to `select` and executed a FULL
        Richardson solve on every chunk — the dominant term of the
        round-1 25x benchmark regression;
      * **stagnation exit** — f32 Krylov recurrences can plateau above
        rtol*||b||; without this exit a single stagnated band in a
        vmapped chunk burned `maxiter` iterations for the whole chunk
        (the other regression term).  We track the best iterate seen and
        stop after `stall_limit` non-improving iterations, mirroring the
        reference's `-accept_incomplete_solve` semantics
        (`src/pprts_explicit.F90:134-136`).
    """

    from tenstream_tpu.pprts.operators import OrbitCoeff

    # Fused Pallas iteration body (round 5, verdict item 2): with orbit
    # coeffs the operator apply + face/cell shifts + albedo closure + the
    # two Krylov dot products run as ONE kernel (`fused_A_dots`) — no
    # pallas_call fusion-boundary losses, 24 coeff channels instead of
    # 100, and the dot partials ride along for free.  The plain-XLA path
    # remains both the fallback and the semantics reference.
    fused_AD = None
    if use_pallas and isinstance(coeff, OrbitCoeff):
        from tenstream_tpu.pprts.pallas_ops import (
            fused_A_dots,
            prepare_orbit_fused,
        )

        interp = jax.default_backend() != "tpu"
        orb_prep = prepare_orbit_fused(coeff.orb)
        idx_bytes = coeff.idx.tobytes()

        def fused_AD(u, w):  # noqa: F811
            return fused_A_dots(scheme, idx_bytes, orb_prep, u, w, albedo2d,
                                interpret=interp)

    S_apply = _make_apply(scheme, coeff, albedo2d,
                          use_pallas and fused_AD is None, b.shape)

    def A(x):
        if fused_AD is not None:
            return fused_AD(x, x)[0]
        return x - S_apply(x)

    M = _make_pc(scheme, coeff, albedo2d, precond)

    dtype = b.dtype
    eps = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)
    # 30 non-improving iterations before giving up: BiCGStab's residual
    # is erratic enough that limits <~10 exit prematurely with garbage
    # (measured: stall=6 stopped a converging cold solve at niter=8 with
    # res 1e7); stall in [10, 30] never triggered before the rtol exit
    # on the bench scenes.  NB the stall tracker carries only the best
    # residual SCALAR, not a best-iterate copy: the extra best_x/best_r
    # vectors cost 1.2 GB at BASELINE scale (256^2x113, band_chunk=2),
    # and final-iterate quality is guaranteed by the Richardson POLISH
    # that always follows this solver (solver.py) — it contracts to the
    # absolute tolerance from whatever iterate the stall exit leaves.
    stall_limit = 30
    restart_every = 10

    def dot(u, v):
        return jnp.vdot(u.ravel(), v.ravel())

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        # Optimal-scale seeding (round 5): replace x0 by alpha*x0 with
        # alpha = <A x0, b> / <A x0, A x0> — the 1-D least-squares
        # minimizer of |b - A(alpha x0)|.  Reuses the SAME operator
        # apply that r0 needs (A is linear), so it costs two dot
        # products and makes any seed amplitude-self-correcting: an
        # identical warm re-solve gets alpha == 1 exactly, and a
        # cross-band seed with the wrong magnitude (the round-3
        # "measured net-negative" cross-band experiment) is rescaled to
        # its best multiple instead of burning iterations undoing it.
        x = x0
        if fused_AD is not None:
            Ax, num, den = fused_AD(x, b)
        else:
            Ax = A(x)
            den = dot(Ax, Ax)
            num = dot(Ax, b)
        alpha0 = jnp.where(den > eps, num / _safe(den, eps),
                           jnp.asarray(1.0, dtype))
        x = alpha0 * x
        r = b - alpha0 * Ax
    rhat = r
    bnorm = jnp.linalg.norm(b.ravel())
    tol = jnp.maximum(rtol * bnorm, atol)
    res0 = jnp.linalg.norm(r.ravel())

    def cond(state):
        # the residual norm is CARRIED (computed once per iteration in
        # the body) — recomputing it here would cost an extra full pass
        # over the 0.3 GB/band residual vector every iteration
        (it, x, r, res, rhat, p, v, rho, alpha, omega, best_res, stall) = state
        return jnp.logical_and(
            it < maxiter,
            jnp.logical_and(res > tol, stall < stall_limit),
        )

    def body(state):
        (it, x, r, _res, rhat, p, v, rho, alpha, omega, best_res, stall) = state

        # plateau restart: BiCGStab can stall when rhat (= r0) loses its
        # component along the remaining error (measured: a thermal
        # box-cloud system plateaued at iteration ~3 and the stall exit
        # returned ~0 fluxes while Richardson converged fine).  Every
        # `restart_every` non-improving iterations, restart the Krylov
        # directions from the CURRENT residual; the overall stall_limit
        # exit then only fires after stall_limit/restart_every fruitless
        # restarts.
        do_restart = (stall > 0) & (stall % restart_every == 0)
        rhat = jnp.where(do_restart, r, rhat)
        p = jnp.where(do_restart, jnp.zeros_like(p), p)
        v = jnp.where(do_restart, jnp.zeros_like(v), v)
        rho = jnp.where(do_restart, one, rho)
        alpha = jnp.where(do_restart, one, alpha)
        omega = jnp.where(do_restart, one, omega)

        rho_new = dot(rhat, r)
        # rho breakdown -> restart Krylov directions from current r
        breakdown = jnp.abs(rho_new) < eps * jnp.maximum(
            jnp.linalg.norm(rhat.ravel()) * jnp.linalg.norm(r.ravel()), eps
        )
        rhat = jnp.where(breakdown, r, rhat)
        rho_new = jnp.where(breakdown, dot(r, r), rho_new)
        p = jnp.where(breakdown, r, r + (rho_new / _safe(rho, eps)) * (alpha / _safe(omega, eps)) * (p - omega * v))

        phat = M(p)
        if fused_AD is not None:
            v, rv, _ = fused_AD(phat, rhat)
        else:
            v = A(phat)
            rv = dot(rhat, v)
        alpha = rho_new / _safe(rv, eps)
        s = r - alpha * v
        shat = M(s)
        if fused_AD is not None:
            t, ts, tt = fused_AD(shat, s)
        else:
            t = A(shat)
            tt = dot(t, t)
            ts = dot(t, s)
        omega_new = ts / _safe(tt, eps)
        x_new = x + alpha * phat + omega_new * shat
        r_new = s - omega_new * t

        # non-finite guard: freeze at the previous iterate, count as
        # stalled (the stall exit then hands off to the polish)
        ok = jnp.isfinite(jnp.sum(r_new)) & jnp.isfinite(jnp.sum(x_new))
        x_new = jnp.where(ok, x_new, x)
        r_new = jnp.where(ok, r_new, r)

        res_new = jnp.linalg.norm(r_new.ravel())
        improved = res_new < best_res * (1.0 - 1e-4)
        best_res = jnp.where(improved, res_new, best_res)
        stall = jnp.where(improved & ok, 0, stall + 1)

        return (it + 1, x_new, r_new, res_new, rhat, p, v, rho_new, alpha,
                omega_new, best_res, stall)

    one = jnp.asarray(1.0, dtype)
    state = (
        jnp.asarray(0), x, r, res0, rhat, jnp.zeros_like(b), jnp.zeros_like(b),
        one, one, one, res0, jnp.asarray(0),
    )
    state = jax.lax.while_loop(cond, body, state)
    it, x, res = state[0], state[1], state[3]
    return x, it, res


def _safe(v, eps):
    """Divide-safe denominator: keep magnitude >= eps, preserve sign."""
    return jnp.where(jnp.abs(v) < eps, jnp.where(v < 0, -eps, eps), v)
