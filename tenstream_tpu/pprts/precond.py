"""Two-level spectral preconditioner for the diffuse solve.

Motivation (round-3 profile): the vertical-line preconditioner
(`ediff.vertical_line_solve`) captures per-column vertical transport but
ignores ALL horizontal coupling, so horizontally-smooth error components
decay only by physical side-stream diffusion — one cell per iteration.
Hard solar chunks at 256^2 burned 600-1291 BiCGStab iterations this way
(`docs/BENCH_256_r3.log`).  The reference leans on global ILU/SOR
factorizations (`setup_ksp`, `src/pprts.F90:4311-4437`), which have no
cheap TPU analogue.

TPU-first design — exploit the PERIODIC horizontal boundaries (the
reference's DMDA is x/y-periodic, `src/pprts.F90:838-846`): with
horizontally homogeneous (layer-mean) coefficients the diffuse operator
(I - S) is translation-invariant in (x, y), so a 2-D FFT block-
diagonalizes it into independent (ndiff x (Nz+1)) block-tridiagonal
systems — one per horizontal Fourier mode — with dense complex
(ndiff x ndiff) blocks.  Those are factorized ONCE per band solve by
block CYCLIC REDUCTION (log2(Nz) levels, every op batched over
blocks x modes — see CoarseFactors for why not block-Thomas) and each
application is a log2(Nz)-level down/up sweep of batched 10x10
matvecs.

The full preconditioner is additive on complementary subspaces:

    M(r) = L(r - P r)  +  Q C^-1 R r

where R/Q are mean-pool / piecewise-constant-prolong over cf x cf
horizontal blocks (P = Q R is an orthogonal projection), C is the
Galerkin coarse restriction of the homogeneous operator (fine shifts
become the pooled phase (1-1/cf) + e^{i theta}/cf), and L is the
vertical-line solve on the high-pass residual.  The coarse solve kills
the smooth modes GLOBALLY in one application; L handles the local,
column-resolved remainder.  With cf=1 and truly homogeneous
coefficients, M is the exact inverse (tested).

Everything is linear and fixed per solve, so right-preconditioned
BiCGStab semantics are unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.pprts.operators import OrbitCoeff
from tenstream_tpu.streams import StreamScheme

# Debug/test hook: set to a list before an EAGER `build_coarse_factors`
# call to record min |pivot| of every Gauss-Jordan elimination step (see
# `_cinv`).  Leave None in production (and under jit, where the values
# would be tracers).
PIVOT_TRACE = None


class CRLevel(NamedTuple):
    """One level of the block cyclic-reduction factorization.  All
    arrays are (nblocks, ndiff, ndiff, nmodes) complex with the MODE
    axis minor-most: TPU tiles the two minor dims to (8, 128), so a
    (..., 10, 10)-minor layout pads 20.5x (the round-4 regression: 88 MB
    of factors became 1.77 GB of HBM traffic per buffer and OOM'd 256^2
    at chunk=2), while (..., 10, 10, M) pads only 1.6x and every block
    op is lane-parallel over the modes."""

    F: jnp.ndarray  # (ne, ...)  D_even^-1 at this level
    G: jnp.ndarray  # (ne, ...)  F @ Lo_even   (back substitution)
    H: jnp.ndarray  # (ne, ...)  F @ Up_even
    A: jnp.ndarray  # (no, ...)  Lo_odd @ F[i]    (down sweep)
    B: jnp.ndarray  # (no, ...)  Up_odd @ F[i+1]


class CoarseFactors(NamedTuple):
    """Block CYCLIC-REDUCTION factorization of the per-mode coarse
    block-tridiagonal systems.

    Why cyclic reduction and not block-Thomas: Thomas forward
    elimination is a `lax.scan` whose body holds an unrolled 10x10
    Gauss-Jordan — measured on the chip, the SAME 25 block inverses
    cost 16 ms batched over z but ~1270 ms inside the scan (in-loop
    tiny-op dispatch, ~0.6 ms per op).  Cyclic reduction replaces the
    Nz-step scan with log2(Nz) levels whose every op is batched over
    blocks x modes — no `lax.scan` anywhere in build or apply, so the
    build cost scales with log(Nz) dispatch instead of Nz.

    The block count is padded to 2^m - 1 with decoupled identity blocks
    (Lo = Up = 0, r = 0), which is exact.

    HERMITIAN MODE REDUCTION (round 5): the residual being
    preconditioned is REAL, so its 2-D DFT satisfies
    rh(-k) = conj(rh(k)) and — because the operator blocks T(-k) are the
    conjugates of T(k) (they come from real layer means times e^{±i·}
    phases) — the per-mode solutions pair the same way.  Only the
    ~M/2 + boundary canonical modes are factorized and swept;
    `canon/src/conj` reconstruct the full spectrum.  Halves factor
    memory, build cost, AND per-apply bytes (at cf=4 on 256² the
    factors were ~3.7 GB and the apply the largest per-iteration term,
    PROFILE_r5)."""

    levels: tuple  # of CRLevel, coarsest last
    root: jnp.ndarray  # (1, ndiff, ndiff, nmodes): inverse of the last block
    canon: jnp.ndarray  # (nc,) canonical flat mode ids
    src: jnp.ndarray  # (M,) canonical position feeding each full mode
    conj: jnp.ndarray  # (M,) bool: conjugate the canonical value


def _hermitian_modes(ncx: int, ncy: int):
    """Static canonical-mode bookkeeping for a real 2-D DFT.

    Returns (canon, src, conj): `canon` lists the flat (kx*ncy + ky) ids
    of one representative per conjugate pair {k, -k}; full-spectrum mode
    m reconstructs as conj^conj[m](x_canon[src[m]])."""
    canon_list = []
    pos = {}
    for kx in range(ncx):
        for ky in range(ncy):
            if (kx, ky) in pos:
                continue
            pid = len(canon_list)
            canon_list.append(kx * ncy + ky)
            pos[(kx, ky)] = (pid, False)
            pair = ((-kx) % ncx, (-ky) % ncy)
            if pair != (kx, ky) and pair not in pos:
                pos[pair] = (pid, True)
    src = np.zeros(ncx * ncy, np.int32)
    cj = np.zeros(ncx * ncy, bool)
    for (kx, ky), (pid, c) in pos.items():
        src[kx * ncy + ky] = pid
        cj[kx * ncy + ky] = c
    return (np.asarray(canon_list, np.int32), src, cj)


def auto_coarse_factor(nx: int, ny: int, target: int = 32) -> int:
    """Largest power-of-two pooling factor that keeps the coarse grid at
    >= target in the larger dimension (and divides both)."""
    cf = 1
    while (
        nx % (2 * cf) == 0
        and ny % (2 * cf) == 0
        and max(nx // (2 * cf), ny // (2 * cf)) >= target
    ):
        cf *= 2
    return cf


def _mean_coeff(coeff) -> jnp.ndarray:
    """Layer-mean (ndiff, ndiff, Nz) of the diffuse coefficient field."""
    if isinstance(coeff, OrbitCoeff):
        m = coeff.orb.astype(jnp.float32).mean(axis=(-2, -1))  # (norb, Nz)
        nf = coeff.idx.shape[0]
        e = jnp.take(m, jnp.asarray(coeff.idx.ravel(), jnp.int32), axis=0)
        return e.reshape(nf, nf, m.shape[-1])
    return coeff.astype(jnp.float32).mean(axis=(-2, -1))


def _phase_tables(scheme: StreamScheme, ncx: int, ncy: int, cf: int):
    """Static per-(src, dst, mode) phase factors and the z-offset masks.

    Galerkin coarse phase for a fine shift of +-1 cell under cf-pooling:
    phi = (1 - 1/cf) + e^{+-i theta} / cf (exact R A P restriction to
    block-constant vectors; reduces to the pure fine phase at cf=1).
    """
    axis = scheme.diff_axis()
    inward = scheme.diff_inward()
    nf = scheme.ndiff

    thx = 2.0 * np.pi * np.arange(ncx) / ncx
    thy = 2.0 * np.pi * np.arange(ncy) / ncy
    w = 1.0 / cf
    phx = (1.0 - w) + w * np.exp(1j * thx)  # fine shift +1 in x
    phy = (1.0 - w) + w * np.exp(1j * thy)

    G = np.ones((nf, ncx, ncy), np.complex64)  # gather phase per src
    P = np.ones((nf, ncx, ncy), np.complex64)  # scatter phase per dst
    for d in range(nf):
        if axis[d] == 1 and not inward[d]:
            G[d] = phx[:, None]
        elif axis[d] == 2 and not inward[d]:
            G[d] = phy[None, :]
        if axis[d] == 1 and inward[d]:
            P[d] = np.conj(phx)[:, None]
        elif axis[d] == 2 and inward[d]:
            P[d] = np.conj(phy)[None, :]
    # Phi[s, d, mode] = G[s] * P[d], flattened modes
    Phi = (G[:, None] * P[None, :]).reshape(nf, nf, ncx * ncy)

    # z-level offsets: source read at level k+offs, dst written at level
    # k+offd (see operators.gather_diff_src / scatter_diff_dst)
    offs = (axis == 0) & (~inward)  # up dofs source from face k+1
    offd = (axis == 0) & inward  # down dofs scatter to face k+1
    return Phi, offs, offd


def build_coarse_factors(
    scheme: StreamScheme,
    coeff,
    albedo2d: jnp.ndarray,
    cf: int,
    ncx: int,
    ncy: int,
) -> CoarseFactors:
    """Assemble and factorize the per-mode coarse block-tridiagonal
    systems (I - S_hom) from the layer-mean coefficients."""
    nf = scheme.ndiff
    cbar = _mean_coeff(coeff)  # (nf, nf, Nz) f32, [src, dst]
    nz = cbar.shape[-1]
    L1 = nz + 1
    M = ncx * ncy

    Phi, offs, offd = _phase_tables(scheme, ncx, ncy, cf)
    Phi = jnp.asarray(Phi)  # (nf_s, nf_d, M)

    # T[k, d, s, m] = cbar[s, d, k] * Phi[s, d, m] — modes MINOR (see
    # CoarseFactors: a mode-minor layout is what keeps the factorization
    # lane-parallel instead of 20.5x-padded)
    T = cbar[:, :, :, None] * Phi[:, :, None, :]  # (s, d, k, m) c64
    T = jnp.transpose(T, (2, 1, 0, 3))  # (k, d, s, m)

    m00 = jnp.asarray(((~offd)[:, None] & (~offs)[None, :])[..., None])  # (d, s, 1)
    m11 = jnp.asarray((offd[:, None] & offs[None, :])[..., None])
    m01 = jnp.asarray((offd[:, None] & (~offs)[None, :])[..., None])  # sub-diag
    m10 = jnp.asarray(((~offd)[:, None] & offs[None, :])[..., None])  # super-diag

    zero = jnp.zeros((1, nf, nf, M), T.dtype)
    eye = jnp.broadcast_to(jnp.eye(nf, dtype=T.dtype)[:, :, None], (L1, nf, nf, M))
    D = eye - jnp.concatenate([jnp.where(m00, T, 0), zero], axis=0)
    D = D - jnp.concatenate([zero, jnp.where(m11, T, 0)], axis=0)
    Lo = jnp.concatenate([zero, jnp.where(m01, T, 0)], axis=0) * -1.0
    Up = jnp.concatenate([jnp.where(m10, T, 0), zero], axis=0) * -1.0

    # surface albedo closure: Eup_sfc -= albedo * w_up * Edn_sfc (mode-
    # independent, mean albedo)
    amean = jnp.mean(albedo2d).astype(jnp.float32)
    inward = scheme.diff_inward()
    wtop = scheme.difftop_weights()
    alb = np.zeros((nf, nf), np.float32)
    for d in range(scheme.difftop.dof):
        if not inward[d]:
            for s in range(scheme.difftop.dof):
                if inward[s]:
                    alb[d, s] = float(wtop[d])
    D = D.at[-1].add(-amean * jnp.asarray(alb, D.dtype)[:, :, None])

    def _mm(A, B):
        """Block matmul in (d, s, modes) layout: lane-parallel over the
        minor mode axis, contraction over the tiny s index in sublanes.
        Written as broadcast-multiply-reduce, NOT einsum: a complex
        batched dot_general makes XLA transpose both operands into the
        (.., 10, 10)-minor layout (20.5x tile padding — measured 49 ms
        per block matmul vs ~1 ms in this form)."""
        return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)

    def _cinv(A, eps=1e-20):
        """Batched complex block inverse by UNROLLED Gauss-Jordan over
        the static block size, elementwise over the minor mode axis.
        TPU has no complex LU lowering, and real LU (`linalg.inv` via the
        2n x 2n embedding) both serializes and forces the (n, n)-minor
        padded layout; n static steps of rank-1 updates need neither.
        No pivoting: the blocks are I - T with spectral radius < 1
        (energy conservation) plus Schur updates of the same character,
        so the running pivots stay near 1; `eps` guards exact zeros.
        If dominance were ever violated the eps floor would mask it as
        silent convergence degradation — `PIVOT_TRACE` (module hook, set
        to a list during an EAGER build) records min |pivot| per
        elimination step so tests can assert dominance holds on stressed
        scenes (ADVICE r4)."""
        n = A.shape[-3]
        X = jnp.broadcast_to(
            jnp.eye(n, dtype=A.dtype)[:, :, None], A.shape
        ).astype(A.dtype)
        for i in range(n):
            piv = A[..., i, i, :][..., None, :]  # (..., 1, m)
            if PIVOT_TRACE is not None:
                PIVOT_TRACE.append(jnp.min(jnp.abs(piv)))
            den = jnp.where(jnp.abs(piv) < eps, eps, piv)
            rowA = A[..., i, :, :] / den  # (..., n, m)
            rowX = X[..., i, :, :] / den
            colA = A[..., :, i, :].at[..., i, :].set(0.0)  # (..., n, m)
            A = A - colA[..., :, None, :] * rowA[..., None, :, :]
            X = X - colA[..., :, None, :] * rowX[..., None, :, :]
            A = A.at[..., i, :, :].set(rowA)
            X = X.at[..., i, :, :].set(rowX)
        return X

    # pad the block count to 2^m - 1 with decoupled identity blocks
    Lp = 1
    while Lp < L1:
        Lp = 2 * Lp + 1
    if Lp > L1:
        pad = Lp - L1
        eyep = jnp.broadcast_to(
            jnp.eye(nf, dtype=D.dtype)[:, :, None], (pad, nf, nf, M)
        )
        zp = jnp.zeros((pad, nf, nf, M), D.dtype)
        D = jnp.concatenate([D, eyep], axis=0)
        Lo = jnp.concatenate([Lo, zp], axis=0)
        Up = jnp.concatenate([Up, zp], axis=0)

    # HERMITIAN REDUCTION: factorize only the canonical half of the
    # conjugate-paired modes (see CoarseFactors docstring)
    canon, src, cj = _hermitian_modes(ncx, ncy)
    canon_j = jnp.asarray(canon)
    D = jnp.take(D, canon_j, axis=-1)
    Lo = jnp.take(Lo, canon_j, axis=-1)
    Up = jnp.take(Up, canon_j, axis=-1)

    # cyclic reduction: eliminate EVEN positions each level (boundary
    # blocks carry Lo[0] = Up[-1] = 0, so the formulas need no cases)
    levels = []
    while D.shape[0] > 1:
        De, Do = D[0::2], D[1::2]
        Loe, Loo = Lo[0::2], Lo[1::2]
        Upe, Upo = Up[0::2], Up[1::2]
        F = _cinv(De)  # (ne, ...)
        A = _mm(Loo, F[:-1])  # odd i couples left to even i
        B = _mm(Upo, F[1:])  # ... and right to even i+1
        levels.append(CRLevel(F, _mm(F, Loe), _mm(F, Upe), A, B))
        D = Do - _mm(A, Upe[:-1]) - _mm(B, Loe[1:])
        Lo = -_mm(A, Loe[:-1])
        Up = -_mm(B, Upe[1:])
    return CoarseFactors(tuple(levels), _cinv(D), canon_j,
                         jnp.asarray(src), jnp.asarray(cj))


def _dft_mat(n: int, inverse: bool = False) -> jnp.ndarray:
    """Dense DFT matrix.  The coarse grid is <= ~32x32, where an
    explicit (n, n) complex matmul costs nothing (and rides the MXU on
    TPU); it also avoids XLA's FFT thunk entirely, which on the CPU
    backend RET_CHECKs on the non-default layouts GSPMD assigns inside
    sharded programs (fft_thunk.cc:167 — hit by the multichip dryrun)."""
    k = np.arange(n)
    sgn = 2j if inverse else -2j
    m = np.exp(sgn * np.pi * np.outer(k, k) / n) / (n if inverse else 1.0)
    return jnp.asarray(m.astype(np.complex64))


def _dft2(rc: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """2-D DFT over the trailing (x, y) axes via two dense matmuls."""
    ncx, ncy = rc.shape[-2], rc.shape[-1]
    Fx = _dft_mat(ncx, inverse)
    Fy = _dft_mat(ncy, inverse)
    out = jnp.einsum("...xy,xu->...uy", rc, Fx,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...uy,yv->...uv", out, Fy,
                      precision=jax.lax.Precision.HIGHEST)


def _mv(A, x):
    """Batched block matvec in (blocks, d, s, modes) x (blocks, s, modes).
    Broadcast-multiply-reduce for the same layout reason as the build's
    _mm: a complex dot_general would transpose into the padded
    (.., 10, 10)-minor tiling."""
    return jnp.sum(A * x[..., None, :, :], axis=-2)


def coarse_solve(factors: CoarseFactors, rc: jnp.ndarray) -> jnp.ndarray:
    """Solve the homogeneous coarse system: DFT2 -> cyclic-reduction
    down/up sweeps (log2(Nz) batched levels, no scans) -> iDFT2.
    rc: (ndiff, Nz+1, ncx, ncy).  All block ops run in the
    (blocks, d, s, modes) mode-minor layout (see CRLevel)."""
    nf, L1, ncx, ncy = rc.shape
    rh = _dft2(rc.astype(jnp.complex64))
    rh = jnp.transpose(rh.reshape(nf, L1, ncx * ncy), (1, 0, 2))  # (l, d, m)
    # Hermitian reduction: sweep only the canonical conjugate-pair
    # representatives (the rhs is real, see CoarseFactors docstring)
    rh = jnp.take(rh, factors.canon, axis=-1)
    Lp = 1
    while Lp < L1:
        Lp = 2 * Lp + 1
    if Lp > L1:
        rh = jnp.concatenate(
            [rh, jnp.zeros((Lp - L1,) + rh.shape[1:], rh.dtype)], axis=0
        )

    # down sweep: fold the even rhs into the odd ones
    r_evens = []
    for lev in factors.levels:
        re, ro = rh[0::2], rh[1::2]
        r_evens.append(re)
        rh = ro - _mv(lev.A, re[:-1]) - _mv(lev.B, re[1:])

    x = _mv(factors.root, rh)  # (1, d, m)

    # up sweep: recover the evens, interleave
    for lev, re in zip(reversed(factors.levels), reversed(r_evens)):
        zpad = jnp.zeros_like(x[:1])
        xl = jnp.concatenate([zpad, x], axis=0)  # left odd neighbor
        xr = jnp.concatenate([x, zpad], axis=0)  # right odd neighbor
        xe = _mv(lev.F, re) - _mv(lev.G, xl) - _mv(lev.H, xr)
        n = xe.shape[0] + x.shape[0]
        out = jnp.zeros((n,) + x.shape[1:], x.dtype)
        x = out.at[0::2].set(xe).at[1::2].set(x)

    x = x[:L1]  # drop the identity padding
    # reconstruct the full spectrum from the canonical half
    xf = jnp.take(x, factors.src, axis=-1)
    xf = jnp.where(factors.conj[None, None, :], jnp.conj(xf), xf)
    xc = jnp.transpose(xf, (1, 0, 2)).reshape(nf, L1, ncx, ncy)
    return jnp.real(_dft2(xc, inverse=True)).astype(rc.dtype)


def pool2d(r: jnp.ndarray, cf: int) -> jnp.ndarray:
    """Mean-pool the trailing (x, y) dims by cf."""
    if cf == 1:
        return r
    *lead, nx, ny = r.shape
    return r.reshape(*lead, nx // cf, cf, ny // cf, cf).mean(axis=(-3, -1))


def unpool2d(rc: jnp.ndarray, cf: int) -> jnp.ndarray:
    """Piecewise-constant prolongation (adjoint of mean-pool up to 1/cf^2)."""
    if cf == 1:
        return rc
    return jnp.repeat(jnp.repeat(rc, cf, axis=-2), cf, axis=-1)


def make_two_level_pc(scheme: StreamScheme, coeff, albedo2d, cf: int = 0,
                      coarse_target: int = 32):
    """Returns M(r): the additive two-level preconditioner closure.

    cf = 0 picks `auto_coarse_factor` from the grid (pooling down
    toward a `coarse_target`-point coarse grid); the factorization
    happens at closure-build time (once per jitted solve), applications
    are cyclic-reduction sweeps + DFTs + one vertical-line solve.
    """
    from tenstream_tpu.pprts.ediff import make_line_pc

    shp = coeff.shape  # (nf, nf, Nz, Nx, Ny)
    nx, ny = shp[-2], shp[-1]
    if cf <= 0:
        cf = auto_coarse_factor(nx, ny, coarse_target)
    ncx, ncy = nx // cf, ny // cf
    factors = build_coarse_factors(scheme, coeff, albedo2d, cf, ncx, ncy)

    # the line solve assumes a single up/down difftop pair (identity for
    # 3_16/3_24's 8 top dofs); factored ONCE here — the apply is two
    # log-depth affine scans (round 5, see `make_line_pc`)
    line = make_line_pc(scheme, coeff, albedo2d)

    def M(r):
        rc = pool2d(r, cf)
        r_hi = r - unpool2d(rc, cf)
        z_hi = line(r_hi)
        z_lo = unpool2d(coarse_solve(factors, rc), cf)
        return z_hi + z_lo

    return M
