"""Multi-stream 1-D solver (DISORT-class) via doubling-adding.

Parity: the reference couples to DISORT as its high-accuracy
plane-parallel column reference (`src/pprts_1D_solvers.F90` dispatch of
`t_solver_disort`, option handling `src/pprts.F90:2606-2652`).  DISORT
itself solves the azimuthally-averaged discrete-ordinates equations per
layer by eigendecomposition.

TPU-first redesign: the matrix-operator (doubling-adding) method gives
the same fluxes with nothing but batched small matmuls and triangular
solves — no general eigendecomposition (unsupported on TPU):

  * per layer, reflection/transmission operators R, T of the
    discrete-ordinate flux bins are built by doubling from a thin-layer
    first-order initialization (Grant & Hunt 1969);
  * solar and thermal emergent-source vectors double alongside
    (the beam attenuates by exp(-dtau/2^k / mu0) between sub-layers);
  * layers combine with the adding equations in two `lax.scan` sweeps
    (surface up, then TOA down), giving fluxes at every level.

Everything is batched over columns (and, through vmap, spectral bands):
shapes (Nz, batch..., N, N) with N streams per hemisphere.

Angular discretization: double-Gauss nodes mu_i on (0, 1], delta-M
scaled phase function with 2N Legendre moments (chi_l = g^l for
Henyey-Greenstein).  Flux-bin representation f_i = 2 pi mu_i w_i I_i,
so Edn = sum_i f-_i directly.

Conventions match `ops.twostream.delta_eddington_twostream`:
inputs (dtau, w0, g) per layer with trailing batch dims, `incSolar` in
tilted-plane units, returns (S, Edn, Eup) at the Nz+1 levels; thermal
emission from `planck` [W/m2/sr] at levels (layer-mean used).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals


def _double_gauss(n: int):
    """Gauss-Legendre nodes/weights mapped to (0, 1): sum w = 1."""
    x, w = np.polynomial.legendre.leggauss(n)
    return ((x + 1.0) / 2.0).astype(np.float64), (w / 2.0).astype(np.float64)


def _legendre_table(lmax: int, mu: np.ndarray) -> np.ndarray:
    """P_l(mu) for l = 0..lmax, shape (lmax+1, len(mu))."""
    out = np.zeros((lmax + 1, mu.size))
    out[0] = 1.0
    if lmax >= 1:
        out[1] = mu
    for l in range(1, lmax):
        out[l + 1] = ((2 * l + 1) * mu * out[l] - l * out[l - 1]) / (l + 1)
    return out


@partial(jax.jit, static_argnames=("nstreams", "n_double", "with_thermal"))
def _disort_core(
    dtau, w0, g, mu0, incSolar, albedo, b_layer, b_srfc,
    nstreams: int, n_double: int, with_thermal: bool,
):
    nz = dtau.shape[0]
    batch = dtau.shape[1:]
    nb = int(np.prod(batch)) if batch else 1
    N = nstreams

    f5 = lambda a: jnp.asarray(a, ireals).reshape(nz, nb)
    dtau, w0, g = f5(dtau), f5(w0), f5(g)
    alb = jnp.asarray(albedo, ireals).reshape(nb) if np.ndim(albedo) else jnp.full((nb,), albedo, ireals)
    mu0 = jnp.asarray(mu0, ireals)

    # ---- delta-M scaling with 2N moments (chi_l = g^l for HG) ----------
    L = 2 * N - 1
    fpeak = g ** (2 * N)
    dtau_s = (1.0 - w0 * fpeak) * dtau
    w0_s = jnp.clip(w0 * (1.0 - fpeak) / jnp.maximum(1.0 - w0 * fpeak, 1e-12), 0.0, 1.0 - 1e-6)

    mu_np, w_np = _double_gauss(N)
    Pl = jnp.asarray(_legendre_table(L, mu_np), ireals)  # (L+1, N)
    mu = jnp.asarray(mu_np, ireals)
    wq = jnp.asarray(w_np, ireals)
    ls = np.arange(L + 1)
    two_l1 = jnp.asarray(2 * ls + 1, ireals)
    parity = jnp.asarray((-1.0) ** ls, ireals)

    # delta-scaled moments per cell: (L+1, nz, nb)
    gl = jnp.power(g[None], jnp.asarray(ls, ireals)[:, None, None])
    chi = (gl - fpeak[None]) / jnp.maximum(1.0 - fpeak[None], 1e-12)

    # azimuthally-averaged phase between quadrature bins: (nz, nb, N, N)
    coef = two_l1[:, None, None] * chi
    p_same = jnp.einsum("lzb,li,lj->zbij", coef, Pl, Pl)
    p_opp = jnp.einsum("lzb,li,lj->zbij", coef * parity[:, None, None], Pl, Pl)
    # beam -> bin phase (beam cosine mu0): (nz, nb, N)
    pl0 = [jnp.ones_like(mu0), mu0]
    for l in range(1, L):
        pl0.append(((2 * l + 1) * mu0 * pl0[l] - l * pl0[l - 1]) / (l + 1))
    Pl0 = jnp.stack(pl0)  # (L+1,)
    pb_same = jnp.einsum("lzb,l,li->zbi", coef, Pl0, Pl)
    pb_opp = jnp.einsum("lzb,l,li->zbi", coef * parity[:, None, None], Pl0, Pl)

    # ---- thin-layer initialization (flux-bin representation) -----------
    # Second-order accurate in dt0 so a moderate doubling count keeps
    # f32 round-off harmless: with generator blocks A (within-hemisphere)
    # and B (cross-hemisphere),
    #   T(dt) = I + dt A + dt^2/2 (A^2 + B^2) + O(dt^3)
    #   R(dt) =     dt B + dt^2/2 (A B + B A) + O(dt^3)
    # and source vectors gain the matching dt^2/2 corrections.
    # per-layer doubling count: start every layer near dtau0 ~ 2^-7 so
    # thin layers do FEW doublings (f32 round-off accumulates per
    # doubling) while thick layers still reach their full dtau
    delta0 = 2.0 ** -7
    m_dbl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(dtau_s, 1e-20) / delta0)), 0, n_double
    )  # (nz, nb)
    dt0 = dtau_s / (2.0 ** m_dbl)
    half_w0 = 0.5 * w0_s
    # gain_ij = (w0/2) w_i p_ij / mu_j
    gain_s = half_w0[..., None, None] * wq[:, None] * p_same / mu[None, None, None, :]
    gain_o = half_w0[..., None, None] * wq[:, None] * p_opp / mu[None, None, None, :]
    eye = jnp.eye(N, dtype=ireals)
    A = gain_s - jnp.diag(1.0 / mu)
    B = gain_o
    d1 = dt0[..., None, None]
    h2 = 0.5 * d1 * d1
    T = eye + d1 * A + h2 * (A @ A + B @ B)
    R = d1 * B + h2 * (A @ B + B @ A)
    # solar sources per unit (tilted) beam flux at the sub-layer top
    sig_m = half_w0[..., None] * wq * pb_same  # down->down, per unit dtau
    sig_p = half_w0[..., None] * wq * pb_opp  # down->up
    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)
    h2v = 0.5 * dt0[..., None] * dt0[..., None]
    inv_mu0 = 1.0 / jnp.maximum(mu0, 1e-6)
    sm = dt0[..., None] * sig_m + h2v * (mv(A, sig_m) + mv(B, sig_p) - inv_mu0 * sig_m)
    sp = dt0[..., None] * sig_p + h2v * (mv(A, sig_p) + mv(B, sig_m) - inv_mu0 * sig_p)
    tb = jnp.exp(-dt0 * inv_mu0)
    if with_thermal:
        sig_t = (1.0 - w0_s)[..., None] * (2.0 * jnp.pi) * wq * b_layer.reshape(nz, nb)[..., None]
        em = dt0[..., None] * sig_t + h2v * (mv(A, sig_t) + mv(B, sig_t))
        tp = em
        tm = em
    else:
        tp = tm = jnp.zeros_like(sm)

    # ---- doubling (layers stop once their m_dbl count is reached) ------
    def dbl(j, state):
        R, T, sp, sm, tp, tm, tb = state
        D = jnp.linalg.inv(eye - R @ R)
        TD = T @ D
        Rn = R + TD @ (R @ T)
        Tn = TD @ T
        d_s = (D @ (sm + tb[..., None] * jnp.einsum("...ij,...j->...i", R, sp))[..., None])[..., 0]
        sp_n = sp + jnp.einsum("...ij,...j->...i", T, jnp.einsum("...ij,...j->...i", R, d_s) + tb[..., None] * sp)
        sm_n = jnp.einsum("...ij,...j->...i", T, d_s) + tb[..., None] * sm
        d_t = (D @ (tm + jnp.einsum("...ij,...j->...i", R, tp))[..., None])[..., 0]
        tp_n = tp + jnp.einsum("...ij,...j->...i", T, jnp.einsum("...ij,...j->...i", R, d_t) + tp)
        tm_n = jnp.einsum("...ij,...j->...i", T, d_t) + tm
        act_m = (j < m_dbl)[..., None, None]
        act_v = (j < m_dbl)[..., None]
        return (
            jnp.where(act_m, Rn, R), jnp.where(act_m, Tn, T),
            jnp.where(act_v, sp_n, sp), jnp.where(act_v, sm_n, sm),
            jnp.where(act_v, tp_n, tp), jnp.where(act_v, tm_n, tm),
            jnp.where(j < m_dbl, tb * tb, tb),
        )

    R, T, sp, sm, tp, tm, _ = jax.lax.fori_loop(
        0, n_double, dbl, (R, T, sp, sm, tp, tm, tb)
    )

    # ---- beam attenuation to each level --------------------------------
    tb_layer = jnp.exp(-dtau_s / jnp.maximum(mu0, 1e-6))  # (nz, nb)
    S_lvl = incSolar * jnp.concatenate(
        [jnp.ones((1, nb), ireals), jnp.cumprod(tb_layer, axis=0)], axis=0
    )  # (nz+1, nb), tilted units

    # per-layer sources at their actual beam strength (+ thermal)
    src_m = sm * S_lvl[:-1, :, None] + tm  # emergent downward at layer bottom
    src_p = sp * S_lvl[:-1, :, None] + tp  # emergent upward at layer top

    # ---- surface -------------------------------------------------------
    refl_bins = 2.0 * mu * wq  # Lambertian redistribution over bins
    R_sfc = alb[:, None, None] * refl_bins[None, :, None] * jnp.ones((nb, N, N), ireals)
    dir_sfc = mu0 * S_lvl[-1]  # direct horizontal flux at the surface
    Sup_sfc = alb[:, None] * refl_bins[None, :] * dir_sfc[:, None]
    if with_thermal:
        Sup_sfc = Sup_sfc + (1.0 - alb)[:, None] * (2.0 * jnp.pi) * (mu * wq)[None, :] * b_srfc.reshape(nb)[:, None]

    # ---- sweep 1: bottom-up (R_below, S_up at every level) -------------
    def up_step(carry, layer):
        R_b, S_u = carry
        Rk, Tk, smk, spk = layer
        # interface below layer k: u = R_b d + S_u ; d = smk + Rk u
        M = eye - Rk @ R_b
        d = jnp.linalg.solve(M, (smk + jnp.einsum("...ij,...j->...i", Rk, S_u))[..., None])[..., 0]
        u = jnp.einsum("...ij,...j->...i", R_b, d) + S_u
        S_u_new = spk + jnp.einsum("...ij,...j->...i", Tk, u)
        # R_new = R_k + T_k R_b (I - R_k R_b)^-1 T_k
        R_b_new = Rk + Tk @ (R_b @ jnp.linalg.solve(M, Tk))
        return (R_b_new, S_u_new), (R_b, S_u)

    layers_rev = (R[::-1], T[::-1], src_m[::-1], src_p[::-1])
    (R_b0, S_u0), (R_b_hist, S_u_hist) = jax.lax.scan(
        up_step, (R_sfc, Sup_sfc), layers_rev
    )
    # histories are for levels Nz..1 (below each processed layer); build
    # per-level arrays indexed 0..Nz
    R_below = jnp.concatenate([R_b0[None], R_b_hist[::-1]], axis=0)  # (nz+1,...)
    S_up = jnp.concatenate([S_u0[None], S_u_hist[::-1]], axis=0)

    # ---- sweep 2: top-down (downward flux bins at every level) ---------
    def dn_step(d_k, layer):
        Rk, Tk, smk, Rb1, Su1 = layer
        rhs = jnp.einsum("...ij,...j->...i", Tk, d_k) + smk + jnp.einsum("...ij,...j->...i", Rk, Su1)
        d_next = jnp.linalg.solve(eye - Rk @ Rb1, rhs[..., None])[..., 0]
        return d_next, d_k

    d_toa = jnp.zeros((nb, N), ireals)
    d_last, d_hist = jax.lax.scan(
        dn_step, d_toa, (R, T, src_m, R_below[1:], S_up[1:])
    )
    d_all = jnp.concatenate([d_hist, d_last[None]], axis=0)  # (nz+1, nb, N)
    u_all = jnp.einsum("kbij,kbj->kbi", R_below, d_all) + S_up

    Edn = d_all.sum(-1).reshape((nz + 1,) + batch)
    Eup = u_all.sum(-1).reshape((nz + 1,) + batch)
    S = S_lvl.reshape((nz + 1,) + batch)
    return S, Edn, Eup


def disort_fluxes(
    dtau, w0, g, mu0, incSolar, albedo,
    planck=None, planck_srfc=None,
    nstreams: int = 8, n_double: int = 14,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(S, Edn, Eup) at the Nz+1 levels for every column.

    nstreams is per hemisphere (8 -> a 16-stream DISORT run).  `planck`
    at levels [W/m2/sr] adds thermal emission (layer-mean B); the beam
    term is skipped when `incSolar` is 0.

    Every layer starts its doubling near dtau0 ~ 2^-7 and runs only the
    doublings it needs (up to n_double; layers thicker than
    2^-7 * 2^n_double start coarser).  With the second-order thin-layer
    initialization this keeps both the truncation error and the f32
    round-off (which grows with the doubling count) small.  Validated
    against the in-repo Monte Carlo to < 0.1% on thick anisotropic
    clouds (tests/test_disort.py).
    """
    dtau = jnp.asarray(dtau, ireals)
    with_thermal = planck is not None
    if with_thermal:
        planck = jnp.asarray(planck, ireals)
        b_layer = 0.5 * (planck[:-1] + planck[1:])
        b_srfc = planck[-1] if planck_srfc is None else jnp.asarray(planck_srfc, ireals)
    else:
        b_layer = jnp.zeros_like(dtau)
        b_srfc = jnp.zeros_like(dtau[0])
    mu0 = jnp.asarray(1.0 if mu0 is None else mu0, ireals)
    mu0 = jnp.where(mu0 > 1e-6, mu0, 1.0)
    return _disort_core(
        dtau, jnp.asarray(w0, ireals), jnp.asarray(g, ireals), mu0,
        jnp.asarray(incSolar, ireals), albedo, b_layer, b_srfc,
        int(nstreams), int(n_double), bool(with_thermal),
    )
