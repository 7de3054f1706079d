"""Vectorized Monte-Carlo photon tracing through a unit box.

Parity: reference `src/boxmc.F90` (`t_boxmc%get_coeff`:395,
`run_photons`:559, `move_photon`:742, `scatter_photon`:847 with
Henyey-Greenstein sampling `hengreen`:819, `roulette`:682) and
`src/boxmc_geometry.F90` (cube intersections).

TPU-first redesign: the whole photon batch advances in lockstep inside a
`lax.while_loop` with alive masks — every step is a fused vector op over
N photons.  Photon state is stored as SEPARATE (N,) coordinate arrays
(structure-of-arrays): an (N, 3) layout would pad the 3-wide trailing dim
to the 128-lane tile and waste ~40x of the VPU.

Absorption uses implicit capture (weight *= exp(-kabs * pathlength) with
scattering-only free paths) — lower variance than analog absorption, so
tallies converge with fewer photons.  Low-weight photons die by Russian
roulette (unbiased).  Walks in optically thick conservative media are
truncated at `max_iter`; the surviving weight is redistributed onto the
already-tallied diffuse exit distribution (self-normalized, keeps energy
conservation exact; the reference instead biases via tau-scaling,
`src/boxmc.F90` tau_scaling).

Conventions (see `tenstream_tpu.boxmc.schemes`): box [0,dx]x[0,dy]x[0,dz],
z is altitude, canonical sun octant (+x, +y, -z).

Outputs are (T, S): per-destination fractions of the injected power
leaving as direct (T, direct sources only) or diffuse (S) radiation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.boxmc.schemes import BoxScheme, get_box_scheme

_WEIGHT_ROULETTE = 1e-4
_ROULETTE_SURVIVE = 0.5
_BIG = 1e30


def _hg_costheta(u, g):
    """Sample cos(theta) from the Henyey-Greenstein phase function."""
    iso = jnp.abs(g) < 1e-4
    g_safe = jnp.where(iso, 0.5, g)
    frac = (1.0 - g_safe**2) / (1.0 - g_safe + 2.0 * g_safe * u)
    ct_hg = (1.0 + g_safe**2 - frac**2) / (2.0 * g_safe)
    ct_iso = 2.0 * u - 1.0
    return jnp.clip(jnp.where(iso, ct_iso, ct_hg), -1.0, 1.0)


def _rotate_about(dx, dy, dz, ct, phi):
    """New direction at angle acos(ct) from (dx,dy,dz) with azimuth phi."""
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    denom = jnp.sqrt(jnp.maximum(1e-12, 1.0 - dz * dz))
    straight_up = jnp.abs(dz) > 0.99999
    ux = jnp.where(straight_up, 1.0, dy / denom)
    uy = jnp.where(straight_up, 0.0, -dx / denom)
    # v = d x u
    vx = uy * dz
    vy = -ux * dz
    vz = ux * dy - uy * dx
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    nx = st * (cp * ux + sp * vx) + ct * dx
    ny = st * (cp * uy + sp * vy) + ct * dy
    nz = st * sp * vz + ct * dz
    norm = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    return nx / norm, ny / norm, nz / norm


def _sample_on_face(key, face, bx, by, bz, n, rect=None):
    """Uniform positions on a box face (or a sub-rectangle of it),
    nudged slightly inside."""
    u1 = jax.random.uniform(key, (2, n))
    eps = 1e-6
    u, v = u1[0], u1[1]
    if rect is not None:
        u0, u1_, v0, v1_ = rect
        u = u0 + u * (u1_ - u0)
        v = v0 + v * (v1_ - v0)
    if face == 0:
        return u * bx, v * by, jnp.full((n,), bz * (1 - eps))
    if face == 1:
        return u * bx, v * by, jnp.full((n,), bz * eps)
    if face == 2:
        return jnp.full((n,), bx * eps), v * by, u * bz
    if face == 3:
        return jnp.full((n,), bx * (1 - eps)), v * by, u * bz
    if face == 4:
        return u * bx, jnp.full((n,), by * eps), v * bz
    return u * bx, jnp.full((n,), by * (1 - eps)), v * bz


_SECTOR_CENTERS = [0.0, 1.5 * jnp.pi, jnp.pi, 0.5 * jnp.pi]  # +y, -x, -y, +x


def _sample_lambertian(key, face, zsign, n, phi_sector=None, quadrant=None,
                       mu_min=0.0, mu_max=1.0):
    """Lambertian directions about the inward normal of `face`;
    optionally restricted to the up/down hemisphere (zsign), an azimuth
    sector or tangential quadrant, and a mu window.

    Reference: `init_diff_photon_3_10` samples mu = sqrt(R) about the
    face normal (`src/boxmc_3_10.inc:191`) with azimuth windows selecting
    the hemisphere (:244-254); windowed mu = sqrt(interv_R(lo^2, hi^2))
    as in `boxmc_3_30.inc:354-356`; quadrant windows are the 90-degree
    phi intervals of `init_diff_photon_3_24`.
    """
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    mu = jnp.sqrt(mu_min * mu_min + u * (mu_max * mu_max - mu_min * mu_min))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
    if phi_sector is not None and face in (0, 1):
        # azimuth restricted to a 90-degree sector about an axis
        # (reference `init_diff_photon_3_16` phi windows)
        phi = float(_SECTOR_CENTERS[phi_sector]) + (jax.random.uniform(k2, (n,)) - 0.5) * (0.5 * jnp.pi)
        dx_ = st * jnp.sin(phi)
        dy_ = st * jnp.cos(phi)
        dz_ = mu if face == 1 else -mu  # BOT sources go up, TOP go down
        return dx_, dy_, dz_
    phi = jax.random.uniform(k2, (n,)) * (2.0 * jnp.pi)
    a = st * jnp.cos(phi)
    b = st * jnp.sin(phi)
    if quadrant is not None:
        # force the tangential signs: q = 2*(t1<0) + (t2<0); the
        # cosine-weighted distribution is azimuthally symmetric, so
        # folding |.| keeps it correct within the quadrant
        s1 = 1.0 if quadrant in (0, 1) else -1.0
        s2 = 1.0 if quadrant in (0, 2) else -1.0
        t1 = jnp.abs(a) * s1
        t2 = jnp.abs(b) * s2
        if face == 0:
            return t1, t2, -mu
        if face == 1:
            return t1, t2, mu
        if face == 2:
            return mu, t1, t2
        if face == 3:
            return -mu, t1, t2
        if face == 4:
            return t1, mu, t2
        return t1, -mu, t2
    if face == 0:
        d = (a, b, -mu)
    elif face == 1:
        d = (a, b, mu)
    elif face == 2:
        d = (mu, a, b)
    elif face == 3:
        d = (-mu, a, b)
    elif face == 4:
        d = (a, mu, b)
    else:
        d = (a, -mu, b)
    dx, dy, dz = d
    if zsign != 0:
        dz = jnp.where(zsign > 0, jnp.abs(dz), -jnp.abs(dz))
    return dx, dy, dz


def _exit_face(px, py, pz, dx, dy, dz, bx, by, bz):
    """Distance to the box boundary and the face id that is hit."""

    def axis_t(p, d, hi):
        d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        bound = jnp.where(d > 0, hi, 0.0)
        t = (bound - p) / d_safe
        return jnp.where(jnp.abs(d) < 1e-12, _BIG, jnp.maximum(t, 0.0))

    tx = axis_t(px, dx, bx)
    ty = axis_t(py, dy, by)
    tz = axis_t(pz, dz, bz)
    tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
    face = jnp.where(
        tmin == tz,
        jnp.where(dz > 0, 0, 1),
        jnp.where(
            tmin == tx,
            jnp.where(dx > 0, 3, 2),
            jnp.where(dy > 0, 5, 4),
        ),
    )
    return tmin, face


@functools.partial(
    jax.jit,
    static_argnames=("scheme_name", "src", "ldir", "n_photons", "max_iter", "periodic_xy"),
)
def run_boxmc(
    key,
    scheme_name: str,
    src: int,
    ldir: bool,
    tauz,
    w0,
    g,
    aspect,
    phi_deg=0.0,
    theta_deg=0.0,
    n_photons: int = 10000,
    max_iter: int = 3000,
    periodic_xy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace a photon batch for one (source, optical-state) combination.

    Returns (T, S): direct and diffuse destination tallies, normalized by
    the injected power (reference `t_boxmc%get_coeff`, `src/boxmc.F90:395`).
    """
    scheme = get_box_scheme(scheme_name)
    bx = jnp.asarray(1.0, jnp.float32)
    by = jnp.asarray(1.0, jnp.float32)
    bz = jnp.maximum(jnp.asarray(aspect, jnp.float32), 1e-6)
    kext = jnp.asarray(tauz, jnp.float32) / bz
    w0 = jnp.asarray(w0, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    ksca = w0 * kext
    kabs = (1.0 - w0) * kext

    kpos, kdir, kloop = jax.random.split(key, 3)

    if ldir:
        face = scheme.dir_src_faces[src]
        rect = scheme.dir_src_rects[src] if scheme.dir_src_rects else None
        px, py, pz = _sample_on_face(kpos, face, bx, by, bz, n_photons, rect=rect)
        phi = jnp.deg2rad(jnp.asarray(phi_deg, jnp.float32))
        theta = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
        sx = jnp.sin(phi) * jnp.sin(theta)
        sy = jnp.cos(phi) * jnp.sin(theta)
        sz = -jnp.cos(theta)
        dx = jnp.full((n_photons,), sx)
        dy = jnp.full((n_photons,), sy)
        dz = jnp.full((n_photons,), sz)
    else:
        spec = scheme.diff_srcs[src]
        px, py, pz = _sample_on_face(kpos, spec.face, bx, by, bz, n_photons)
        dx, dy, dz = _sample_lambertian(
            kdir, spec.face, spec.zsign, n_photons,
            phi_sector=spec.phi_sector, quadrant=spec.quadrant,
            mu_min=spec.mu_min, mu_max=spec.mu_max,
        )

    weights = jnp.ones((n_photons,), jnp.float32)
    alive = jnp.ones((n_photons,), bool)
    scattered = jnp.zeros((n_photons,), bool)

    dir_table = jnp.asarray(scheme.dir_dst_by_face, jnp.int32)
    diff_table = jnp.asarray(scheme.diff_dst_by_face_zsign, jnp.int32)  # (6,2)

    _fc_mode = _fc_tbl = None
    if scheme.diff_face_class is not None:
        _mode_ids = {"zsign": 0, "quad": 1, "quad_main": 2, "sector_main": 3,
                     "ring": 4}
        modes, tbl = [], []
        for mode, dsts in scheme.diff_face_class:
            modes.append(_mode_ids[mode])
            tbl.append(list(dsts) + [0] * (5 - len(dsts)))
        _fc_mode = jnp.asarray(modes, jnp.int32)
        _fc_tbl = jnp.asarray(tbl, jnp.int32)  # (6, 5)

    T0 = jnp.zeros((scheme.ndir + 1,), jnp.float32)
    S0 = jnp.zeros((scheme.ndiff + 1,), jnp.float32)

    def cond(state):
        i, _, st, T, S = state
        return jnp.logical_and(i < max_iter, jnp.any(st[7]))

    def body(state):
        i, key, st, T, S = state
        px, py, pz, dx, dy, dz, weights, alive, scattered = st
        key, ks, kphi, kct, krou = jax.random.split(key, 5)

        dmax, face = _exit_face(px, py, pz, dx, dy, dz, bx, by, bz)
        u = jax.random.uniform(ks, (n_photons,), minval=1e-12)
        s_free = jnp.where(ksca > 1e-12, -jnp.log(u) / jnp.maximum(ksca, 1e-12), _BIG)
        travel = jnp.minimum(s_free, dmax)
        weights = weights * jnp.exp(-kabs * travel)
        px = px + dx * travel
        py = py + dy * travel
        pz = pz + dz * travel

        hit_boundary = alive & (s_free >= dmax)
        if periodic_xy:
            side = (face >= 2) & hit_boundary
            px = jnp.where(side & (face == 2), bx, jnp.where(side & (face == 3), 0.0, px))
            py = jnp.where(side & (face == 4), by, jnp.where(side & (face == 5), 0.0, py))
            exiting = hit_boundary & (face < 2)
        else:
            exiting = hit_boundary

        up = dz > 0
        diff_dst = diff_table[face, up.astype(jnp.int32)]
        if scheme.diff_face_class is not None:
            # general per-face angular binning (quadrants / main streams;
            # reference `update_diff_stream_3_24/_3_30/_8_18`)
            t1 = jnp.where(face <= 1, dx, jnp.where(face <= 3, dy, dx))
            t2 = jnp.where(face <= 1, dy, dz)
            mu_n = jnp.where(
                face <= 1, jnp.abs(dz),
                jnp.where(face <= 3, jnp.abs(dx), jnp.abs(dy)),
            )
            quad = 2 * (t1 <= 0).astype(jnp.int32) + (t2 <= 0).astype(jnp.int32)
            sector = jnp.where(
                jnp.abs(t2) > jnp.abs(t1),
                jnp.where(t2 > 0, 0, 2),
                jnp.where(t1 > 0, 3, 1),
            )
            is_main = mu_n >= scheme.alim
            col = jnp.take(_fc_mode, face)
            col = jnp.select(
                [col == 0, col == 1, col == 2, col == 3, col == 4],
                [
                    up.astype(jnp.int32),  # zsign
                    quad,  # quad
                    jnp.where(is_main, 0, 1 + quad),  # quad_main
                    jnp.where(is_main, 0, 1 + sector),  # sector_main
                    jnp.where(is_main, 0, 1),  # ring (mu split at alim)
                ],
            )
            diff_dst = _fc_tbl[face, col]
        elif scheme.diff_top_sector_dst is not None:
            # azimuth-sector binning of top/bot-face exits
            # (reference `update_diff_stream_3_16`)
            sector = jnp.where(
                jnp.abs(dy) > jnp.abs(dx),
                jnp.where(dy > 0, 0, 2),
                jnp.where(dx > 0, 3, 1),
            )
            top_tbl = jnp.asarray(scheme.diff_top_sector_dst, jnp.int32)  # (2, 4)
            sector_dst = top_tbl[jnp.clip(face, 0, 1), sector]
            diff_dst = jnp.where(face <= 1, sector_dst, diff_dst)
        if ldir:
            if scheme.dir_classify == "quad8":
                # top/bot quadrants + side z-halves (update_dir_stream_8_10)
                quad = (px > 0.5 * bx).astype(jnp.int32) + 2 * (py > 0.5 * by).astype(jnp.int32)
                zhalf = (pz > 0.5 * bz).astype(jnp.int32)
                dir_dst = jnp.where(
                    face <= 1, quad,
                    jnp.where(face <= 3, 4 + zhalf, 6 + zhalf),
                )
            else:
                dir_dst = dir_table[face]
                dir_dst = jnp.where(dir_dst < 0, scheme.ndir, dir_dst)
            as_direct = exiting & (~scattered)
            as_diffuse = exiting & scattered
            T = T.at[jnp.where(as_direct, dir_dst, scheme.ndir)].add(
                jnp.where(as_direct, weights, 0.0)
            )
            S = S.at[jnp.where(as_diffuse, diff_dst, scheme.ndiff)].add(
                jnp.where(as_diffuse, weights, 0.0)
            )
        else:
            S = S.at[jnp.where(exiting, diff_dst, scheme.ndiff)].add(
                jnp.where(exiting, weights, 0.0)
            )

        scattering = alive & (s_free < dmax)
        ct = _hg_costheta(jax.random.uniform(kct, (n_photons,)), g)
        sphi = jax.random.uniform(kphi, (n_photons,)) * (2.0 * jnp.pi)
        ndx, ndy, ndz = _rotate_about(dx, dy, dz, ct, sphi)
        dx = jnp.where(scattering, ndx, dx)
        dy = jnp.where(scattering, ndy, dy)
        dz = jnp.where(scattering, ndz, dz)
        scattered = scattered | scattering
        alive = alive & (~exiting)

        # Russian roulette on low weights (reference `roulette`:682)
        low = alive & (weights < _WEIGHT_ROULETTE)
        surv = jax.random.uniform(krou, (n_photons,)) < _ROULETTE_SURVIVE
        weights = jnp.where(low & surv, weights / _ROULETTE_SURVIVE, weights)
        alive = alive & ((~low) | surv)

        st = (px, py, pz, dx, dy, dz, weights, alive, scattered)
        return (i + 1, key, st, T, S)

    st0 = (px, py, pz, dx, dy, dz, weights, alive, scattered)
    _, _, st, T, S = jax.lax.while_loop(cond, body, (0, kloop, st0, T0, S0))

    # Truncated walks (max_iter reached in thick conservative media):
    # redistribute the surviving weight onto the tallied diffuse exit
    # distribution so energy is conserved.
    leftover = jnp.sum(jnp.where(st[7], st[6], 0.0))
    s_main = S[: scheme.ndiff]
    s_sum = jnp.sum(s_main)
    s_main = jnp.where(s_sum > 0, s_main * (1.0 + leftover / jnp.maximum(s_sum, 1e-30)), s_main)

    norm = 1.0 / float(n_photons)
    return T[: scheme.ndir] * norm, s_main * norm
