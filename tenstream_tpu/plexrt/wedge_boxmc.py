"""Monte-Carlo photon tracing through a triangular wedge (prism).

Parity: reference `src/boxmc_wedge_5_8.inc` (5 direct + 8 diffuse
streams: top, 3 side faces split into down/up hemispheres, bottom),
`src/boxmc_wedge_5_5.inc` (5 + 5: one diffuse dof per face, full
hemispheres) and `src/boxmc_wedge_18_8.inc` (18 + 8: direct streams
resolved to face QUARTERS — top/bot split into 3 corner quads around
the centroid, each side into 2x2 via edge midpoints) with the cube
tracer's physics (`src/boxmc.F90`: Henyey-Greenstein scattering,
implicit capture, roulette).

Canonical prism: triangle A=(0,0), B=(dx,0), C=(dx,dy) extruded over
z in [0, dz] — the lower-right triangle of a rectangle split along its
diagonal.  The second mesh orientation (upper-left triangle) is this
one rotated by 180 degrees, so its coefficients come from the same
tables evaluated at phi+180 (see `plexrt.mesh`).

Faces: 0 TOP (z=dz), 1 BOT (z=0), 2 side AB (y=0), 3 side BC (x=dx),
4 side CA (the diagonal).

Diffuse dofs (5_8, also the diffuse side of 18_8):
  [0: top(up-out), 1: AB dn, 2: AB up, 3: BC dn, 4: BC up,
   5: CA dn, 6: CA up, 7: bot(dn-out)].
Diffuse dofs (5_5): [0 top, 1 AB, 2 BC, 3 CA, 4 bot].
Direct dofs (5_8 / 5_5) = faces (0 top, 1..3 sides AB/BC/CA, 4 bot).
Direct dofs (18_8), our canonical sub-face order (the reference's own
ordering is tied to ITS vertex naming; ours is self-consistent and
tested): top corners [0=A, 1=B, 2=C]; per side face 4 quads ordered
(z-top,u-low), (z-top,u-high), (z-bot,u-low), (z-bot,u-high) with u
the A->B / B->C / A->C edge parameter: AB=3..6, BC=7..10, CA=11..14;
bottom corners [15=A, 16=B, 17=C].
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.boxmc.tracer import (
    _BIG,
    _ROULETTE_SURVIVE,
    _WEIGHT_ROULETTE,
    _hg_costheta,
    _rotate_about,
)

NDIR = 5
NDIFF = 8

# scheme -> (ndir, ndiff); parity: the reference's wedge geometry set
# (`src/boxmc_wedge_{5_5,5_8,18_8}.inc`)
WEDGE_SCHEMES = {"5_8": (5, 8), "5_5": (5, 5), "18_8": (18, 8)}


def _side_normals(bx, by, cx=None, cy=None):
    """Inward unit normals of the 3 side planes (AB, BC, CA) for the
    general triangle A=(0,0), B=(bx,0), C=(cx,cy); the canonical table
    shape is the cx=bx, cy=by right triangle."""
    if cx is None:
        cx, cy = bx, by
    # AB: y = 0, inward +y
    # BC: edge B->C = (cx-bx, cy); inward normal points toward A
    Lbc = jnp.sqrt((cx - bx) ** 2 + cy * cy)
    nbc = (-cy / Lbc, (cx - bx) / Lbc)
    # CA: edge A->C = (cx, cy); inward normal points toward B
    Lca = jnp.sqrt(cx * cx + cy * cy)
    nca = (cy / Lca, -cx / Lca)
    return ((0.0, 1.0), nbc, nca)


def _sample_in_triangle(key, bx, by, n, cx=None, cy=None):
    """Uniform points in triangle (0,0),(bx,0),(cx,cy)."""
    if cx is None:
        cx, cy = bx, by
    k1, k2 = jax.random.split(key)
    r1 = jnp.sqrt(jax.random.uniform(k1, (n,)))
    r2 = jax.random.uniform(k2, (n,))
    # P = (1-sqrt r1) A + sqrt r1 (1-r2) B + sqrt r1 r2 C
    x = r1 * (1.0 - r2) * bx + r1 * r2 * cx
    y = r1 * r2 * cy
    return x, y


def _exit_face_wedge(px, py, pz, dx, dy, dz, bx, by, bz, cx=None, cy=None):
    """Distance to the prism boundary and the face id hit (0..4)."""
    if cx is None:
        cx, cy = bx, by

    def plane_t(num, den):
        den_safe = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        t = num / den_safe
        return jnp.where((den < 1e-12), _BIG, jnp.maximum(t, 0.0))

    t_top = plane_t(bz - pz, dz)
    t_bot = plane_t(pz, -dz)
    t_ab = plane_t(py, -dy)  # distance to y=0 moving with -dy
    # BC plane through B with inward normal nbc: s = nbc.(p - B) >= 0
    (_, (nbcx, nbcy), (ncax, ncay)) = _side_normals(bx, by, cx, cy)
    s_bc = nbcx * (px - bx) + nbcy * py
    ds_bc = nbcx * dx + nbcy * dy
    t_bc = plane_t(s_bc, -ds_bc)
    # CA plane through the origin: s = nca.p >= 0 inside
    s_ca = ncax * px + ncay * py
    ds_ca = ncax * dx + ncay * dy
    t_ca = plane_t(s_ca, -ds_ca)

    ts = jnp.stack([t_top, t_bot, t_ab, t_bc, t_ca])
    face = jnp.argmin(ts, axis=0).astype(jnp.int32)
    tmin = jnp.min(ts, axis=0)
    return tmin, face


def _sample_on_wedge_face(key, face, bx, by, bz, n, cx=None, cy=None):
    """Uniform positions on one of the 5 faces, nudged inside."""
    if cx is None:
        cx, cy = bx, by
    eps = 1e-6
    k1, k2 = jax.random.split(key)
    if face == 0:
        x, y = _sample_in_triangle(key, bx, by, n, cx, cy)
        return x, y, jnp.full((n,), bz * (1 - eps))
    if face == 1:
        x, y = _sample_in_triangle(key, bx, by, n, cx, cy)
        return x, y, jnp.full((n,), bz * eps)
    u = jax.random.uniform(k1, (n,))
    z = jax.random.uniform(k2, (n,)) * bz
    normals = _side_normals(bx, by, cx, cy)
    if face == 2:  # AB: A + u*(B-A), nudge inward (+y)
        return u * bx, jnp.zeros((n,)) + eps * by, z
    if face == 3:  # BC: B + u*(C-B)
        nx, ny = normals[1]
        return (bx + u * (cx - bx) + eps * bx * nx,
                u * cy + eps * by * ny, z)
    # CA: A + u*(C-A)
    nx, ny = normals[2]
    return u * cx + eps * bx * nx, u * cy + eps * by * ny, z


def _sample_lambertian_wedge(key, face, zsign, bx, by, n, cx=None, cy=None):
    """Cosine-weighted directions about the inward normal of `face`;
    side faces optionally restricted to the down/up hemisphere."""
    k1, k2 = jax.random.split(key)
    mu = jnp.sqrt(jax.random.uniform(k1, (n,)))
    phi = jax.random.uniform(k2, (n,)) * (2.0 * jnp.pi)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
    a = st * jnp.cos(phi)
    b = st * jnp.sin(phi)
    if face == 0:
        return a, b, -mu
    if face == 1:
        return a, b, mu
    normals = _side_normals(bx, by, cx, cy)
    nx, ny = normals[face - 2]
    # local frame: normal=(nx,ny,0); tangent t=(-ny,nx,0); binormal=z
    dxv = mu * nx - a * ny
    dyv = mu * ny + a * nx
    dzv = b
    if zsign != 0:
        dzv = jnp.where(zsign > 0, jnp.abs(dzv), -jnp.abs(dzv))
    return dxv, dyv, dzv


# diffuse source spec per dof: (face, zsign)
_DIFF_SRCS = (
    (0, 0),  # dof 0: enters through TOP going down
    (2, -1), (2, +1),  # AB dn/up
    (3, -1), (3, +1),  # BC
    (4, -1), (4, +1),  # CA
    (1, 0),  # dof 7: enters through BOT going up
)

# 5_5: one dof per face, full hemisphere (boxmc_wedge_5_5.inc:139-233)
_DIFF_SRCS_5_5 = ((0, 0), (2, 0), (3, 0), (4, 0), (1, 0))

# 18_8 direct source -> (face, subface); subface semantics per face:
# top/bot: corner id (0=A, 1=B, 2=C); sides: 0=(z-top,u-low),
# 1=(z-top,u-high), 2=(z-bot,u-low), 3=(z-bot,u-high)
_DIR_SRCS_18 = (
    [(0, c) for c in range(3)]
    + [(2, q) for q in range(4)]
    + [(3, q) for q in range(4)]
    + [(4, q) for q in range(4)]
    + [(1, c) for c in range(3)]
)


def _sample_in_quad(key, quad, n):
    """Uniform points in a planar 2-D quad (P0,P1,P2,P3) whose two
    sub-triangles (P0,P1,P2) and (P0,P2,P3) have EQUAL area — true for
    every corner quad of the midpoint/centroid subdivision."""
    k1, k2, k3 = jax.random.split(key, 3)
    pick = jax.random.uniform(k1, (n,)) < 0.5
    r1 = jax.random.uniform(k2, (n,))
    r2 = jax.random.uniform(k3, (n,))
    s = jnp.sqrt(r1)
    p0, p1, p2, p3 = [jnp.asarray(p, jnp.float32) for p in quad]
    pa = jnp.where(pick[:, None], p1, p2)
    pb = jnp.where(pick[:, None], p2, p3)
    pt = (1 - s)[:, None] * p0 + (s * (1 - r2))[:, None] * pa + (s * r2)[:, None] * pb
    return pt[:, 0], pt[:, 1]


def _corner_quads(bx, by, cx=None, cy=None):
    """The three equal-area corner quads of triangle A,B,C."""
    if cx is None:
        cx, cy = bx, by
    A = jnp.stack([jnp.zeros_like(bx), jnp.zeros_like(by)])
    B = jnp.stack([bx, jnp.zeros_like(by)])
    C = jnp.stack([cx * jnp.ones_like(bx), cy * jnp.ones_like(by)])
    G = (A + B + C) / 3.0
    mAB, mBC, mAC = (A + B) / 2, (B + C) / 2, (A + C) / 2
    return (
        (A, mAB, G, mAC),  # corner A
        (B, mBC, G, mAB),  # corner B
        (C, mAC, G, mBC),  # corner C
    )


def _sample_on_wedge_subface(key, face, sub, bx, by, bz, n, cx=None, cy=None):
    """Uniform positions on one 18_8 direct sub-face, nudged inside."""
    if cx is None:
        cx, cy = bx, by
    eps = 1e-6
    if face in (0, 1):
        quad = _corner_quads(bx, by, cx, cy)[sub]
        x, y = _sample_in_quad(key, quad, n)
        z = jnp.full((n,), bz * (1 - eps) if face == 0 else bz * eps)
        return x, y, z
    k1, k2 = jax.random.split(key)
    u0, u1 = (0.0, 0.5) if sub in (0, 2) else (0.5, 1.0)
    z0, z1 = (0.5, 1.0) if sub in (0, 1) else (0.0, 0.5)
    u = (u0 + (u1 - u0) * jax.random.uniform(k1, (n,)))
    z = (z0 + (z1 - z0) * jax.random.uniform(k2, (n,))) * bz
    normals = _side_normals(bx, by, cx, cy)
    if face == 2:  # AB: y=0, u along A->B
        return u * bx, jnp.zeros((n,)) + eps * by, z
    if face == 3:  # BC: B + u*(C-B)
        nx, ny = normals[1]
        return (bx + u * (cx - bx) + eps * bx * nx,
                u * cy + eps * by * ny, z)
    # CA, u along A->C
    nx, ny = normals[2]
    return u * cx + eps * bx * nx, u * cy + eps * by * ny, z


def _classify_subface_18(face, px, py, pz, bx, by, bz, cx=None, cy=None):
    """Exit position -> 18_8 direct dof (see module docstring order)."""
    if cx is None:
        cx, cy = bx, by
    lamC = py / cy
    lamB = (px - lamC * cx) / bx
    lamA = 1.0 - lamB - lamC
    corner = jnp.argmax(jnp.stack([lamA, lamB, lamC]), axis=0).astype(jnp.int32)
    # u along the side's edge parameter
    u_ab = px / bx
    u_bc = ((px - bx) * (cx - bx) + py * cy) / jnp.maximum(
        (cx - bx) ** 2 + cy * cy, 1e-30)
    u_ca = (px * cx + py * cy) / jnp.maximum(cx * cx + cy * cy, 1e-30)
    u = jnp.where(face == 3, u_bc, jnp.where(face == 4, u_ca, u_ab))
    sub = (
        jnp.where(pz >= bz / 2, 0, 2) + jnp.where(u >= 0.5, 1, 0)
    ).astype(jnp.int32)
    base = jnp.asarray([0, 15, 3, 7, 11], jnp.int32)[face]
    off = jnp.where(face <= 1, corner, sub)
    return base + off


@functools.partial(
    jax.jit,
    static_argnames=("src", "ldir", "n_photons", "max_iter", "scheme"),
)
def run_wedge_boxmc(
    key,
    src: int,
    ldir: bool,
    tauz,
    w0,
    g,
    aspect,
    phi_deg=0.0,
    theta_deg=0.0,
    dy_over_dx: float = 1.0,
    n_photons: int = 10000,
    max_iter: int = 3000,
    scheme: str = "5_8",
    apex=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, S) transfer fractions for one wedge source.

    aspect = dz/dx; tauz = kext*dz; phi is the azimuth of the photon
    travel direction measured like the cube tracer (phi=0 -> +y,
    phi=90 -> +x; the canonical sun octant restriction does NOT apply —
    the wedge LUT keeps the full circle).  scheme selects the stream
    geometry: "5_8" (default), "5_5" or "18_8".

    `apex=(cx, cy)` traces the GENERAL triangle A=(0,0), B=(1,0),
    C=(cx, cy) (units of dx) instead of the canonical right triangle
    C=(1, dy_over_dx) — used to quantify the canonical-table
    approximation for distorted ICON cells (reference carries triangle
    shape axes via LUT_param_phi, `src/optprop_base.F90:230-243`)."""
    ndir, ndiff = WEDGE_SCHEMES[scheme]
    bx = jnp.asarray(1.0, jnp.float32)
    by = jnp.asarray(dy_over_dx, jnp.float32)
    bz = jnp.maximum(jnp.asarray(aspect, jnp.float32), 1e-6)
    if apex is None:
        cx, cy = bx, by
    else:
        cx = jnp.asarray(apex[0], jnp.float32)
        cy = jnp.asarray(apex[1], jnp.float32)
    kext = jnp.asarray(tauz, jnp.float32) / bz
    w0 = jnp.asarray(w0, jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    ksca = w0 * kext
    kabs = (1.0 - w0) * kext

    kpos, kdir, kloop = jax.random.split(key, 3)
    if ldir:
        if scheme == "18_8":
            face, subface = _DIR_SRCS_18[src]
            px, py, pz = _sample_on_wedge_subface(
                kpos, face, subface, bx, by, bz, n_photons, cx, cy
            )
        else:
            face = (0, 2, 3, 4, 1)[src]
            px, py, pz = _sample_on_wedge_face(kpos, face, bx, by, bz, n_photons, cx, cy)
        phi = jnp.deg2rad(jnp.asarray(phi_deg, jnp.float32))
        theta = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
        sx = jnp.sin(phi) * jnp.sin(theta)
        sy = jnp.cos(phi) * jnp.sin(theta)
        sz = -jnp.cos(theta)
        dx = jnp.full((n_photons,), sx)
        dy = jnp.full((n_photons,), sy)
        dz = jnp.full((n_photons,), sz)
    else:
        face, zsign = (_DIFF_SRCS_5_5 if scheme == "5_5" else _DIFF_SRCS)[src]
        px, py, pz = _sample_on_wedge_face(kpos, face, bx, by, bz, n_photons, cx, cy)
        dx, dy, dz = _sample_lambertian_wedge(kdir, face, zsign, bx, by, n_photons, cx, cy)

    weights = jnp.ones((n_photons,), jnp.float32)
    alive = jnp.ones((n_photons,), bool)
    scattered = jnp.zeros((n_photons,), bool)

    if scheme == "5_5":
        # one dof per face, no hemisphere split
        diff_tbl = jnp.asarray([[0, 0], [4, 4], [1, 1], [2, 2], [3, 3]], jnp.int32)
    else:
        # face -> diffuse dst (dn, up): top exit -> 0, bottom exit -> 7
        diff_tbl = jnp.asarray([[0, 0], [7, 7], [1, 2], [3, 4], [5, 6]], jnp.int32)

    T0 = jnp.zeros((ndir + 1,), jnp.float32)
    S0 = jnp.zeros((ndiff + 1,), jnp.float32)

    def cond(state):
        i, _, st, T, S = state
        return jnp.logical_and(i < max_iter, jnp.any(st[7]))

    def body(state):
        i, key, st, T, S = state
        px, py, pz, dx, dy, dz, weights, alive, scattered = st
        key, ks, kphi, kct, krou = jax.random.split(key, 5)

        dmax, face = _exit_face_wedge(px, py, pz, dx, dy, dz, bx, by, bz, cx, cy)
        u = jax.random.uniform(ks, (n_photons,), minval=1e-12)
        s_free = jnp.where(ksca > 1e-12, -jnp.log(u) / jnp.maximum(ksca, 1e-12), _BIG)
        travel = jnp.minimum(s_free, dmax)
        weights = weights * jnp.exp(-kabs * travel)
        px = px + dx * travel
        py = py + dy * travel
        pz = pz + dz * travel

        exiting = alive & (s_free >= dmax)
        up = dz > 0
        diff_dst = diff_tbl[face, up.astype(jnp.int32)]

        # tallies via ONE-HOT reductions, not scatter-adds: a per-lane
        # `at[dst].add` lowers to a serialized TPU scatter (measured
        # ~150 ms PER ITERATION at 48k lanes — the whole tracer ran at
        # 0.1-0.5 M photons/s); the (lanes, nbins) one-hot contraction
        # is a fully vectorized elementwise+reduce
        def tally(acc, mask, dst):
            nb = acc.shape[0]
            oh = (dst[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :])
            w = jnp.where(mask, weights, 0.0)
            return acc + jnp.sum(jnp.where(oh, w[:, None], 0.0), axis=0)

        if ldir:
            if scheme == "18_8":
                dir_dst = _classify_subface_18(face, px, py, pz, bx, by, bz, cx, cy)
            else:
                dir_dst = jnp.asarray([0, 4, 1, 2, 3], jnp.int32)[face]
            as_direct = exiting & (~scattered)
            as_diffuse = exiting & scattered
            T = tally(T, as_direct, jnp.broadcast_to(dir_dst, weights.shape))
            S = tally(S, as_diffuse, diff_dst)
        else:
            S = tally(S, exiting, diff_dst)

        scattering = alive & (s_free < dmax)
        ct = _hg_costheta(jax.random.uniform(kct, (n_photons,)), g)
        sphi = jax.random.uniform(kphi, (n_photons,)) * (2.0 * jnp.pi)
        ndx, ndy, ndz = _rotate_about(dx, dy, dz, ct, sphi)
        dx = jnp.where(scattering, ndx, dx)
        dy = jnp.where(scattering, ndy, dy)
        dz = jnp.where(scattering, ndz, dz)
        scattered = scattered | scattering
        alive = alive & (~exiting)

        low = alive & (weights < _WEIGHT_ROULETTE)
        surv = jax.random.uniform(krou, (n_photons,)) < _ROULETTE_SURVIVE
        weights = jnp.where(low & surv, weights / _ROULETTE_SURVIVE, weights)
        alive = alive & ((~low) | surv)

        st = (px, py, pz, dx, dy, dz, weights, alive, scattered)
        return (i + 1, key, st, T, S)

    st0 = (px, py, pz, dx, dy, dz, weights, alive, scattered)
    _, _, st, T, S = jax.lax.while_loop(cond, body, (0, kloop, st0, T0, S0))

    leftover = jnp.sum(jnp.where(st[7], st[6], 0.0))
    s_main = S[:ndiff]
    s_sum = jnp.sum(s_main)
    s_main = jnp.where(s_sum > 0, s_main * (1.0 + leftover / jnp.maximum(s_sum, 1e-30)), s_main)

    norm = 1.0 / float(n_photons)
    return T[:ndir] * norm, s_main * norm
