"""Closed-form direct->direct transfer coefficients for cube schemes.

Parity: these are the dir2dir (T) coefficients the reference samples by
Monte Carlo in `src/boxmc.F90` (`run_photons`:559 tallies unscattered
exits per stream) and tabulates in the LUT (`src/optprop_LUT.F90`).

TPU-first redesign: for face-classified cube schemes the MC expectation
has a CLOSED FORM, so the direct table needs no photons at all.  A direct
photon is removed from the beam by any interaction (extinction
sigma = tau/dz); it travels a straight line from a uniformly-sampled
entry point to the box boundary.  For entry on any cube face with the sun
in the canonical octant (+x, +y, -z), the per-axis crossing distances are

    L = min(C, A, B)

where C is constant over the face and A, B are linear in one entry
coordinate each, i.e. A ~ U[0, amax], B ~ U[0, bmax] independently.
The expectation of exp(-sigma * L) restricted to each argmin class
(which determines the exit face and hence the destination stream) then
reduces to elementary integrals of (alpha + beta t) exp(-sigma t):

    T_C = exp(-sigma C) P(A > C) P(B > C)
    T_A = (1/amax) int_0^M exp(-sigma t) (1 - t/bmax) dt,
          M = min(amax, bmax, C)        (T_B symmetric)

This removes ALL Monte-Carlo noise from the direct-transport backbone of
the lookup tables (the reference needs ~1e6 photons per entry to reach
stddev 5e-4 on these; here they are exact to f32 roundoff), and makes
dir2dir manifestly independent of (w0, g) — scattered photons leave the
direct beam regardless of where they would go.

Limitations: schemes with positional direct classification
(`dir_classify == "quad8"`, the 8_* family) and wedge geometries keep
the MC path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.boxmc.schemes import get_box_scheme

_BIG = 1e30


def _i0(sigma, M):
    """int_0^M exp(-sigma t) dt, stable for sigma*M -> 0."""
    x = sigma * M
    small = x < 1e-4
    # -expm1(-x)/sigma is stable except when sigma underflows entirely
    safe = jnp.where(small, M * (1.0 - 0.5 * x), -jnp.expm1(-x) / jnp.maximum(sigma, 1e-30))
    return safe


def _i1(sigma, M):
    """int_0^M t exp(-sigma t) dt, stable for sigma*M -> 0.

    The exact form 1-(1+x)e^{-x} cancels to x^2/2 - x^3/3 + ...; in f32
    the subtraction leaves absolute noise ~2e-7, i.e. O(1) RELATIVE error
    for x below ~1e-3 and tens of percent up to x ~ 1e-2 (measured: it
    produced NEGATIVE per-class transmissions and 5x-wrong direct-beam
    interaction budgets for thin oblique cells).  The series truncation
    error is ~x^4/80 relative, so switching at x < 0.05 keeps both
    branches below ~1e-5 relative.
    """
    x = sigma * M
    small = x < 0.05
    series = 0.5 * M * M * (1.0 - 2.0 * x / 3.0 + 0.25 * x * x - x * x * x / 15.0)
    s = jnp.maximum(sigma, 1e-30)
    exact = (1.0 - (1.0 + x) * jnp.exp(-x)) / (s * s)
    return jnp.where(small, series, exact)


def _class_probs(sigma, C, amax, bmax):
    """(T_C, T_A, T_B): expectation of exp(-sigma L) per argmin class
    with L = min(C, A, B), A ~ U[0, amax], B ~ U[0, bmax]."""
    # P(A > C): A infinite (amax = _BIG) -> 1
    pAgtC = jnp.clip(1.0 - C / amax, 0.0, 1.0)
    pBgtC = jnp.clip(1.0 - C / bmax, 0.0, 1.0)
    tC = jnp.where(C >= _BIG, 0.0, jnp.exp(-sigma * jnp.minimum(C, _BIG)) * pAgtC * pBgtC)

    Ma = jnp.minimum(jnp.minimum(amax, bmax), C)
    tA = jnp.where(
        amax >= _BIG,
        0.0,
        jnp.maximum((_i0(sigma, Ma) - _i1(sigma, Ma) / bmax) / amax, 0.0),
    )
    Mb = jnp.minimum(jnp.minimum(amax, bmax), C)
    tB = jnp.where(
        bmax >= _BIG,
        0.0,
        jnp.maximum((_i0(sigma, Mb) - _i1(sigma, Mb) / amax) / bmax, 0.0),
    )
    return tC, tA, tB


def _inv(x, lo=1e-7):
    """1/x with x -> 0 mapped to _BIG (axis never crossed)."""
    return jnp.where(x > lo, 1.0 / jnp.maximum(x, lo), _BIG)


@jax.jit
def _dir2dir_3src(tau, aspect, phi_deg, theta_deg):
    """Per-source (C, A, B) class transmissions for the canonical
    3-direct-source layout (TOP, XMIN, YMIN).  Returns an array
    (..., 3, 3) of [src, class] with class order (C, A, B)."""
    tau = jnp.asarray(tau, jnp.float32)
    aspect = jnp.asarray(aspect, jnp.float32)
    phi = jnp.deg2rad(jnp.asarray(phi_deg, jnp.float32))
    theta = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
    bz = jnp.maximum(aspect, 1e-6)
    sigma = tau / bz

    sx = jnp.sin(phi) * jnp.sin(theta)
    sy = jnp.cos(phi) * jnp.sin(theta)
    sz = jnp.cos(theta)  # magnitude of the downward component

    inv_sx = _inv(sx)
    inv_sy = _inv(sy)
    inv_sz = _inv(sz)

    # TOP source: C = bz/|sz| (exit bottom), A = (1-u)/sx ~ U[0, 1/sx]
    # (exit x-max), B ~ U[0, 1/sy] (exit y-max)
    top = _class_probs(sigma, jnp.minimum(bz * inv_sz, _BIG), inv_sx, inv_sy)
    # XMIN source: C = 1/sx (exit x-max), A = w/|sz| ~ U[0, bz/|sz|]
    # (exit bottom), B ~ U[0, 1/sy] (exit y-max)
    xm = _class_probs(sigma, inv_sx, jnp.minimum(bz * inv_sz, _BIG), inv_sy)
    # YMIN source: C = 1/sy (exit y-max), A = w/|sz| (exit bottom),
    # B ~ U[0, 1/sx] (exit x-max)
    ym = _class_probs(sigma, inv_sy, jnp.minimum(bz * inv_sz, _BIG), inv_sx)

    return jnp.stack([jnp.stack(top, -1), jnp.stack(xm, -1), jnp.stack(ym, -1)], axis=-2)


# per source, map the (C, A, B) argmin classes to the EXIT FACE id used
# by BoxScheme.dir_dst_by_face (face 1 = bottom, 3 = x-max, 5 = y-max)
_CLASS_FACE = {
    0: (1, 3, 5),  # TOP src:  C->bottom, A->xmax, B->ymax
    1: (3, 1, 5),  # XMIN src: C->xmax, A->bottom, B->ymax
    2: (5, 1, 3),  # YMIN src: C->ymax, A->bottom, B->xmax
}


def supports_scheme(scheme_name: str) -> bool:
    """True when the closed form covers the scheme's direct layout
    (3 full-face sources TOP/XMIN/YMIN, face-based classification)."""
    try:
        box = get_box_scheme(scheme_name)
    except (KeyError, ValueError):
        return False
    from tenstream_tpu.boxmc.schemes import TOP, XMIN, YMIN

    return (
        box.dir_classify is None
        and box.dir_src_rects is None
        and tuple(box.dir_src_faces) == (TOP, XMIN, YMIN)
    )


def dir2dir_analytic(scheme_name: str, tau, aspect, phi_deg, theta_deg) -> jnp.ndarray:
    """Exact dir2dir transfer block for a face-classified cube scheme.

    Inputs broadcast; returns (..., ndir, ndir) [src, dst] matching the
    MC tracer's tally layout (`run_boxmc`).
    """
    box = get_box_scheme(scheme_name)
    if not supports_scheme(scheme_name):
        raise ValueError(f"no closed form for scheme {scheme_name}")

    probs = _dir2dir_3src(tau, aspect, phi_deg, theta_deg)  # (..., 3src, 3class)
    out = jnp.zeros(probs.shape[:-2] + (box.ndir, box.ndir), probs.dtype)
    for src in range(3):
        for cls, face in enumerate(_CLASS_FACE[src]):
            dst = box.dir_dst_by_face[face]
            if dst >= 0:
                out = out.at[..., src, dst].add(probs[..., src, cls])
    return out


def dir2dir_table(scheme_name: str, tau_grid, aspect_grid, phi_grid, theta_grid) -> np.ndarray:
    """Exact dir2dir LUT block on an axis grid.

    Returns (ntau, naspect, nphi, ntheta, ndir, ndir) float32 — the
    caller broadcasts over the (w0, g) axes, on which dir2dir provably
    does not depend.
    """
    t, a, p, th = np.meshgrid(
        np.asarray(tau_grid, np.float32),
        np.asarray(aspect_grid, np.float32),
        np.asarray(phi_grid, np.float32),
        np.asarray(theta_grid, np.float32),
        indexing="ij",
    )
    out = dir2dir_analytic(scheme_name, t, a, p, th)
    return np.asarray(out, np.float32)
