"""Wedge azimuth re-parameterization (LUT param-phi).

Parity: reference `src/LUT_param_phi.F90` (`param_phi_from_azimuth`:20,
`azimuth_from_param_phi`:57).  The reference tabulates wedge transfer
coefficients over a shape-independent azimuth coordinate param_phi in
[-2, 2] anchored at the side-face alignment angles of the triangle
(A=(0,0), B=(1,0), C above AB; inner angles alpha at A, beta at B):

    90 - alpha/2 -> -2      (sun parallel to the A-median direction)
    90 - alpha   -> -1      (sun parallel to side AC)
    beta - 90    -> +1      (sun parallel to side BC)
    beta/2 - 90  -> +2

so that LUT gridpoints land on the transport-regime boundaries (a side
face flipping between upwind and downwind) for EVERY triangle shape.

TPU-first redesign: our wedge tables keep a plain periodic azimuth axis
on ONE canonical triangle (`plexrt/optprop.py`), and arbitrary ICON
triangles evaluate it through a monotone circle map built from the same
four anchors: actual-shape anchor azimuths -> canonical-shape anchor
azimuths, piecewise-linear in between (the unique continuous extension
of the reference's local splines around the full circle; it reduces to
the identity for congruent cells).  This gives first-order shape
awareness without the reference's two extra LUT shape axes (wedge_C),
which remain a documented deviation (PARITY.md).

All functions are jnp-vectorized over cells; angles in degrees unless
noted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals


def triangle_angles(Cx, Cy):
    """Inner angles (alpha at A, beta at B) in radians for the triangle
    A=(0,0), B=(1,0), C=(Cx, Cy > 0) — reference `angle_between_two_vec`
    calls in `src/LUT_param_phi.F90:29-31`."""
    Cx = jnp.asarray(Cx, ireals)
    Cy = jnp.asarray(Cy, ireals)
    alpha = jnp.arctan2(Cy, Cx)
    beta = jnp.arctan2(Cy, 1.0 - Cx)
    return alpha, beta


def _anchors_rad(Cx, Cy):
    """The four param_phi anchor azimuths (radians), ascending in
    param_phi: [-2, -1, +1, +2] -> [90-alpha/2, 90-alpha, beta-90,
    beta/2-90] ... note these DESCEND in phi."""
    alpha, beta = triangle_angles(Cx, Cy)
    h = jnp.pi / 2
    return jnp.stack(
        [h - alpha / 2, h - alpha, beta - h, beta / 2 - h], axis=-1
    )


def param_phi_from_azimuth(phi_rad, Cx, Cy):
    """Azimuth (radians) -> param_phi in [-2, 2].

    Exact re-implementation of the reference's three local splines
    (`src/LUT_param_phi.F90:20-47`); broadcasting over inputs.
    """
    a = _anchors_rad(Cx, Cy)
    m2, m1, p1, p2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    phi = jnp.asarray(phi_rad, ireals)
    # ranges (phi descending): [.,-1] for phi > m1; [1,.] for phi < p1
    seg_lo = phi > m1
    seg_hi = phi < p1
    x_lo = -2.0 + (-1.0 - -2.0) / (m1 - m2) * (phi - m2)
    x_mid = -1.0 + (1.0 - -1.0) / (p1 - m1) * (phi - m1)
    x_hi = 1.0 + (2.0 - 1.0) / (p2 - p1) * (phi - p1)
    return jnp.where(seg_lo, x_lo, jnp.where(seg_hi, x_hi, x_mid))


def azimuth_from_param_phi(param_phi, Cx, Cy):
    """param_phi in [-2, 2] -> azimuth (radians); inverse of the above
    (`src/LUT_param_phi.F90:57-84`)."""
    a = _anchors_rad(Cx, Cy)
    m2, m1, p1, p2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x = jnp.asarray(param_phi, ireals)
    seg_lo = x < -1.0
    seg_hi = x > 1.0
    phi_lo = m2 + (m1 - m2) * (x - -2.0)
    phi_mid = m1 + (p1 - m1) * (x - -1.0) / 2.0
    phi_hi = p1 + (p2 - p1) * (x - 1.0)
    return jnp.where(seg_lo, phi_lo, jnp.where(seg_hi, phi_hi, phi_mid))


def canonical_azimuth_map(phi_deg, Cx, Cy, Cx0, Cy0):
    """Map a cell-local sun azimuth (degrees, any value) on a triangle
    with apex (Cx, Cy) to the azimuth on the CANONICAL triangle
    (Cx0, Cy0) that has the same param_phi coordinate.

    The four anchors define a monotone piecewise-linear circle map
    (including the wrap segment between the -2 and +2 anchors going the
    long way round), so every azimuth maps continuously and congruent
    cells map identically.
    """
    two_pi = 2.0 * jnp.pi
    src = _anchors_rad(Cx, Cy)          # (..., 4) descending in phi
    dst = _anchors_rad(Cx0, Cy0)
    phi = jnp.deg2rad(jnp.asarray(phi_deg, ireals))

    # work in "descending" order: segment k spans [src_k+1, src_k]
    # anchors ordered descending: a0 = 90-alpha/2 > a1 > a2 > a3
    # wrap segment: from a3 (+2 anchor) down/around to a0 - 2pi
    def seg_map(phi, lo_s, hi_s, lo_d, hi_d):
        t = (phi - lo_s) / jnp.maximum(hi_s - lo_s, 1e-12)
        return lo_d + t * (hi_d - lo_d)

    a0, a1, a2, a3 = src[..., 0], src[..., 1], src[..., 2], src[..., 3]
    b0, b1, b2, b3 = dst[..., 0], dst[..., 1], dst[..., 2], dst[..., 3]
    # normalize phi into (a0 - 2pi, a0]
    phi_n = phi - two_pi * jnp.ceil((phi - a0) / two_pi)

    out = seg_map(phi_n, a1, a0, b1, b0)
    out = jnp.where(phi_n < a1, seg_map(phi_n, a2, a1, b2, b1), out)
    out = jnp.where(phi_n < a2, seg_map(phi_n, a3, a2, b3, b2), out)
    out = jnp.where(
        phi_n < a3, seg_map(phi_n, a0 - two_pi, a3, b0 - two_pi, b3), out
    )
    return jnp.rad2deg(out)
