"""LUT param-phi azimuth re-parameterization (`plexrt/param_phi.py`).

Anchors and spline semantics per reference `src/LUT_param_phi.F90`.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tenstream_tpu.plexrt.param_phi import (
    azimuth_from_param_phi,
    canonical_azimuth_map,
    param_phi_from_azimuth,
    triangle_angles,
)

SHAPES = [
    (0.5, np.sqrt(3) / 2),  # equilateral (reference canonical)
    (1.0, 1.0),             # right isoceles (our canonical)
    (0.3, 0.9),
    (0.8, 0.4),
]


@pytest.mark.parametrize("Cx,Cy", SHAPES)
def test_anchor_values(Cx, Cy):
    alpha, beta = map(float, triangle_angles(Cx, Cy))
    h = np.pi / 2
    for phi, want in [
        (h - alpha / 2, -2.0),
        (h - alpha, -1.0),
        (beta - h, 1.0),
        (beta / 2 - h, 2.0),
    ]:
        got = float(param_phi_from_azimuth(phi, Cx, Cy))
        assert abs(got - want) < 1e-5, (phi, got, want)


@pytest.mark.parametrize("Cx,Cy", SHAPES)
def test_roundtrip(Cx, Cy):
    p = np.linspace(-2, 2, 41)
    phi = np.asarray(azimuth_from_param_phi(p, Cx, Cy))
    back = np.asarray(param_phi_from_azimuth(phi, Cx, Cy))
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_canonical_map_identity():
    phi = np.linspace(-360, 360, 73)
    out = np.asarray(canonical_azimuth_map(phi, 1.0, 1.0, 1.0, 1.0))
    # identity modulo 360
    d = (out - phi + 180) % 360 - 180
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_canonical_map_hits_anchors():
    # sun parallel to side AC of the actual cell must map to sun
    # parallel to side AC of the canonical cell, etc.
    Cx, Cy, Cx0, Cy0 = 0.3, 0.9, 1.0, 1.0
    aa, ba = map(float, triangle_angles(Cx, Cy))
    ac, bc = map(float, triangle_angles(Cx0, Cy0))
    h = 90.0
    pairs = [
        (h - np.rad2deg(aa) / 2, h - np.rad2deg(ac) / 2),
        (h - np.rad2deg(aa), h - np.rad2deg(ac)),
        (np.rad2deg(ba) - h, np.rad2deg(bc) - h),
        (np.rad2deg(ba) / 2 - h, np.rad2deg(bc) / 2 - h),
    ]
    for src, want in pairs:
        got = float(canonical_azimuth_map(src, Cx, Cy, Cx0, Cy0))
        d = (got - want + 180) % 360 - 180
        assert abs(d) < 1e-4, (src, got, want)


def test_canonical_map_monotone_continuous():
    Cx, Cy = 0.3, 0.9
    phi = np.linspace(-180, 180, 2001)
    out = np.unwrap(np.deg2rad(np.asarray(canonical_azimuth_map(phi, Cx, Cy, 1.0, 1.0))))
    d = np.diff(out)
    assert (d > 0).all(), "circle map must be strictly increasing"
    assert d.max() < np.deg2rad(2.0), "no jumps"
    # full circle maps to full circle
    assert abs((out[-1] - out[0]) - 2 * np.pi) < 1e-3
