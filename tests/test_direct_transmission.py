"""Closed-form dir2dir (direct transmission) vs f64 quadrature.

The closed form (`boxmc/direct_transmission.py`) replaces the reference's
MC-sampled dir2dir tables (`src/boxmc.F90:559` tallies, tabulated in
`src/optprop_LUT.F90`).  Because it is used BOTH at solver runtime
(facade `analytic_dir2dir`) and as the energy budget for the production
LUT's dir2diff conservation clamp, its RELATIVE accuracy on the
interaction budget 1 - sum(T) matters down to very small optical depths
— a previous f32 cancellation in `_i1` (exact branch used for
sigma*M > 1e-3) produced negative class transmissions and ~5x-wrong
budgets for thin oblique cells, which silently mis-clamped the
production table (regression test below pins the fix).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tenstream_tpu.boxmc.direct_transmission import dir2dir_analytic


def _quad_budget(tau, asp, phi, theta, src, n=400_000, seed=0):
    """f64 Monte-Carlo quadrature of 1 - sum_dst T[src, dst]."""
    rng = np.random.default_rng(seed)
    ph, th = np.deg2rad(phi), np.deg2rad(theta)
    sx, sy, sz = np.sin(ph) * np.sin(th), np.cos(ph) * np.sin(th), np.cos(th)
    bz = asp
    u, v = rng.random(n), rng.random(n)
    inf = np.full(n, np.inf)
    if src == 0:  # TOP face entry, (x, y) uniform
        tz = np.full(n, bz / max(sz, 1e-12))
        tx = (1.0 - u) / sx if sx > 1e-9 else inf
        ty = (1.0 - v) / sy if sy > 1e-9 else inf
    elif src == 1:  # XMIN face entry, (y, z) uniform
        tx = np.full(n, 1.0 / max(sx, 1e-12))
        tz = (v * bz) / max(sz, 1e-12)
        ty = (1.0 - u) / sy if sy > 1e-9 else inf
    else:  # YMIN face entry, (x, z) uniform
        ty = np.full(n, 1.0 / max(sy, 1e-12))
        tz = (v * bz) / max(sz, 1e-12)
        tx = (1.0 - u) / sx if sx > 1e-9 else inf
    L = np.minimum(tz, np.minimum(tx, ty))
    return 1.0 - np.exp(-(tau / bz) * L).mean()


CASES = [
    # (tau, aspect, phi, theta) — includes the pancake/oblique cell that
    # exposed the f32 _i1 cancellation (budget was 5.8e-3 vs true 1.0e-3)
    (1e-3, 0.237, 15.0, 20.0),
    (1e-3, 1.0, 0.0, 60.0),
    (1e-2, 0.075, 30.0, 80.0),
    (1e-2, 1.0, 45.0, 40.0),
    (1e-1, 2.0, 60.0, 70.0),
    (1.5, 1.0, 0.0, 60.0),
    (20.0, 0.5, 20.0, 30.0),
]


@pytest.mark.parametrize("src", [0, 1, 2])
def test_budget_vs_quadrature(src):
    for tau, asp, phi, theta in CASES:
        bq = _quad_budget(tau, asp, phi, theta, src)
        T = np.asarray(
            dir2dir_analytic(
                "3_10", jnp.float32(tau), jnp.float32(asp), jnp.float32(phi), jnp.float32(theta)
            )
        ).reshape(3, 3)
        bc = 1.0 - T[src].sum()
        # 2% relative (quadrature noise + f32) with an absolute floor
        assert abs(bc - bq) < max(0.02 * bq, 2e-6), (tau, asp, phi, theta, src, bc, bq)


def test_no_negative_classes():
    rng = np.random.default_rng(7)
    tau = 10 ** rng.uniform(-5, 2, 512).astype(np.float32)
    asp = 10 ** rng.uniform(np.log10(0.02), np.log10(7.45), 512).astype(np.float32)
    phi = rng.uniform(0, 90, 512).astype(np.float32)
    theta = rng.uniform(0, 90, 512).astype(np.float32)
    T = np.asarray(dir2dir_analytic("3_10", tau, asp, phi, theta))
    assert T.min() >= 0.0
    assert T.reshape(-1, 3, 3).sum(-1).max() <= 1.0 + 1e-5
