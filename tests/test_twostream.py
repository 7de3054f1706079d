"""Two-stream column solver tests.

Parity: reference `tests/test_twostr/` checks flux consistency of
`delta_eddington_twostream`.
"""

import numpy as np

from tenstream_tpu.core.types import PI
from tenstream_tpu.ops.schwarzschild import schwarzschild
from tenstream_tpu.ops.twostream import delta_eddington_twostream


def test_direct_beam_decay():
    nz = 20
    dtau = np.full(nz, 0.1)
    S, Edn, Eup = delta_eddington_twostream(dtau, np.zeros(nz), np.zeros(nz), 0.5, 1000.0, 0.0)
    S = np.asarray(S)
    expect = 1000.0 * np.exp(-np.cumsum(np.r_[0.0, dtau]) / 0.5)
    np.testing.assert_allclose(S, expect, rtol=2e-4)
    # no scattering, black surface -> no diffuse downward
    np.testing.assert_allclose(np.asarray(Edn), 0.0, atol=1e-4)


def test_energy_conservation_conservative():
    # conservative scattering, reflective surface: all input returns at TOA
    nz = 16
    dtau = np.full(nz, 0.5)
    w0 = np.full(nz, 1.0 - 1e-7)
    g = np.full(nz, 0.5)
    S0 = 500.0
    S, Edn, Eup = delta_eddington_twostream(dtau, w0, g, 0.8, S0, 1.0)
    S, Edn, Eup = map(np.asarray, (S, Edn, Eup))
    assert abs(Eup[0] - S0) / S0 < 2e-3
    # level-by-level net flux is constant (no absorption); tolerance is
    # relative to the flux magnitude, not the (tiny) net itself
    net = S + Edn - Eup
    np.testing.assert_allclose(net, net[0], atol=3e-3 * S0)


def test_flux_continuity_absorbing():
    # absorption only: net flux must decrease monotonically downward of TOA
    nz = 10
    dtau = np.full(nz, 0.3)
    S, Edn, Eup = delta_eddington_twostream(dtau, np.full(nz, 0.3), np.full(nz, 0.2), 0.7, 800.0, 0.2)
    S, Edn, Eup = map(np.asarray, (S, Edn, Eup))
    net = S + Edn - Eup
    assert np.all(np.diff(net) <= 1e-3)
    # surface reflection balance: Eup_sfc = albedo * (S_sfc + Edn_sfc)
    np.testing.assert_allclose(Eup[-1], 0.2 * (S[-1] + Edn[-1]), rtol=1e-4)


def test_thermal_isothermal_opaque():
    # optically thick isothermal atmosphere: fluxes -> pi * B
    nz = 30
    B = 3.0
    dtau = np.full(nz, 2.0)
    planck = np.full(nz + 1, B)
    S, Edn, Eup = delta_eddington_twostream(
        dtau, np.zeros(nz), np.zeros(nz), -1.0, 0.0, 0.0, planck=planck
    )
    Edn, Eup = np.asarray(Edn), np.asarray(Eup)
    np.testing.assert_allclose(Edn[-1], PI * B, rtol=1e-3)
    np.testing.assert_allclose(Eup[0], PI * B, rtol=1e-3)


def test_thermal_transparent():
    nz = 10
    B = 5.0
    dtau = np.full(nz, 1e-8)
    planck = np.full(nz + 1, B)
    S, Edn, Eup = delta_eddington_twostream(
        dtau, np.zeros(nz), np.zeros(nz), -1.0, 0.0, 0.0, planck=planck
    )
    np.testing.assert_allclose(np.asarray(Edn), 0.0, atol=1e-3)
    # black surface emits pi*B through the transparent atmosphere
    np.testing.assert_allclose(np.asarray(Eup), PI * B, rtol=1e-4)


def test_batched_columns():
    nz, nx, ny = 8, 3, 4
    dtau = np.random.default_rng(0).uniform(0.01, 1.0, (nz, nx, ny))
    S, Edn, Eup = delta_eddington_twostream(
        dtau, np.full_like(dtau, 0.5), np.full_like(dtau, 0.3), 0.6, 100.0, 0.1
    )
    assert S.shape == (nz + 1, nx, ny)
    # batched result matches single-column solves
    S0, Edn0, Eup0 = delta_eddington_twostream(
        dtau[:, 1, 2], np.full(nz, 0.5), np.full(nz, 0.3), 0.6, 100.0, 0.1
    )
    np.testing.assert_allclose(np.asarray(S)[:, 1, 2], np.asarray(S0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Eup)[:, 1, 2], np.asarray(Eup0), rtol=1e-5, atol=1e-5)


def test_schwarzschild_isothermal():
    nz = 20
    B = 2.5
    dtau = np.full(nz, 3.0)
    planck = np.full(nz + 1, B)
    Edn, Eup = schwarzschild(dtau, 0.0, planck, nmu=4)
    Edn, Eup = np.asarray(Edn), np.asarray(Eup)
    np.testing.assert_allclose(Edn[-1], PI * B, rtol=1e-3)
    np.testing.assert_allclose(Eup[0], PI * B, rtol=1e-3)
    # TOA has no downwelling
    assert abs(Edn[0]) < 1e-6


def test_schwarzschild_vs_twostream_thermal():
    # without scattering both solvers integrate the same physics
    nz = 24
    rng = np.random.default_rng(3)
    dtau = rng.uniform(0.05, 0.8, nz)
    planck = np.linspace(1.0, 4.0, nz + 1)
    Edn_s, Eup_s = schwarzschild(dtau, 0.1, planck, nmu=8)
    _, Edn_t, Eup_t = delta_eddington_twostream(
        dtau, np.zeros(nz), np.zeros(nz), -1.0, 0.0, 0.1, planck=planck
    )
    np.testing.assert_allclose(np.asarray(Edn_s), np.asarray(Edn_t), rtol=0.12, atol=0.25)
    np.testing.assert_allclose(np.asarray(Eup_s), np.asarray(Eup_t), rtol=0.12, atol=0.25)
