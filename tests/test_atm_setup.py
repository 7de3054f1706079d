"""Host-model atmosphere input: afglus background, pressure-honoring
merge, per-column fields (reference `src/tenstr_atm.F90`:
`setup_tenstr_atm`:136, `merge_dyn_rad_grid`:403, `hydrostat_lev`:875).
"""

import numpy as np
import pytest

from tenstream_tpu.atm import (
    default_atm_filename,
    load_background,
    setup_tenstr_atm,
)


def _dyn_grid(nzp=10):
    plev = (1000 - np.arange(nzp + 1) * 500 / nzp)[::-1] * 100.0  # Pa TOA->sfc
    tlev = (288 - np.arange(nzp + 1) * 50 / nzp)[::-1]
    return plev, tlev


def test_afglus_background_vendored():
    import os

    assert os.path.exists(default_atm_filename())
    bg = load_background()
    assert bg["z"][0] == 120e3  # AFGL table top
    assert 1.0e5 < bg["p"][-1] < 1.02e5
    # TOA-first ordering, monotone
    assert np.all(np.diff(bg["z"]) < 0)
    assert np.all(np.diff(bg["p"]) > 0)
    # vmr sanity: o2 ~ 0.21, h2o decreasing with height
    assert abs(bg["o2"][-1] - 0.21) < 0.02
    assert bg["h2o"][-1] > bg["h2o"][len(bg["h2o"]) // 2]


def test_merge_reproduces_reference_grid():
    """The merged dynamics+afglus grid matches the reference regression
    scene's 67-layer column (`tests/test_pprts_specint`)."""
    import os

    plev, tlev = _dyn_grid()
    atm = setup_tenstr_atm(plev, tlev)
    assert atm.nlay == 67  # same as the reference's merged grid
    data = os.path.join(os.path.dirname(__file__), "data", "reference_specint.npz")
    z = np.load(data)
    np.testing.assert_allclose(atm.plev, z["scene.plev"], rtol=1e-5)
    # zlev: the archive stored the AFGL file's geometric heights (a
    # round-1 reconstruction), while the reference — and this module —
    # integrate hydrostatically from the merged pressures
    # (`src/tenstr_atm.F90:566-568`); agreement is ~5% in the
    # troposphere, so only coarse consistency is asserted here
    sel = atm.plev > 1e4
    np.testing.assert_allclose(atm.zlev[sel], z["scene.zlev"][sel], atol=400.0)
    np.testing.assert_allclose(
        atm.gases["h2o"], z["scene.g_h2o"], rtol=0.5, atol=1e-7
    )


def test_merge_honors_dynamics_pressure():
    plev, tlev = _dyn_grid()
    # perturb the dynamics pressures: the merged grid must follow them
    atm2 = setup_tenstr_atm(plev * 0.97, tlev)
    nbg = atm2.plev.shape[0] - plev.shape[0]
    np.testing.assert_allclose(atm2.plev[nbg:], plev * 0.97)
    # warmer dynamics air -> taller dynamics column (pressure-honoring
    # hydrostatics, not a fixed height grid)
    atm_warm = setup_tenstr_atm(plev, tlev + 10.0)
    atm_cold = setup_tenstr_atm(plev, tlev)
    nbg_w = atm_warm.plev.shape[0] - plev.shape[0]
    nbg_c = atm_cold.plev.shape[0] - plev.shape[0]
    assert atm_warm.zlev[nbg_w] > atm_cold.zlev[nbg_c] + 100.0


def test_per_column_fields():
    nzp, nx, ny = 10, 3, 2
    plev, tlev = _dyn_grid(nzp)
    plev3 = np.broadcast_to(plev[:, None, None], (nzp + 1, nx, ny)).copy()
    tlev3 = np.broadcast_to(tlev[:, None, None], (nzp + 1, nx, ny)).copy()
    tlev3[:, -1, :] += 5.0
    h2o = np.full((nzp, nx, ny), 4e-3)
    lwc = np.zeros((nzp, nx, ny))
    lwc[5, 0, 0] = 0.2
    atm = setup_tenstr_atm(plev3, tlev3, h2ovmr=h2o, lwc=lwc,
                           reliq=np.full((nzp, nx, ny), 10.0))
    assert atm.plev.shape[1:] == (nx, ny)
    assert atm.lwc.shape == (atm.nlay, nx, ny)
    nbg = atm.nlay - nzp
    # host-model h2o inside the dynamics grid; background above
    np.testing.assert_allclose(atm.gases["h2o"][nbg:], h2o)
    assert np.all(atm.gases["h2o"][: nbg - 1, 0, 0] < 4e-3)
    # warmer columns are taller (hydrostatic, pressure honored)
    assert np.all(atm.zlev[nbg, -1, :] > atm.zlev[nbg, 0, :])
    # cloud placed at the right merged layer
    assert atm.lwc[nbg + 5, 0, 0] == pytest.approx(0.2)


def test_surface_height():
    plev, tlev = _dyn_grid()
    atm = setup_tenstr_atm(plev, tlev, surface_height=np.asarray(500.0))
    assert atm.zlev[-1] == pytest.approx(500.0)
