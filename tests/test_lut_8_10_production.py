"""End-to-end solve on the production-density 8_10 table.

VERDICT round-4 item 6: production tables beyond 3_10/wedge_5_8 — the
8-direct-stream cube scheme at reference diffuse axis density
(tau31 x w020 x aspect23 x g6, `src/optprop_base.F90:238-243`; the
reference downloads the full table via `misc/download_LUT.sh:24`).
Skips until `data/luts/LUT_8_10_production.npz` is committed (generated
on chip by `tools/chip_session4_lut.sh`).
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
PROD = os.path.join(REPO, "data", "luts", "LUT_8_10_production.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROD), reason="8_10 production LUT not committed"
)


def test_8_10_production_metadata_and_rows():
    """Axis density, generation metadata, and row conservation."""
    z = np.load(PROD)
    assert z["diff2diff"].shape[:4] == (31, 20, 23, 6), "not production density"
    meta = json.loads(str(z["meta_json"])) if "meta_json" in z.files else {}
    assert meta, "production table must carry generation metadata"
    assert z["diff2diff"].sum(-1).max() <= 1.0 + 1e-3
    assert z["dir2diff"].sum(-1).max() <= 1.0 + 1e-3


def test_8_10_production_solver_end_to_end():
    """Box-cloud solar solve on the production table: finite fluxes and
    a closed energy budget (the same gate as the 3_10 e2e tests)."""
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import LUT
    from tenstream_tpu.pprts.grid import Grid
    from tenstream_tpu.pprts.solver import PprtsSolver
    from tenstream_tpu.pprts.sun import sundir_from_angles

    solver = PprtsSolver(
        Grid.create(8, 12, 12, 100.0, 100.0, 100.0), OptProp(LUT.load(PROD))
    )
    ka = np.full((8, 12, 12), 1e-5, np.float32)
    ks = np.full((8, 12, 12), 1e-5, np.float32)
    g = np.zeros((8, 12, 12), np.float32)
    ka[3:5, 4:8, 4:8] = 5e-3
    ks[3:5, 4:8, 4:8] = 2e-2
    g[3:5, 4:8, 4:8] = 0.85
    solver.set_optical_properties(0.15, ka, ks, g)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)
    edir, edn, eup, abso = map(np.asarray, solver.get_result())
    assert all(np.isfinite(a).all() for a in (edir, edn, eup, abso))

    mu = np.cos(np.deg2rad(40.0))
    incoming = 1000.0 * mu
    balance = (
        eup[0].mean() + (abso * 100.0).sum(0).mean()
        + (edir[-1] + edn[-1] - eup[-1]).mean()
    )
    assert abs(balance - incoming) / incoming < 0.05, (balance, incoming)
    # a tau=5 cloud must cast a deep shadow SOMEWHERE at the surface
    # (displaced ~tan(40 deg)*350 m ~ 3 cells downwind of the cloud, so
    # locate it instead of assuming its position), while clear columns
    # stay near the unattenuated beam
    sfc = edir[-1]
    assert sfc.min() < 0.45 * sfc.max(), (sfc.min(), sfc.max())
    assert sfc.max() > 0.8 * incoming, (sfc.max(), incoming)
