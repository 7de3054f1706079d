"""Column-wise 1-D solver drivers filling the 3-D solution container.

Parity: reference `src/pprts_1D_solvers.F90` (`twostream`:55,
`schwarz`:418) — the `t_solver_2str` / schwarzschild dispatch of
`solve_pprts` (`src/pprts.F90:2606-2652`).  The reference loops columns;
here the batched column solvers run the whole grid at once.

Results are produced directly in [W/m2] on the difftop stream layout so
`get_result` semantics match the 3-D path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from tenstream_tpu.core.types import ireals
from tenstream_tpu.ops.schwarzschild import schwarzschild
from tenstream_tpu.ops.twostream import delta_eddington_twostream


def solve_twostream_columns(
    kabs, ksca, g, dz3d, mu0, incSolar_tilted, albedo2d,
    planck=None, planck_srfc=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(S, Edn, Eup, abso[W/m3]) for every column.

    incSolar_tilted follows the reference convention (irradiance on the
    tilted plane); the caller applies the mu factor on output.
    """
    dtau = (kabs + ksca) * dz3d
    w0 = ksca / jnp.maximum(kabs + ksca, jnp.finfo(ireals).tiny)
    S, Edn, Eup = delta_eddington_twostream(
        dtau, w0, g, mu0, incSolar_tilted, albedo2d,
        planck=planck, planck_srfc=planck_srfc,
    )
    net = (S[:-1] - S[1:]) + (Edn[:-1] - Edn[1:]) + (Eup[1:] - Eup[:-1])
    abso = net / dz3d
    return S, Edn, Eup, abso


def solve_schwarzschild_columns(
    kabs, dz3d, albedo2d, planck, planck_srfc=None, nmu: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(Edn, Eup, abso[W/m3]) thermal-only, no scattering."""
    dtau = kabs * dz3d
    Edn, Eup = schwarzschild(dtau, albedo2d, planck, nmu=nmu, srfc_emission=planck_srfc)
    net = (Edn[:-1] - Edn[1:]) + (Eup[1:] - Eup[:-1])
    abso = net / dz3d
    return Edn, Eup, abso
