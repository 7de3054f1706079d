"""Device-mesh helpers: the TPU-native replacement for the reference's
MPI domain decomposition.

Parity: the reference decomposes the horizontal (x, y) plane over MPI
ranks via PETSc DMDA with periodic boundaries and hand-rolled halo
exchanges (`src/pprts.F90:838-931`, `src/pprts_explicit.F90:232-328`;
SURVEY §2.5).  Here the same decomposition is an (x, y) `jax.sharding.Mesh`;
fields are placed with `NamedSharding` and GSPMD inserts the halo
collective-permutes for the `jnp.roll`-based stencils automatically.
The z axis is never sharded (as in the reference, z stays on-chip).

Host-model-prescribed layouts (`nxproc/nyproc` in `init_pprts`) map to
the mesh shape argument.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    nxproc: Optional[int] = None,
    nyproc: Optional[int] = None,
) -> Mesh:
    """Build an ('x', 'y') mesh over the given (default: all) devices.

    Without nxproc/nyproc the device count is factored as square-ish as
    possible (parity: `domain_decompose_2d_petsc`,
    `src/helper_functions.fypp`).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if nxproc is None or nyproc is None:
        nxproc = int(np.floor(np.sqrt(n)))
        while n % nxproc != 0:
            nxproc -= 1
        nyproc = n // nxproc
    assert nxproc * nyproc == n, (nxproc, nyproc, n)
    dev_arr = np.asarray(devices).reshape(nxproc, nyproc)
    return Mesh(dev_arr, axis_names=("x", "y"))


def field_spec(ndim_leading: int = 1) -> P:
    """PartitionSpec for solver fields with trailing (..., Nx, Ny) dims."""
    return P(*([None] * ndim_leading), "x", "y")


def shard_fields(mesh: Mesh, *arrays, ndim_leading=None):
    """Place arrays whose last two dims are (Nx, Ny) onto the mesh."""
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        lead = a.ndim - 2 if ndim_leading is None else ndim_leading
        sh = NamedSharding(mesh, field_spec(lead))
        out.append(jax.device_put(a, sh))
    return tuple(out)
