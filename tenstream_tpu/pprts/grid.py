"""Regular-grid description (replaces the PETSc DMDA bookkeeping).

Parity: reference `t_coord` (`src/pprts_base.F90:92-109`) and
`setup_grid`/`setup_dmda` (`src/pprts.F90:830-935`).  There is no
process-local index bookkeeping here: arrays are global and sharding over
an (x, y) device mesh replaces the DMDA decomposition (reference §:
x/y periodic boundaries, z never decomposed).

Array layout convention for all solver fields:
  cell fields   : (Nz,   Nx, Ny)
  level fields  : (Nz+1, Nx, Ny)
  stream fields : (ndof, Nz+1, Nx, Ny)   [face-indexed, see below]
  coeff fields  : (nsrc, ndst, Nz, Nx, Ny)

Face indexing: a top-group stream dof at z-index k lives on the z-face
above cell layer k; a side dof at x-index i lives on the x-face between
cells i-1 and i (periodic), matching the reference DMDA dof layout
(`src/pprts_explicit.F90:330-459` index arithmetic).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals


@dataclass(frozen=True)
class Grid:
    nz: int
    nx: int
    ny: int
    dx: float
    dy: float
    dz: jnp.ndarray  # (Nz,) or (Nz, Nx, Ny)

    @staticmethod
    def create(nz: int, nx: int, ny: int, dx: float, dy: float, dz) -> "Grid":
        dz = jnp.asarray(dz, ireals)
        if dz.ndim == 0:
            dz = jnp.full((nz,), dz, ireals)
        assert dz.shape[0] == nz, f"dz first dim {dz.shape} != nz {nz}"
        return Grid(nz, nx, ny, float(dx), float(dy), dz)

    @property
    def dz3d(self) -> jnp.ndarray:
        """(Nz, Nx, Ny) layer thickness."""
        if self.dz.ndim == 1:
            return jnp.broadcast_to(self.dz[:, None, None], (self.nz, self.nx, self.ny))
        return self.dz

    @property
    def az(self) -> float:
        return self.dx * self.dy

    def volumes(self) -> jnp.ndarray:
        return self.dz3d * self.az
