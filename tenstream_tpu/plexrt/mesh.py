"""Structured extruded-triangle grid for plexrt.

Parity: reference `plexrt/plex_grid.F90` (`setup_plexgrid:251`, face
geometry `compute_face_geometry:588`) builds an unstructured DMPlex of
wedge prisms.  Here the horizontal mesh is the regular triangulation of
an Nx x Ny rectangle grid: every rectangle splits along its ll->ur
diagonal into

  T0 (orientation 0): A=(0,0), B=(dx,0), C=(dx,dy)   (lower-right)
  T1 (orientation 1): the same triangle rotated 180 degrees
                      (upper-left half)

All triangles are congruent; T1 is T0 rotated by pi, so T1 transfer
coefficients come from the canonical wedge tables evaluated at
phi + 180 degrees.

Local side order (chosen so the 180-rotation maps T1's sides onto the
canonical order): side 0 = AB (T0: bottom edge y=j*dy; T1: top edge),
side 1 = BC (T0: right edge; T1: left edge), side 2 = CA (diagonal).
Side s of T0(i,j) coincides with side s of T1 at offset
OFF[s] = [(0,-1), (+1,0), (0,0)] (periodic).  Side-face fields are
stored on the T0 owner with shape (..., 3, nx, ny); exchanges are
`jnp.roll`s (GSPMD collective permutes on a sharded mesh).

Cell fields: (nz, 2, nx, ny); z-face fields: (nz+1, 2, nx, ny).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

# roll offsets (di, dj) from a T0 cell to the T1 cell sharing side s
SIDE_OFFSETS: Tuple[Tuple[int, int], ...] = ((0, -1), (1, 0), (0, 0))


@dataclass(frozen=True)
class PlexGrid:
    nx: int
    ny: int
    nz: int
    dx: float
    dy: float
    dz: np.ndarray  # (nz,) layer thickness, TOA -> surface

    @classmethod
    def create(cls, nz, nx, ny, dx, dy, dz) -> "PlexGrid":
        dzv = np.broadcast_to(np.asarray(dz, np.float32), (nz,)).copy()
        return cls(nx=nx, ny=ny, nz=nz, dx=float(dx), dy=float(dy), dz=dzv)

    # ---- geometry ------------------------------------------------------
    @property
    def area_tri(self) -> float:
        """Horizontal triangle area."""
        return 0.5 * self.dx * self.dy

    @property
    def side_lengths(self) -> Tuple[float, float, float]:
        return (self.dx, self.dy, float(np.hypot(self.dx, self.dy)))

    @property
    def ncell_horiz(self) -> int:
        return 2 * self.nx * self.ny

    def volumes(self) -> np.ndarray:
        """(nz, 1, 1, 1)-broadcastable cell volumes."""
        return (self.area_tri * self.dz)[:, None, None, None]

    def dz3d(self) -> np.ndarray:
        return np.broadcast_to(
            self.dz[:, None, None, None], (self.nz, 2, self.nx, self.ny)
        ).copy()


def fish_mesh(nz, nx, ny, dx, dy, dz) -> PlexGrid:
    """Convenience constructor mirroring the reference's regular test
    meshes (`plexrt/gen_fish_plex.F90` / `gen_regular_plex.F90`)."""
    return PlexGrid.create(nz, nx, ny, dx, dy, dz)


def side_to_t1(arr, s: int, axes=(-2, -1)):
    """Value stored on T0(i,j) side s, seen from its T1 partner:
    T1(i+di, j+dj) reads the face at its own index -> roll by -OFF."""
    import jax.numpy as jnp

    di, dj = SIDE_OFFSETS[s]
    return jnp.roll(jnp.roll(arr, -di, axis=axes[0]), -dj, axis=axes[1])


def side_from_t1(arr, s: int, axes=(-2, -1)):
    """Inverse of `side_to_t1`: bring a T1-indexed field onto the T0
    owner of side s."""
    import jax.numpy as jnp

    di, dj = SIDE_OFFSETS[s]
    return jnp.roll(jnp.roll(arr, di, axis=axes[0]), dj, axis=axes[1])
