"""plexrt: TenStream radiative transfer on extruded triangle meshes.

Parity: the reference's unstructured wedge-grid subsystem
(`plexrt/plex_grid.F90`, `plexrt/plex_rt.F90` — DMPlex prisms, KSP
solves).  TPU-first redesign: a STRUCTURED triangulation (each
rectangle split along its diagonal into two congruent triangles, the
second a 180-degree rotation of the first) extruded over Nz layers.
Topology is then pure index arithmetic — neighbor exchange is
`jnp.roll` over the (orientation, ix, iy) axes, one canonical wedge
LUT serves both orientations (the rotated triangle evaluates at
phi+180), and the solvers keep the matrix-free gather->einsum->scatter
architecture of the cube solver.
"""

__all__ = ["mesh", "wedge_boxmc", "optprop", "solver"]
