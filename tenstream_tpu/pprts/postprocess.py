"""Post-processing: surface-flux smoothing and terrain slope correction.

Parity: reference `src/pprts_postprocess.F90` (`smooth_surface_fluxes`:44
— iterated 5-point convolution of the surface diffuse fluxes via
`dmda_convolve_ediff_srfc`; `slope_correction_fluxes`:131 — cosine
correction of surface direct flux over tilted terrain).

(The cube NCA thermal correction is deliberately stubbed in the
reference — `src/pprts_postprocess.F90:251-260` stops with "NCA not
freely available"; only the plexrt triangle variant exists.  Parity
therefore does not require it.)
"""

from __future__ import annotations

import jax.numpy as jnp

from tenstream_tpu.core.types import ireals


def convolve_srfc_5pt(field: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Iterated 5-point (von Neumann) smoothing with periodic wrap.

    field: (..., Nx, Ny); parity: `dmda_convolve_ediff_srfc`
    (`src/petsc_helpers.F90`) + `halo_fill_5pt`."""
    f = jnp.asarray(field, ireals)
    for _ in range(iterations):
        f = 0.2 * (
            f
            + jnp.roll(f, 1, axis=-2)
            + jnp.roll(f, -1, axis=-2)
            + jnp.roll(f, 1, axis=-1)
            + jnp.roll(f, -1, axis=-1)
        )
    return f


def slope_correction_srfc_edir(
    edir_srfc: jnp.ndarray,
    hgrad_x: jnp.ndarray,
    hgrad_y: jnp.ndarray,
    sundir,
) -> jnp.ndarray:
    """Scale the surface direct flux by the local terrain orientation.

    Parity: `slope_correction_fluxes` (`src/pprts_postprocess.F90:131`):
    factor = max(0, cos(angle sun, surface normal)) / cos(angle sun, z).
    sundir is the photon travel direction (pointing down).
    """
    sx, sy, sz = (float(sundir[0]), float(sundir[1]), float(sundir[2]))
    # unnormalized surface normal (-dh/dx, -dh/dy, 1)
    nx, ny = -hgrad_x, -hgrad_y
    norm = jnp.sqrt(nx * nx + ny * ny + 1.0)
    cos_tilt = jnp.maximum(0.0, (-(sx * nx + sy * ny + sz)) / norm)
    cos_flat = max(-sz, 1e-6)
    return edir_srfc * cos_tilt / cos_flat
