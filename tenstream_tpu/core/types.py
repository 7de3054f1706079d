"""Precision policy and physical constants.

Parity: reference `src/data_parameters.F90` (kinds `ireals`, `irealLUT`,
constants at :66-120).  On TPU we default to float32 for solver state
(the reference CI runs single precision builds, `.gitlab-ci.yml:104-120`)
and allow float64 on CPU for verification (enable via
``jax.config.update('jax_enable_x64', True)`` before importing).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

# Precision selection (reference CI builds both single- and double-
# precision kinds to flush mixed-kind bugs, `.gitlab-ci.yml:104-120`).
# TENSTREAM_TPU_PRECISION=double switches every "ireals" array to f64
# (CPU verification builds); must be set before first import.
_PRECISION = os.environ.get("TENSTREAM_TPU_PRECISION", "single").lower()
if _PRECISION in ("double", "float64", "f64"):
    import jax

    jax.config.update("jax_enable_x64", True)
    ireals = jnp.float64
    irealLUT = jnp.float64
    irealMC = jnp.float64
else:
    # Solver state dtype ("ireals"). float32 everywhere; x64 runs promote naturally.
    ireals = jnp.float32
    # LUT / transfer-coefficient dtype ("irealLUT").
    irealLUT = jnp.float32
    # Monte-Carlo tally dtype — tallies accumulate over many photons.
    irealMC = jnp.float32

PI = float(np.pi)

# Physical constants, reference src/data_parameters.F90:96-118
K_BOLTZMANN = 1.380649e-23  # [J/K]
C_SPEED_OF_LIGHT = 299792458.0  # [m/s]
H_PLANCK = 6.62607015e-34  # [J s]
STEFAN_BOLTZMANN = 5.670374419e-8  # [W/m2/K4]
R_DRY_AIR = 287.058  # [J/kg/K]
R_WATER_VAPOUR = 461.52  # [J/kg/K]
CP_DRY_AIR = 1004.64  # [J/kg/K]
GRAV = 9.80665  # [m/s2]
AVOGADRO = 6.02214076e23
MOLMASS_DRY_AIR = 28.9644e-3  # [kg/mol]
MOLMASS_H2O = 18.0153e-3  # [kg/mol]
EARTH_RADIUS = 6371.0e3  # [m]
SOLAR_CONSTANT = 1361.0  # [W/m2] total solar irradiance


def asarr(x, dtype=ireals):
    return jnp.asarray(x, dtype=dtype)
