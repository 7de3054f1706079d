"""tenstream_tpu — a TPU-native 3-D radiative transfer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`tenstream/tenstream` (the TenStream solver): approximate solvers for the
3-D radiative transfer equation on structured grids, producing direct
irradiance (edir), diffuse irradiance (edn/eup) and absorption/heating
rates from per-cell optical properties.

Architecture map (reference parity -> this package):

- reference `src/eddington.F90`          -> `tenstream_tpu.ops.eddington`
- reference `src/twostream.F90`          -> `tenstream_tpu.ops.twostream`
- reference `src/schwarzschild.F90`      -> `tenstream_tpu.ops.schwarzschild`
- reference `src/boxmc*.F90/.inc`        -> `tenstream_tpu.boxmc`
- reference `src/optprop*.F90`           -> `tenstream_tpu.optprop`
- reference `src/pprts*.F90`             -> `tenstream_tpu.pprts`
- reference `src/tenstr_atm.F90`         -> `tenstream_tpu.atm`
- reference `specint/`, `rrtmg/`, ...    -> `tenstream_tpu.spectral`
- reference MPI/PETSc parallelism        -> `tenstream_tpu.parallel` (jax.sharding)
"""

__version__ = "0.1.0"

from tenstream_tpu.core.config import Options  # noqa: F401
