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

import os
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kw,
) -> Tuple[int, int]:
    """Initialize multi-host JAX (the reference's `MPI_Init` +
    communicator setup; SURVEY §5.8).

    On a TPU pod slice with standard launch environments (GKE, Cloud
    TPU) all arguments auto-detect; on a hand-rolled cluster pass the
    coordinator address and process ids like `mpirun` ranks.  For CPU
    test clusters JAX's gloo-backed collectives are used automatically.
    A no-op when already initialized or when running single-process with
    no arguments.  Returns (process_id, num_processes).
    """
    already = jax.distributed.is_initialized()
    if not already and (coordinator_address is not None or num_processes is not None
                        or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
    return jax.process_index(), jax.process_count()


def make_mesh(
    devices: Optional[Sequence] = None,
    nxproc: Optional[int] = None,
    nyproc: Optional[int] = None,
) -> Mesh:
    """Build an ('x', 'y') mesh over the given (default: ALL GLOBAL)
    devices.

    Without nxproc/nyproc the device count is factored as square-ish as
    possible (parity: `domain_decompose_2d_petsc`,
    `src/helper_functions.fypp`).  After `init_distributed`,
    `jax.devices()` spans every host's chips (ordered by process, so
    each host's devices tile contiguous mesh rows — halo traffic between
    co-hosted shards stays on ICI, inter-host edges ride DCN), making
    this the multi-host decomposition with no further changes.
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
    """Place arrays whose last two dims are (Nx, Ny) onto the mesh.

    Single-host only (`jax.device_put` of a host-local array needs every
    shard addressable); multi-host input creation goes through
    `scatter_global`.
    """
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        lead = a.ndim - 2 if ndim_leading is None else ndim_leading
        sh = NamedSharding(mesh, field_spec(lead))
        out.append(jax.device_put(a, sh))
    return tuple(out)


def scatter_global(
    mesh: Mesh,
    data: Union[np.ndarray, Callable],
    global_shape: Optional[Tuple[int, ...]] = None,
    dtype=None,
    ndim_leading: Optional[int] = None,
) -> jax.Array:
    """Per-host creation of an (x, y)-sharded global field — the
    multi-host analogue of `shard_fields` and of the reference's
    host-model input path (each MPI rank owns its subdomain's optical
    properties; `init_pprts` nxproc/nyproc doc, `src/pprts.F90:225-228`).

    `data` is either
      * a callable `data(index: tuple[slice, ...]) -> np.ndarray`
        returning the block of the GLOBAL array selected by `index` —
        each host is only asked for the blocks its own devices hold
        (pure per-host ingest, nothing global ever materializes), or
      * a full global np.ndarray (convenience for tests / replicated
        readers): every host slices its local blocks from it.
    `global_shape`/`dtype` are required with a callable.
    """
    if callable(data):
        if global_shape is None or dtype is None:
            raise ValueError("scatter_global(callable) needs global_shape and dtype")
        cb = data
    else:
        arr = np.asarray(data)
        global_shape = arr.shape
        dtype = arr.dtype
        cb = lambda index: arr[index]
    lead = (len(global_shape) - 2) if ndim_leading is None else ndim_leading
    sharding = NamedSharding(mesh, field_spec(lead))
    return jax.make_array_from_callback(
        tuple(global_shape), sharding, lambda index: np.asarray(cb(index), dtype)
    )


def gather_to_host(x: jax.Array) -> np.ndarray:
    """Materialize a (possibly cross-host-sharded) result on EVERY host
    as a numpy array — the analogue of `pprts_get_result_toZero`
    (`src/pprts.F90:6265`, rank-0 gather; here all-hosts, the natural
    SPMD form).

    Fully-addressable arrays (single-host) are a plain `np.asarray`;
    cross-host arrays go through an all-gather on the mesh.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
