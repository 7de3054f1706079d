#!/usr/bin/env python
"""Multi-host distributed solve — the v5e-pod deployment pattern.

Parity: the reference runs its benchmark across MPI nodes
(`misc/benchmark.sh:14-16`); each rank owns its (x, y) subdomain and
results gather to rank 0 (`pprts_get_result_toZero`,
`src/pprts.F90:6265`).  The TPU-native equivalent: every HOST process
runs this same script (SPMD), `init_distributed` wires the cluster,
`scatter_global` ingests each host's own subdomain blocks, the mesh
spans all chips across hosts (intra-host edges on ICI, inter-host on
DCN), and `gather_to_host` materializes results everywhere.

Launch (one process per host), e.g. 2 hosts:
    COORD=host0:8476
    # on host 0:  python examples/ex_multihost.py $COORD 2 0
    # on host 1:  python examples/ex_multihost.py $COORD 2 1
Single-process demo (8 virtual CPU devices):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/ex_multihost.py

Validated end-to-end as a REAL 2-process gloo cluster in
tests/test_multihost.py.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import numpy as np

from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.parallel.mesh import (
    gather_to_host,
    init_distributed,
    make_mesh,
    scatter_global,
)
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def main():
    if len(sys.argv) >= 4:  # coordinator num_processes process_id
        me, nprocs = init_distributed(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
    else:
        me, nprocs = init_distributed()
    mesh = make_mesh()
    nxp, nyp = mesh.devices.shape
    print(f"[proc {me}/{nprocs}] mesh {nxp}x{nyp} over {len(jax.devices())} devices")

    nz, nx, ny = 8, 8 * nxp, 8 * nyp
    grid = Grid.create(nz, nx, ny, 100.0, 100.0, 50.0)
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False),
                             n_photons=2000)
    solver = PprtsSolver(grid, OptProp(lut))
    solver.set_mesh(mesh)

    # per-host ingest: in production `block` reads the host model's own
    # subdomain; here it synthesizes the block from the global index
    def cloud_block(index):
        zz, xx, yy = np.meshgrid(
            np.arange(nz)[index[0]], np.arange(nx)[index[1]],
            np.arange(ny)[index[2]], indexing="ij")
        k = 1e-4 + 5e-3 * ((zz == 4) & (xx % 8 < 3) & (yy % 8 < 3))
        return k.astype(np.float32)

    ka = scatter_global(mesh, cloud_block, (nz, nx, ny), np.float32)
    ks = scatter_global(mesh, cloud_block, (nz, nx, ny), np.float32)
    gg = scatter_global(mesh, np.full((nz, nx, ny), 0.5, np.float32))

    solver.set_optical_properties(0.2, ka, ks, gg)
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    sol = solver.solve(lthermal=False, lsolar=True, edirTOA=1000.0)

    edir_wm2, edn, eup, abso = solver.get_result()
    edir = gather_to_host(edir_wm2)  # every host gets the global field
    print(f"[proc {me}] edir TOA {edir[0].mean():.1f} W/m2, "
          f"sfc {edir[-1].mean():.1f} W/m2, niter {int(np.asarray(sol.niter_diff))}")


if __name__ == "__main__":
    main()
