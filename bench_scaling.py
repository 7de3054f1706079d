#!/usr/bin/env python
"""Weak-scaling harness over a virtual device mesh.

Parity: reference `misc/benchmark.sh` measures time-to-solution vs core
count; the BASELINE target is >=80% weak-scaling efficiency.  On a
single-chip environment this runs the sharded solve over N virtual
host devices (`--xla_force_host_platform_device_count`), checking that
per-device work stays constant as the domain grows with the mesh — the
same code path that runs over ICI on a real pod.

CAVEAT: on virtual host devices all shards share the same physical
cores, so the efficiency value is a LOWER BOUND sanity check, not an ICI
projection; it also exposes GSPMD overhead hotspots (notably the cyclic
associative scans along sharded axes — flagged for a shard_map
block-scan redesign).  Run on a real pod for the BASELINE >=80% target.

Usage: BENCH_DEVICES=8 python bench_scaling.py
"""

import json
import os
import sys
import time

n_dev = int(os.environ.get("BENCH_DEVICES", 8))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={n_dev}"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals
from tenstream_tpu.optprop.facade import OptProp
from tenstream_tpu.optprop.lut import load_or_create_lut, mockup_axes
from tenstream_tpu.parallel.mesh import make_mesh, shard_fields
from tenstream_tpu.pprts.grid import Grid
from tenstream_tpu.pprts.solver import PprtsSolver
from tenstream_tpu.pprts.sun import sundir_from_angles


def count_collectives(compiled) -> dict:
    """Collective-op census of the compiled HLO (the 'collective counts
    logged' requirement: how many cross-device ops one solve issues)."""
    try:
        hlo = compiled.as_text()
    except Exception:
        return {}
    out = {}
    for op in ("all-gather", "collective-permute", "all-reduce", "all-to-all",
               "reduce-scatter"):
        n = hlo.count(f" {op}(") + hlo.count(f" {op}-start(")
        if n:
            out[op] = n
    return out


def run_on(devices, nx_per, ny_per, nz=16, reps=3, use_shard_map=True):
    mesh = make_mesh(devices)
    nxp, nyp = mesh.devices.shape
    nx, ny = nx_per * nxp, ny_per * nyp
    lut = load_or_create_lut("3_10", mockup_axes(True), mockup_axes(False), n_photons=2000)
    solver = PprtsSolver(Grid.create(nz, nx, ny, 100.0, 100.0, 100.0), OptProp(lut))
    solver.set_angles(sundir_from_angles(30.0, 40.0))
    if use_shard_map and len(devices) > 1:
        solver.set_mesh(mesh)
    rng = np.random.default_rng(0)
    ka = (1e-4 + 1e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    ks = (1e-4 + 4e-3 * rng.random((nz, nx, ny))).astype(np.float32)
    g = np.full((nz, nx, ny), 0.5, np.float32)
    solver.set_optical_properties(0.2, ka, ks, g)
    fn = solver._solve_fn(lthermal=False, lsolar=True, has_planck_srfc=False)
    alb = jnp.full((nx, ny), 0.2, ireals)
    x0 = jnp.zeros((solver.scheme.ndiff, nz + 1, nx, ny), ireals)
    args = [jnp.asarray(ka), jnp.asarray(ks), jnp.asarray(g), alb,
            jnp.zeros((nz + 1, nx, ny), ireals), jnp.zeros((nx, ny), ireals),
            jnp.asarray(1000.0, ireals), x0, jnp.asarray(1.0, ireals),
            jnp.zeros((nz, nx, ny), ireals)]
    args[0], args[1], args[2], args[3], args[7] = shard_fields(
        mesh, args[0], args[1], args[2], args[3], args[7]
    )
    colls = {}
    try:
        lowered = jax.jit(fn).lower(*args)
        colls = count_collectives(lowered.compile())
    except Exception:
        pass
    out = fn(*args)
    jax.block_until_ready(out[1])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out[1])
    niter = int(np.asarray(out[3]))
    return (time.time() - t0) / reps, nx * ny, colls, niter


def main():
    devs = jax.devices()
    t1, cols1, _, n1 = run_on(devs[:1], 32, 32)
    tN, colsN, colls, nN = run_on(devs[:n_dev], 32, 32, use_shard_map=True)
    tG, _, collsG, _ = run_on(devs[:n_dev], 32, 32, use_shard_map=False)
    # all N virtual devices share the same physical cores, so perfect
    # weak scaling on this harness is tN == N * t1 (N x the total work on
    # fixed silicon); eff = N * t1 / tN.  On a real pod each device owns
    # its cores and the ICI links; this number is a lower-bound sanity
    # check of the sharded program, not an ICI projection.
    eff = (n_dev * t1 / tN) * 100.0
    print(f"# 1 dev: {t1:.3f}s ({cols1} cols, niter {n1}); "
          f"{n_dev} dev shard_map: {tN:.3f}s ({colsN} cols, niter {nN}); "
          f"{n_dev} dev gspmd-scan: {tG:.3f}s", file=sys.stderr)
    print(f"# collectives/solve (static HLO census) shard_map: {colls}", file=sys.stderr)
    print(f"# collectives/solve (static HLO census) gspmd-scan: {collsG}", file=sys.stderr)
    print(json.dumps({
        "metric": "weak_scaling_efficiency_virtual_mesh",
        "value": round(eff, 1),
        "unit": "%",
        "vs_baseline": round(eff / 80.0, 3),
    }))


if __name__ == "__main__":
    main()
