#!/usr/bin/env python
"""Micro-profile of the two-level diffuse preconditioner on the chip.

Times, at bench-like shapes (vmapped over a band chunk), the three
pieces whose sum is the per-solve PC cost:

  build   — `build_coarse_factors` (cyclic-reduction factorization of the
            per-Fourier-mode coarse systems; ONCE per band solve)
  apply   — one full M(r) application (pool + line solve + coarse solve)
  line    — the old vertical-line solve alone (the r3 default), for the
            delta

Usage: python tools/profile_precond.py [NX [NZ [CHUNK [CF]]]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.pprts.ediff import vertical_line_solve
from tenstream_tpu.pprts.precond import (
    auto_coarse_factor,
    build_coarse_factors,
    coarse_solve,
    make_two_level_pc,
)
from tenstream_tpu.streams import get_scheme


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def profile_one(nx, nz, chunk, cf):
    ny = nx
    scheme = get_scheme("3_10")
    nf = scheme.ndiff
    if cf <= 0:
        cf = auto_coarse_factor(nx, ny)
    ncx, ncy = nx // cf, ny // cf

    rng = np.random.default_rng(0)
    coeff = jnp.asarray(
        rng.uniform(0.0, 0.08, (chunk, nf, nf, nz, nx, ny)).astype(np.float32)
    )
    alb = jnp.full((chunk, nx, ny), 0.15, jnp.float32)
    r = jnp.asarray(
        rng.standard_normal((chunk, nf, nz + 1, nx, ny)).astype(np.float32)
    )

    build = jax.jit(
        jax.vmap(lambda c, a: build_coarse_factors(scheme, c, a, cf, ncx, ncy))
    )
    t_build = timeit(build, coeff, alb)
    fac = build(coeff, alb)

    csolve = jax.jit(jax.vmap(lambda f, x: coarse_solve(f, jnp.mean(
        x.reshape(nf, nz + 1, ncx, cf, ncy, cf), axis=(-3, -1)))))
    t_coarse = timeit(csolve, fac, r)

    line = jax.jit(jax.vmap(lambda c, x, a: vertical_line_solve(scheme, c, x, a)))
    t_line = timeit(line, coeff, r, alb)

    full = jax.jit(
        jax.vmap(lambda c, a, x: make_two_level_pc(scheme, c, a)(x))
    )
    t_full = timeit(full, coeff, alb, r)

    print(f"# grid {nx}x{ny}x{nz} chunk={chunk} cf={cf} coarse {ncx}x{ncy} "
          f"({ncx*ncy} modes, {nz+1} z-blocks, {nf}x{nf} blocks)", flush=True)
    print(f"build_coarse_factors : {t_build*1e3:9.2f} ms  (once per band solve)")
    print(f"coarse_solve apply   : {t_coarse*1e3:9.2f} ms  (per iteration)")
    print(f"vertical line apply  : {t_line*1e3:9.2f} ms  (per iteration)")
    print(f"full M build+apply   : {t_full*1e3:9.2f} ms  (build + 1 apply fused)",
          flush=True)


def main():
    if len(sys.argv) > 1:
        nx = int(sys.argv[1])
        nz = int(sys.argv[2]) if len(sys.argv) > 2 else 24
        chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        cf = int(sys.argv[4]) if len(sys.argv) > 4 else 0
        profile_one(nx, nz, chunk, cf)
        return
    for nx, nz, chunk, cf in [
        (64, 24, 8, 0),     # bench 64^2 defaults (auto cf=2, 32x32 coarse)
        (64, 24, 8, 4),     # coarser 16x16
        (256, 113, 1, 0),   # BASELINE shapes (auto cf=8, 32x32 coarse)
        (256, 113, 1, 16),  # coarser 16x16
        (256, 113, 2, 0),   # chunk=2 lanes
    ]:
        profile_one(nx, nz, chunk, cf)


if __name__ == "__main__":
    main()
