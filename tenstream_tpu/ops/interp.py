"""N-D multilinear interpolation over rectilinear (non-uniform) grids.

Parity: reference `src/interpolation.F90` (`interp_vec_simplex_nd`:292 and
the multilinear `interp_4d` variants) + `src/search.fypp`
(`find_real_location` — fractional index of a value in a grid vector).

TPU-first redesign: instead of interpolating one query point at a time
inside Fortran loops, all grid cells are looked up at once — fractional
indices via vectorized searchsorted, then a 2^k-corner gather from the
flattened table.  This is the LUT-lookup inner loop of the whole solver
(`src/optprop_LUT.F90:1452-1487`), so it must stay a single fused
gather/FMA kernel.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals


def fractional_index(grid: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Fractional index of x in a sorted 1-D grid, clipped to the range.

    Parity: `find_real_location`, `src/search.fypp:1-238`.
    """
    grid = jnp.asarray(grid)
    n = grid.shape[0]
    x = jnp.clip(x, grid[0], grid[-1])
    # method: jnp.searchsorted's default "scan" lowers the binary search
    # to a serialized XLA while loop — measured 30 ms PER CALL on a
    # (8,23,64,64) band-chunk batch (4 calls = 36% of a warm solve
    # program).  "compare_all" is one broadcast compare + reduce, fully
    # vectorized: 82x faster for the <=31-entry LUT axes.  Fall back to
    # the O(B log n) scan only for grids large enough that the O(B n)
    # compare would dominate (crossover measured on <=31-entry axes; 64
    # is a conservative cap so the (B, n) one-hot temps stay small).
    method = "compare_all" if n <= 64 else "scan"
    i = jnp.clip(jnp.searchsorted(grid, x, side="right", method=method) - 1, 0, n - 2)
    if n <= 64:
        # grid-value lookup via one-hot dot products: jnp.take of a tiny
        # grid with a huge index batch lowers to a serialized gather
        # (traced at ~6 ms per take on a (8,23,64,64) batch — 2 takes x
        # 4 axes per assembly); the (B, n) one-hot contraction is a
        # fully vectorized elementwise+reduce.  sum(oh*grid) rather than
        # oh @ grid: the dot could ride a bf16 MXU pass under DEFAULT
        # matmul precision and round axis values like w0=0.99999, which
        # must stay bit-exact for frac to land in [0, 1].
        oh = (i[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(grid.dtype)
        g0 = jnp.sum(oh * grid, axis=-1)
        g1 = jnp.sum(oh * jnp.roll(grid, -1), axis=-1)  # row i -> grid[i+1]
    else:
        g0 = jnp.take(grid, i)
        g1 = jnp.take(grid, i + 1)
    frac = (x - g0) / jnp.maximum(g1 - g0, jnp.finfo(ireals).tiny)
    frac = jnp.clip(frac, 0.0, 1.0)  # defensive: exact-arithmetic invariant
    return i.astype(ireals) + frac


def _accumulate_gathers(flat_t, idxs, weights, C, loop: bool):
    """sum_j take(flat_t, idx_j) * w_j, channels-first.

    loop=False: one unrolled expression — XLA fuses all corner gathers
    into a single kernel (fastest when the temps fit).
    loop=True: `lax.scan` over the corners so only ONE corner-gather
    temp plus the accumulator are live at a time.  This is the
    BASELINE-scale memory fix: at 192x192x127 with a 27-layer z-slab and
    C=100 the unrolled form kept 16 x ~1 GB corner temps live under
    remat (measured 24.8 GB, OOM on a 16 GB chip); the scan bounds the
    assembly working set to ~2 temps regardless of corner count.
    """
    expand = (None,) * len(C) + (...,)
    if not loop:
        out = None
        for w, idx in zip(weights, idxs):
            contrib = jnp.take(flat_t, idx, axis=-1) * w[expand]
            out = contrib if out is None else out + contrib
        return out

    B = jnp.broadcast_shapes(*[jnp.shape(w) for w in weights],
                             *[jnp.shape(i) for i in idxs])
    idxA = jnp.stack([jnp.broadcast_to(i, B) for i in idxs])
    wA = jnp.stack([jnp.broadcast_to(w, B).astype(flat_t.dtype) for w in weights])

    def body(acc, iw):
        idx, w = iw
        return acc + jnp.take(flat_t, idx, axis=-1) * w[expand], None

    acc0 = jnp.zeros(C + B, flat_t.dtype)
    out, _ = jax.lax.scan(body, acc0, (idxA, wA))
    return out


def interp_multilinear_cf(
    table: jnp.ndarray, fracs: Sequence[jnp.ndarray], *, loop_gathers: bool = False
) -> jnp.ndarray:
    """Multilinear interpolation, channels-FIRST result.

    Args:
      table: (n0, n1, ..., n_{k-1}, C...) values; trailing payload channels.
      fracs: k arrays of identical shape B, fractional indices per dim.

    Returns: array of shape C... + B.

    TPU note: the per-corner gather is performed on the transposed
    (C..., N) table so the huge batch axis lands on the minor (lane)
    dimension.  Gathering (B, C) rows instead pads C up to the 128-lane
    tile — measured 4.3x HBM expansion (7.9 GB per corner temp) on a
    256x256x127 grid with C=30, which OOMed the BASELINE-scale scene.
    """
    k = len(fracs)
    dims = table.shape[:k]
    C = table.shape[k:]
    # (C..., N): one small host-side transpose of the table per call
    flat_t = jnp.moveaxis(table.reshape((-1,) + C), 0, -1)

    i0 = []
    w1 = []
    for d, f in enumerate(fracs):
        base = jnp.clip(jnp.floor(f), 0, dims[d] - 2).astype(jnp.int32)
        i0.append(base)
        w1.append(jnp.asarray(f, ireals) - base.astype(ireals))

    strides = []
    s = 1
    for d in reversed(range(k)):
        strides.insert(0, s)
        s *= dims[d]

    idxs = []
    weights = []
    for corner in range(1 << k):
        idx = 0
        w = None
        for d in range(k):
            hi = (corner >> d) & 1
            idx = idx + (i0[d] + hi) * strides[d]
            wd = w1[d] if hi else (1.0 - w1[d])
            w = wd if w is None else w * wd
        idxs.append(idx)
        weights.append(w)
    return _accumulate_gathers(flat_t, idxs, weights, C, loop_gathers)


def interp_simplex_cf(
    table: jnp.ndarray, fracs: Sequence[jnp.ndarray], *, loop_gathers: bool = False
) -> jnp.ndarray:
    """Simplex (Kuhn-triangulation) interpolation, channels-FIRST result.

    Parity: reference `interp_vec_simplex_nd`
    (`src/interpolation.F90:292`, after HPL-2002-320): linear
    interpolation on the simplex of the hypercube that contains the
    query, needing only k+1 gathers instead of 2^k — 5 vs 16 for the
    4-D transfer tables, a ~3x cut in the assembly-phase gather
    traffic.  Exact at grid points and on simplex facets; inside a cell
    it differs from multilinear by O(grid-spacing^2) curvature terms.

    Kuhn split: sort the fractional parts descending; the containing
    simplex walks from the floor corner one +1 step per dimension in
    sorted order, with telescoping weights (1-f(1), f(1)-f(2), ...,
    f(k)).

    Args/returns as `interp_multilinear_cf`.
    """
    k = len(fracs)
    dims = table.shape[:k]
    C = table.shape[k:]
    flat_t = jnp.moveaxis(table.reshape((-1,) + C), 0, -1)  # (C..., N)

    i0 = []
    fr = []
    for d, f in enumerate(fracs):
        base = jnp.clip(jnp.floor(f), 0, dims[d] - 2).astype(jnp.int32)
        i0.append(base)
        fr.append(jnp.asarray(f, ireals) - base.astype(ireals))

    strides = []
    s = 1
    for d in reversed(range(k)):
        strides.insert(0, s)
        s *= dims[d]

    B = jnp.broadcast_shapes(*[jnp.shape(f) for f in fr])
    F = jnp.stack([jnp.broadcast_to(f, B) for f in fr])  # (k,) + B
    order = jnp.argsort(-F, axis=0)
    Fs = jnp.take_along_axis(F, order, axis=0)  # descending
    sorted_strides = jnp.asarray(strides, jnp.int32)[order]  # (k,) + B

    base_idx = 0
    for d in range(k):
        base_idx = base_idx + i0[d] * strides[d]

    cum = jnp.cumsum(sorted_strides, axis=0)
    weights = (
        [1.0 - Fs[0]]
        + [Fs[j - 1] - Fs[j] for j in range(1, k)]
        + [Fs[k - 1]]
    )
    idxs = [base_idx] + [base_idx + cum[j] for j in range(k)]
    return _accumulate_gathers(flat_t, idxs, weights, C, loop_gathers)


def _onehot_pair(f: jnp.ndarray, n: int, dtype) -> jnp.ndarray:
    """(B, n) interpolation matrix with 2 nonzeros per row: (1-w) at
    floor(f), w at floor(f)+1 (clipped to the last interval)."""
    i = jnp.clip(jnp.floor(f), 0, n - 2).astype(jnp.int32)
    w = (jnp.asarray(f, ireals) - i.astype(ireals)).astype(dtype)
    ar = jnp.arange(n, dtype=jnp.int32)
    lo = (i[..., None] == ar).astype(dtype)
    hi = (i[..., None] + 1 == ar).astype(dtype)
    return lo * (1.0 - w)[..., None] + hi * w[..., None]


def interp_4d_layered_onehot_cf(
    table: jnp.ndarray,
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    f2_layer: jnp.ndarray,
    f3: jnp.ndarray,
) -> jnp.ndarray:
    """4-D multilinear interpolation as per-layer one-hot MXU matmuls.

    Bit-compatible with `interp_multilinear_cf` (same multilinear math,
    different summation order) for the pprts assembly case where axis 2
    (aspect = dz/dx) is CONSTANT PER LAYER.  Round-3 profile: the
    5-corner gather form runs at 6% of HBM peak at 256^2 — every cell
    does latency-bound random row reads from an 8.2 MB table
    (`docs/PROFILE_r3.md`).  The TPU-idiomatic gather is a one-hot
    matmul: per z-layer, blend the aspect axis (scalar weight), then
    contract a (cells, n_tau*n_w0) 4-nonzero bilinear weight matrix
    against the (n_tau*n_w0, n_g*C) layer table on the MXU, then blend
    the g axis per cell on the VPU.  The weight matrix is built by an
    iota-compare (no gather anywhere), and a `lax.scan` over z keeps one
    layer's weights live at a time.

    Args:
      table: (n0, n1, n2, n3) + C  (tau, w0, aspect, g, channels...).
      f0, f1, f3: fractional indices, shape (nz, nx, ny).
      f2_layer: per-layer fractional aspect index, shape (nz,).

    Returns: C... + (nz, nx, ny), channels-first like the gather paths.
    """
    n0, n1, n2, n3 = table.shape[:4]
    C = table.shape[4:]
    nz, nx, ny = jnp.broadcast_shapes(f0.shape, f1.shape, f3.shape)
    Bc = nx * ny
    nC = int(np.prod(C)) if C else 1

    # per-layer aspect blend: (nz, n0*n1, n3*nC)
    i2 = jnp.clip(jnp.floor(f2_layer), 0, n2 - 2).astype(jnp.int32)
    w2 = (jnp.asarray(f2_layer, ireals) - i2.astype(ireals)).astype(table.dtype)
    tl = jnp.moveaxis(jnp.take(table, i2, axis=2), 2, 0)
    th = jnp.moveaxis(jnp.take(table, i2 + 1, axis=2), 2, 0)
    w2b = w2.reshape((nz,) + (1,) * (tl.ndim - 1))
    tbl = (tl * (1.0 - w2b) + th * w2b).reshape(nz, n0 * n1, n3 * nC)

    fB = lambda f: jnp.broadcast_to(f, (nz, nx, ny)).reshape(nz, Bc)

    def layer(_, inp):
        t_l, ft, fw, fg = inp
        oh0 = _onehot_pair(ft, n0, table.dtype)  # (B, n0)
        oh1 = _onehot_pair(fw, n1, table.dtype)  # (B, n1)
        W = (oh0[:, :, None] * oh1[:, None, :]).reshape(Bc, n0 * n1)
        out = jax.lax.dot(W, t_l, precision=jax.lax.Precision.HIGHEST)
        oh3 = _onehot_pair(fg, n3, table.dtype)  # (B, n3)
        out = jnp.einsum(
            "bg,bgc->bc", oh3, out.reshape(Bc, n3, nC),
            precision=jax.lax.Precision.HIGHEST,
        )
        return None, out

    _, outs = jax.lax.scan(layer, None, (tbl, fB(f0), fB(f1), fB(f3)))
    out = jnp.moveaxis(outs, -1, 0).reshape(C + (nz, nx, ny))
    return out.astype(ireals)


def interp_multilinear(table: jnp.ndarray, fracs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Multilinear interpolation of `table` at fractional indices.

    Args:
      table: (n0, n1, ..., n_{k-1}, C...) values; trailing payload channels.
      fracs: k arrays of identical shape B, fractional indices per dim.

    Returns: array of shape B + C....

    Prefer `interp_multilinear_cf` for large batches: this wrapper's
    final transpose back to channels-last re-introduces the padded
    layout at the output (fine for small B / payload-free tables).
    """
    C = table.shape[len(fracs):]
    out = interp_multilinear_cf(table, fracs)
    if C:
        out = jnp.moveaxis(out, tuple(range(len(C))), tuple(range(-len(C), 0)))
    return out
