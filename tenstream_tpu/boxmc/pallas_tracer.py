"""Pallas TPU kernel for BoxMC photon tracing: VMEM-resident batches.

Why: the jnp tracer (`tenstream_tpu.boxmc.tracer`) streams the whole
photon state through HBM on every `while_loop` iteration — for optically
thick entries (thousands of scatter events) LUT generation becomes
HBM-bound and impractically slow.  This kernel keeps the photon state of
one LUT entry (~200 KB) in VMEM for the entire walk, so the trace loop
runs at VPU speed with zero HBM traffic per iteration (the hot loop of
reference `src/boxmc.F90:559-820`, redesigned for the TPU memory
hierarchy).

One grid step traces one (entry, source) combination; entry parameters
(tauz, w0, aspect, g, phi, theta) stream in as (1, 8) blocks, tallies
(T, S) stream out as (1, ndir/ndiff) blocks.  Physics is identical to the
jnp tracer (implicit capture, HG scattering, weight roulette, truncation
redistribution); equivalence is asserted by tests/test_pallas_tracer.py.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tenstream_tpu.boxmc.schemes import get_box_scheme

_WEIGHT_ROULETTE = 1e-4
_ROULETTE_SURVIVE = 0.5
_BIG = 1e30

# photon batch layout inside the kernel: (ROWS, LANES)
_ROWS = 8
_LANES = 640  # 5120 photons
_OUT_COLS = 128  # lane-aligned packed output row: [T | S | padding]
# fixed grid size: EVERY launch pads its entry list to this many rows so
# only one kernel shape per (scheme, ldir) ever compiles (the remote
# Mosaic compile service has multi-minute latency variance)
_FIXED_B = 4096

# persist compiled kernels across processes
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def _lane_ids(shape):
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return r * jnp.int32(shape[1]) + c


def _lsr(x, k):
    """Logical right shift on int32 (mask out the sign extension) —
    Mosaic supports neither uint32<->f32 casts nor scalar bitcasts, so
    the whole hash runs in int32 two's-complement arithmetic."""
    return (x >> jnp.int32(k)) & jnp.int32((1 << (32 - k)) - 1)


def _hash_uniform(lane, base, ctr, salt):
    """Counter-based uniform in [0,1): murmur3-finalizer-style hash of
    (lane, base, ctr, salt) in int32.  Portable between compiled and
    interpret modes (the pltpu hardware PRNG is a no-op under
    interpretation).  Multiplication/addition wrap identically to uint32."""
    x = lane ^ (base * jnp.int32(-1640531527))  # 0x9E3779B9
    x = x + jnp.int32(ctr) * jnp.int32(-2048144789) + jnp.int32(salt) * jnp.int32(-1028477387)
    x = x ^ _lsr(x, 16)
    x = x * jnp.int32(0x7FEB352D)
    x = x ^ _lsr(x, 15)
    x = x * jnp.int32(-2073453131)  # 0x846CA68B
    x = x ^ _lsr(x, 16)
    x24 = _lsr(x, 8)  # top 24 bits, non-negative
    return x24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _hg_costheta(u, g):
    iso = jnp.abs(g) < 1e-4
    g_safe = jnp.where(iso, 0.5, g)
    frac = (1.0 - g_safe**2) / (1.0 - g_safe + 2.0 * g_safe * u)
    ct_hg = (1.0 + g_safe**2 - frac**2) / (2.0 * g_safe)
    return jnp.clip(jnp.where(iso, 2.0 * u - 1.0, ct_hg), -1.0, 1.0)


def _rotate_about(dx, dy, dz, ct, phi):
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    denom = jnp.sqrt(jnp.maximum(1e-12, 1.0 - dz * dz))
    straight_up = jnp.abs(dz) > 0.99999
    ux = jnp.where(straight_up, 1.0, dy / denom)
    uy = jnp.where(straight_up, 0.0, -dx / denom)
    vx = uy * dz
    vy = -ux * dz
    vz = ux * dy - uy * dx
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    nx = st * (cp * ux + sp * vx) + ct * dx
    ny = st * (cp * uy + sp * vy) + ct * dy
    nz = st * sp * vz + ct * dz
    norm = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    return nx / norm, ny / norm, nz / norm


def _make_kernel(scheme_name: str, ldir: bool, max_iter: int):
    """One kernel per (scheme, ldir): the source face, hemisphere
    restriction and RNG seed are dynamic entry parameters (columns 6-8),
    so LUT generation compiles exactly two kernels total."""
    scheme = get_box_scheme(scheme_name)
    ndir, ndiff = scheme.ndir, scheme.ndiff
    dir_table = np.asarray(scheme.dir_dst_by_face, np.int32)
    diff_table = np.asarray(scheme.diff_dst_by_face_zsign, np.int32)
    shape = (_ROWS, _LANES)

    def kernel(params_ref, out_ref):
        # per-program (1, 1, 128) blocks: the current TPU runtime faults
        # on program_id-based dynamic row reads/stores into full-array
        # VMEM blocks (minimal repro confirmed), so each grid step gets
        # its own param/out row via the BlockSpec index_map instead.
        pid = pl.program_id(0)
        lane = _lane_ids(shape)

        tauz = params_ref[0, 0, 0]
        w0 = params_ref[0, 0, 1]
        aspect = params_ref[0, 0, 2]
        g = params_ref[0, 0, 3]
        phi_deg = params_ref[0, 0, 4]
        theta_deg = params_ref[0, 0, 5]
        seed_f = params_ref[0, 0, 6]
        face_f = params_ref[0, 0, 7]  # source face id 0..5
        zsign_f = params_ref[0, 0, 8]  # -1 / 0 / +1 hemisphere restriction

        seed_i = seed_f.astype(jnp.int32)
        base = (seed_i * jnp.int32(747796405) + pid) | jnp.int32(1)

        def uni(ctr, salt):
            return _hash_uniform(lane, base, ctr, salt)

        bx = jnp.float32(1.0)
        by = jnp.float32(1.0)
        bz = jnp.maximum(aspect, 1e-6)
        kext = tauz / bz
        ksca = w0 * kext
        kabs = (1.0 - w0) * kext

        eps = jnp.float32(1e-6)
        u1 = uni(0, 0)
        u2 = uni(0, 1)

        def face_select(v0, v1, v2, v3, v4, v5):
            f = face_f
            return jnp.where(
                f < 0.5, v0,
                jnp.where(f < 1.5, v1,
                          jnp.where(f < 2.5, v2,
                                    jnp.where(f < 3.5, v3,
                                              jnp.where(f < 4.5, v4, v5)))),
            )

        one = jnp.ones(shape, jnp.float32)
        px = face_select(u1 * bx, u1 * bx, one * eps * bx, one * (1 - eps) * bx, u1 * bx, u1 * bx)
        py = face_select(u2 * by, u2 * by, u2 * by, u2 * by, one * eps * by, one * (1 - eps) * by)
        pz = face_select(one * bz * (1 - eps), one * bz * eps, u1 * bz, u1 * bz, u2 * bz, u2 * bz)

        if ldir:
            phi = jnp.deg2rad(phi_deg)
            theta = jnp.deg2rad(theta_deg)
            dx = jnp.full(shape, 1.0) * (jnp.sin(phi) * jnp.sin(theta))
            dy = jnp.full(shape, 1.0) * (jnp.cos(phi) * jnp.sin(theta))
            dz = jnp.full(shape, 1.0) * (-jnp.cos(theta))
        else:
            mu = jnp.sqrt(uni(0, 2))
            sphi = uni(0, 3) * (2.0 * np.pi)
            st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
            a = st * jnp.cos(sphi)
            b = st * jnp.sin(sphi)
            dx = face_select(a, a, mu, -mu, a, a)
            dy = face_select(b, b, a, a, mu, -mu)
            dz = face_select(-mu, mu, b, b, b, b)
            dz = jnp.where(zsign_f > 0.5, jnp.abs(dz), jnp.where(zsign_f < -0.5, -jnp.abs(dz), dz))

        weights = jnp.ones(shape, jnp.float32)
        # masks carried as f32 (Mosaic's while_loop layout unification
        # rejects i1 vector carries)
        alive = jnp.ones(shape, jnp.float32)
        scattered = jnp.zeros(shape, jnp.float32)
        # each photon exits at most once: record its destination code
        # (-1 = none; 0..ndir-1 = direct dst; ndir..ndir+ndiff-1 = diffuse
        # dst) and reduce AFTER the loop — no tally work inside the loop,
        # no scalar carries.
        exit_code = jnp.full(shape, -1.0, jnp.float32)

        # destination-code lookup values per exit face (static tables)
        dirc = [float(dir_table[f]) for f in range(6)]
        diffc_dn = [float(ndir + diff_table[f, 0]) for f in range(6)]
        diffc_up = [float(ndir + diff_table[f, 1]) for f in range(6)]

        def axis_t(p, d, hi):
            d_safe = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            bound = jnp.where(d > 0, hi, 0.0)
            t = (bound - p) / d_safe
            return jnp.where(jnp.abs(d) < 1e-12, _BIG, jnp.maximum(t, 0.0))

        def fsel(face_id, vals):
            out = jnp.full(shape, vals[5], jnp.float32)
            for f in range(4, -1, -1):
                out = jnp.where(face_id == f, jnp.float32(vals[f]), out)
            return out

        def cond(state):
            i, px, py, pz, dx, dy, dz, weights, alive_f, scattered_f, exit_code = state
            return jnp.logical_and(i < max_iter, jnp.sum(alive_f) > 0)

        def body(state):
            i, px, py, pz, dx, dy, dz, weights, alive_f, scattered_f, exit_code = state
            alive = alive_f > 0
            scattered = scattered_f > 0

            tx = axis_t(px, dx, bx)
            ty = axis_t(py, dy, by)
            tz = axis_t(pz, dz, bz)
            dmax = jnp.minimum(tx, jnp.minimum(ty, tz))
            face_id = jnp.where(
                dmax == tz,
                jnp.where(dz > 0, 0, 1),
                jnp.where(dmax == tx, jnp.where(dx > 0, 3, 2), jnp.where(dy > 0, 5, 4)),
            )

            u = jnp.maximum(uni(i + 1, 0), 1e-12)
            s_free = jnp.where(ksca > 1e-12, -jnp.log(u) / jnp.maximum(ksca, 1e-12), _BIG)
            travel = jnp.minimum(s_free, dmax)
            weights = weights * jnp.exp(-kabs * travel)
            px = px + dx * travel
            py = py + dy * travel
            pz = pz + dz * travel

            exiting = alive & (s_free >= dmax)
            up = dz > 0

            # destination code for exiting photons (static lookup chains)
            diffcode = jnp.where(up, fsel(face_id, diffc_up), fsel(face_id, diffc_dn))
            if ldir:
                newcode = jnp.where(scattered, diffcode, fsel(face_id, dirc))
            else:
                newcode = diffcode
            exit_code = jnp.where(exiting, newcode, exit_code)

            scattering = alive & (s_free < dmax)
            ct = _hg_costheta(uni(i + 1, 1), g)
            sphi = uni(i + 1, 2) * (2.0 * np.pi)
            ndx, ndy, ndz = _rotate_about(dx, dy, dz, ct, sphi)
            dx = jnp.where(scattering, ndx, dx)
            dy = jnp.where(scattering, ndy, dy)
            dz = jnp.where(scattering, ndz, dz)
            scattered = scattered | scattering
            alive = alive & (~exiting)

            low = alive & (weights < _WEIGHT_ROULETTE)
            surv = uni(i + 1, 3) < _ROULETTE_SURVIVE
            weights = jnp.where(low & surv, weights / _ROULETTE_SURVIVE, weights)
            alive = alive & ((~low) | surv)

            return (
                i + 1, px, py, pz, dx, dy, dz, weights,
                alive.astype(jnp.float32), scattered.astype(jnp.float32),
                exit_code,
            )

        state = (jnp.int32(0), px, py, pz, dx, dy, dz, weights, alive, scattered, exit_code)
        state = jax.lax.while_loop(cond, body, state)
        weights, alive_f, exit_code = state[7], state[8], state[10]

        # truncation redistribution (energy conservation)
        leftover = jnp.sum(jnp.where(alive_f > 0, weights, 0.0))
        s_mass = jnp.sum(jnp.where(exit_code >= ndir, weights, 0.0))
        scale = jnp.where(s_mass > 0, 1.0 + leftover / jnp.maximum(s_mass, 1e-30), 1.0)

        norm = jnp.float32(1.0 / (_ROWS * _LANES))
        # one reduction per destination, assembled into a lane-aligned
        # (1, 1, _OUT_COLS) row via one-hot column masks (no scalar stores)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _OUT_COLS), 2)
        row = jnp.zeros((1, 1, _OUT_COLS), jnp.float32)
        for d in range(ndir):
            t_d = jnp.sum(jnp.where(exit_code == d, weights, 0.0)) * norm
            row = row + jnp.where(col == d, t_d, 0.0)
        for s in range(ndiff):
            s_v = jnp.sum(jnp.where(exit_code == ndir + s, weights, 0.0)) * scale * norm
            row = row + jnp.where(col == ndir + s, s_v, 0.0)
        out_ref[...] = row

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme_name", "ldir", "max_iter"))
def _run_pallas(params_padded, scheme_name, ldir, max_iter):
    scheme = get_box_scheme(scheme_name)
    Bp = params_padded.shape[0]
    kernel = _make_kernel(scheme_name, ldir, max_iter)
    out = pl.pallas_call(
        kernel,
        grid=(Bp,),
        in_specs=[pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, _OUT_COLS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1, _OUT_COLS), jnp.float32),
    )(params_padded.reshape(Bp, 1, 128))
    return out.reshape(Bp, _OUT_COLS)


def run_boxmc_pallas(
    params: jnp.ndarray,  # (B, >=6): tauz, w0, aspect, g, phi, theta
    scheme_name: str,
    src: int,
    ldir: bool,
    max_iter: int = 3000,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace all entries of `params`; returns (T (B, ndir), S (B, ndiff)).

    `src`/`seed` become dynamic per-entry parameters (columns 6-8) so all
    sources of a kind share one compiled kernel.
    """
    scheme = get_box_scheme(scheme_name)
    B = params.shape[0]
    if ldir:
        face, zsign = scheme.dir_src_faces[src], 0
    else:
        spec = scheme.diff_srcs[src]
        face, zsign = spec.face, spec.zsign
    # pad the entry count to the fixed grid size and the param columns to
    # a full lane tile (Mosaic faults on unaligned VMEM buffers; pad rows
    # are zero-extinction boxes that exit in one step).
    assert B <= _FIXED_B, f"chunk {B} exceeds fixed pallas batch {_FIXED_B}"
    # fixed shape on accelerators (compile once); minimal padding on CPU
    # interpret-mode runs (grid steps are interpreted sequentially there)
    Bp = _FIXED_B if jax.default_backend() != "cpu" else ((B + 7) // 8) * 8
    pp = jnp.zeros((Bp, 128), jnp.float32)
    pp = pp.at[:B, : min(params.shape[1], 6)].set(params[:, :6])
    pp = pp.at[:B, 6].set(float((seed + 977 * src) % (1 << 22)))
    pp = pp.at[:B, 7].set(float(face))
    pp = pp.at[:B, 8].set(float(zsign))
    # whole arrays live in VMEM (small); each grid step reads/writes its
    # own row via program_id — Mosaic requires full-array blocks here.
    out = _run_pallas(pp, scheme_name, ldir, max_iter)
    T = out[:B, : scheme.ndir]
    S = out[:B, scheme.ndir : scheme.ndir + scheme.ndiff]
    return T, S


def pallas_photons_per_entry() -> int:
    return _ROWS * _LANES
