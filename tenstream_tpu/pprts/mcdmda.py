"""Full-domain Monte-Carlo reference solver on the 3-D grid.

Parity: reference `src/mcdmda.F90` (`solve_mcdmda`:125) — a distributed
photon-tracing solver over the DMDA decomposition used to cross-validate
the stream solvers (and the rayli coupling,
`src/pprts_external_solvers.F90`).  The reference passes photons between
ranks through MPI queues with distributed termination counting; here the
whole domain is resident and the photon batch marches in lockstep —
periodic x/y wrap replaces the neighbor queues.

Photons march cell-by-cell (piecewise-constant optical properties):
each iteration advances to the next cell face or to a sampled scattering
event, accumulating per-cell absorption with scatter-adds, surface
interaction by albedo (Lambertian reflection), and TOA escape tallies.

This is a validation tool (tests/benchmarks), not a production path —
its gathers make it HBM-heavy by design honesty.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tenstream_tpu.core.types import ireals


class McResult(NamedTuple):
    abso: jnp.ndarray  # (Nz, Nx, Ny) absorbed power [W/m3]
    eup_toa: jnp.ndarray  # (Nx, Ny) upward flux at TOA [W/m2]
    edn_srfc: jnp.ndarray  # (Nx, Ny) total downward flux at surface [W/m2]
    sfc_absorbed: jnp.ndarray  # (Nx, Ny) [W/m2]
    leftover: jnp.ndarray  # scalar: untallied weight fraction (diagnostics)
    niter: jnp.ndarray  # iterations used


def _hg(u, g):
    iso = jnp.abs(g) < 1e-4
    g_safe = jnp.where(iso, 0.5, g)
    frac = (1.0 - g_safe**2) / (1.0 - g_safe + 2.0 * g_safe * u)
    ct = (1.0 + g_safe**2 - frac**2) / (2.0 * g_safe)
    return jnp.clip(jnp.where(iso, 2.0 * u - 1.0, ct), -1.0, 1.0)


def _rotate(dx, dy, dz, ct, phi):
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    denom = jnp.sqrt(jnp.maximum(1e-12, 1.0 - dz * dz))
    straight = jnp.abs(dz) > 0.99999
    ux = jnp.where(straight, 1.0, dy / denom)
    uy = jnp.where(straight, 0.0, -dx / denom)
    vx = uy * dz
    vy = -ux * dz
    vz = ux * dy - uy * dx
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    nx = st * (cp * ux + sp * vx) + ct * dx
    ny = st * (cp * uy + sp * vy) + ct * dy
    nz = st * sp * vz + ct * dz
    n = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    return nx / n, ny / n, nz / n


@functools.partial(jax.jit, static_argnames=("n_photons", "max_iter"))
def solve_mcdmda(
    key,
    kabs: jnp.ndarray,  # (Nz, Nx, Ny)
    ksca: jnp.ndarray,
    g: jnp.ndarray,
    dz: jnp.ndarray,  # (Nz,) layer thickness (TOA->surface)
    dx: float,
    dy: float,
    albedo: float,
    sundir,  # (3,) photon travel direction
    edirTOA: float,
    n_photons: int = 100000,
    max_iter: int = 4000,
) -> McResult:
    """Solar Monte-Carlo solve; fluxes normalized to edirTOA * mu [W/m2]."""
    nz, nx, ny = kabs.shape
    zlev = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dz)])  # depth below TOA
    H = zlev[-1]
    Lx, Ly = nx * dx, ny * dy
    eps_wall = 1e-3 * jnp.minimum(jnp.minimum(dx, dy), jnp.min(dz))

    k0, k1, kloop = jax.random.split(key, 3)
    # photons start uniformly over the top plane, travelling along sundir
    px = jax.random.uniform(k0, (n_photons,)) * Lx
    py = jax.random.uniform(k1, (n_photons,)) * Ly
    pz = jnp.full((n_photons,), 1e-5)  # depth below TOA
    sd = jnp.asarray(sundir, ireals)
    sd = sd / jnp.linalg.norm(sd)
    ddx = jnp.full((n_photons,), sd[0])
    ddy = jnp.full((n_photons,), sd[1])
    # grid z index grows DOWNWARD; photon "depth" dz_photon = -sundir_z
    ddz = jnp.full((n_photons,), -sd[2])

    w = jnp.ones((n_photons,), ireals)
    alive = jnp.ones((n_photons,), bool)
    tau_left = -jnp.log(jnp.maximum(jax.random.uniform(jax.random.fold_in(kloop, 0), (n_photons,)), 1e-12))

    abso = jnp.zeros((nz * nx * ny,), ireals)
    eup = jnp.zeros((nx * ny,), ireals)
    edn_s = jnp.zeros((nx * ny,), ireals)
    sfc_abs = jnp.zeros((nx * ny,), ireals)

    def cell_of(px, py, pz):
        i = jnp.clip((px // dx).astype(jnp.int32), 0, nx - 1)
        j = jnp.clip((py // dy).astype(jnp.int32), 0, ny - 1)
        # compare_all: vectorized bucketing (the default "scan" method
        # lowers to a serialized while loop per MC step — see
        # ops/interp.py:fractional_index)
        k = jnp.clip(
            jnp.searchsorted(zlev, pz, side="right", method="compare_all") - 1, 0, nz - 1
        )
        return k, i, j

    def cond(state):
        it, *_ , alive = state[:1] + state[1:]
        return jnp.logical_and(state[0] < max_iter, jnp.any(state[9]))

    def body(state):
        (it, key, px, py, pz, ddx, ddy, ddz, w, alive, tau_left, abso, eup, edn_s, sfc_abs) = state
        key, ks, kc, kp, kr, ka2 = jax.random.split(key, 6)

        k, i, j = cell_of(px, py, pz)
        flat = (k * nx + i) * ny + j
        ka = kabs.reshape(-1)[flat]
        ksc = ksca.reshape(-1)[flat]
        gg = g.reshape(-1)[flat]

        # distance to next cell boundary (x, y, z cell walls)
        def axis_dist(p, d, lo, hi):
            d_safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
            t = jnp.where(d > 0, (hi - p) / d_safe, (lo - p) / d_safe)
            return jnp.where(jnp.abs(d) < 1e-9, 1e30, jnp.maximum(t, 0.0))

        tx = axis_dist(px, ddx, i * dx, (i + 1) * dx)
        ty = axis_dist(py, ddy, j * dy, (j + 1) * dy)
        tz = axis_dist(pz, ddz, zlev[k], zlev[k + 1])
        # overshoot the wall by a cell-relative epsilon: an absolute 1e-6 m
        # underflows f32 resolution at coordinates of O(100 m) and pins
        # photons onto cell faces
        t_wall = jnp.minimum(tx, jnp.minimum(ty, tz)) + eps_wall

        # distance to the sampled scattering event inside this cell
        t_sca = jnp.where(ksc > 1e-12, tau_left / jnp.maximum(ksc, 1e-12), 1e30)
        travel = jnp.minimum(t_wall, t_sca)
        scattering = alive & (t_sca < t_wall)
        tau_left = jnp.where(scattering, 0.0, tau_left - ksc * travel)

        w_new = w * jnp.exp(-ka * travel)
        abso = abso.at[flat].add(jnp.where(alive, w - w_new, 0.0))
        w = jnp.where(alive, w_new, w)

        px = jnp.where(alive, (px + ddx * travel) % Lx, px)
        py = jnp.where(alive, (py + ddy * travel) % Ly, py)
        pz = jnp.where(alive, pz + ddz * travel, pz)

        # scattering event
        ct = _hg(jax.random.uniform(kc, (n_photons,)), gg)
        sphi = jax.random.uniform(kp, (n_photons,)) * (2 * jnp.pi)
        nddx, nddy, nddz = _rotate(ddx, ddy, ddz, ct, sphi)
        ddx = jnp.where(scattering, nddx, ddx)
        ddy = jnp.where(scattering, nddy, ddy)
        ddz = jnp.where(scattering, nddz, ddz)
        tau_new = -jnp.log(jnp.maximum(jax.random.uniform(ks, (n_photons,)), 1e-12))
        tau_left = jnp.where(scattering | (tau_left <= 0), tau_new, tau_left)

        # TOA escape (depth < 0): photon leaves upward
        colflat = i * ny + j
        escaped = alive & (pz <= 0.0)
        eup = eup.at[jnp.where(escaped, colflat, 0)].add(jnp.where(escaped, w, 0.0))
        alive = alive & (~escaped)

        # surface interaction
        hit_sfc = alive & (pz >= H)
        edn_s = edn_s.at[jnp.where(hit_sfc, colflat, 0)].add(jnp.where(hit_sfc, w, 0.0))
        u_alb = jax.random.uniform(kr, (n_photons,))
        reflect = hit_sfc & (u_alb < albedo)
        absorbed = hit_sfc & (~reflect)
        sfc_abs = sfc_abs.at[jnp.where(absorbed, colflat, 0)].add(jnp.where(absorbed, w, 0.0))
        alive = alive & (~absorbed)
        # Lambertian reflection upward (depth decreases)
        mu = jnp.sqrt(jax.random.uniform(ka2, (n_photons,)))
        rphi = jax.random.uniform(jax.random.fold_in(ka2, 1), (n_photons,)) * (2 * jnp.pi)
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
        ddx = jnp.where(reflect, st * jnp.cos(rphi), ddx)
        ddy = jnp.where(reflect, st * jnp.sin(rphi), ddy)
        ddz = jnp.where(reflect, -mu, ddz)
        pz = jnp.where(reflect, H - 1e-5, pz)
        tau_left = jnp.where(reflect, tau_new, tau_left)

        # roulette
        low = alive & (w < 1e-4)
        surv = jax.random.uniform(jax.random.fold_in(kr, 2), (n_photons,)) < 0.5
        w = jnp.where(low & surv, w * 2.0, w)
        alive = alive & ((~low) | surv)

        return (it + 1, key, px, py, pz, ddx, ddy, ddz, w, alive, tau_left, abso, eup, edn_s, sfc_abs)

    state = (0, kloop, px, py, pz, ddx, ddy, ddz, w, alive, tau_left, abso, eup, edn_s, sfc_abs)
    state = jax.lax.while_loop(cond, body, state)
    abso, eup, edn_s, sfc_abs = state[11], state[12], state[13], state[14]
    leftover = jnp.sum(jnp.where(state[9], state[8], 0.0)) / n_photons
    niter = state[0]

    # normalize: each photon carries edirTOA * mu * Lx*Ly / n  [W]
    mu0 = jnp.maximum(-sd[2], 1e-6)
    w_photon = edirTOA * mu0 * (Lx * Ly) / n_photons
    cell_vol = (dz[:, None, None] * dx * dy)
    return McResult(
        abso=abso.reshape(nz, nx, ny) * w_photon / cell_vol,
        eup_toa=eup.reshape(nx, ny) * w_photon / (dx * dy),
        edn_srfc=edn_s.reshape(nx, ny) * w_photon / (dx * dy),
        sfc_absorbed=sfc_abs.reshape(nx, ny) * w_photon / (dx * dy),
        leftover=leftover,
        niter=niter,
    )
