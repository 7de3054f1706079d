"""Wedge transfer-coefficient tables (LUT) and batched lookups.

Parity: reference `t_optprop_wedge` (`src/optprop.F90:150-173`) backed
by `optprop_LUT` wedge tables with the `LUT_param_phi`
re-parameterization for arbitrary triangle shapes.  Here the mesh
triangles are all congruent (see `plexrt.mesh`), so a single canonical
table over (tau, w0, aspect, g [, phi, theta]) suffices; the second
mesh orientation evaluates at phi+180 and arbitrary azimuths wrap
periodically — no shape parameterization needed.

Tables are generated with the wedge Monte-Carlo tracer
(`plexrt.wedge_boxmc`), cached as npz, validated for energy
conservation like the cube LUTs (`optprop/lut.py`).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals
from tenstream_tpu.ops.interp import fractional_index, interp_multilinear
from tenstream_tpu.plexrt.wedge_boxmc import NDIFF, run_wedge_boxmc

_CACHE_VERSION = 2  # v2: downwind-source sanitization baked into tables
N_DIR_SRC = 4  # 5_8: top, AB, BC, CA (no bottom source for a downward sun)

# Per-scheme direct-source lists (indices into the tracer's direct dof
# order; bottom dofs are never sources for a downward sun) and the
# set of same-face dst dofs per source (no straight-line direct photon
# re-exits its own entry face; zeroed during sanitization).
# 18_8 dof order (`plexrt/wedge_boxmc.py` docstring): top corners 0..2,
# side quads 3..14 (4 per side), bottom corners 15..17.
_SCHEME_DIR = {
    "5_8": {
        "ndir": 5,
        "srcs": list(range(4)),  # top, AB, BC, CA
        "src_face": [0, 2, 3, 4],  # tracer face ids (0 top, 2..4 sides)
        "face_dsts": {0: [0], 2: [1], 3: [2], 4: [3]},
    },
    "18_8": {
        "ndir": 18,
        "srcs": list(range(15)),  # 3 top corners + 12 side quads
        "src_face": [0, 0, 0] + [2] * 4 + [3] * 4 + [4] * 4,
        "face_dsts": {0: [0, 1, 2], 2: [3, 4, 5, 6], 3: [7, 8, 9, 10],
                      4: [11, 12, 13, 14]},
    },
}


def n_dir_src(scheme: str = "5_8") -> int:
    return len(_SCHEME_DIR[scheme]["srcs"])


@dataclass(frozen=True)
class WedgeAxes:
    tau: np.ndarray
    w0: np.ndarray
    aspect: np.ndarray
    g: np.ndarray
    phi: Optional[np.ndarray] = None  # direct only, degrees in [0, 360]
    theta: Optional[np.ndarray] = None

    def hash(self) -> str:
        h = hashlib.sha256()
        for a in (self.tau, self.w0, self.aspect, self.g, self.phi, self.theta):
            if a is not None:
                h.update(np.asarray(a, np.float64).tobytes())
        h.update(bytes([_CACHE_VERSION]))
        return h.hexdigest()[:16]


class WedgeLUT(NamedTuple):
    daxes: WedgeAxes
    faxes: WedgeAxes
    dir2dir: np.ndarray  # (nt,nw,na,ng,nphi,nth, n_dir_src, ndir)
    dir2diff: np.ndarray  # (..., n_dir_src, NDIFF)
    diff2diff: np.ndarray  # (nt,nw,na,ng, NDIFF, NDIFF)
    scheme: str = "5_8"
    # triangle shape the table was traced on: apex C in units of |AB|
    # (canonical right triangle = (1, 1)); shape-aware tables for ICON
    # meshes are traced at the mesh's mean shape (`wedge_lut_for_mesh`)
    apex: tuple = (1.0, 1.0)


def test_axes() -> WedgeAxes:
    # NOTE the w0 axis must reach ~1: conservative clouds clipped to a
    # lower w0 fabricate absorption (round-2 fix; cost a 26% TOA-albedo
    # bias in the first MC cross-validation)
    return WedgeAxes(
        tau=np.array([1e-10, 0.1, 0.5, 1.5, 4.0, 15.0], np.float32),
        w0=np.array([0.0, 0.5, 0.9, 0.99999], np.float32),
        aspect=np.array([0.4, 1.0, 2.5], np.float32),
        g=np.array([0.0, 0.5, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 7).astype(np.float32),
        theta=np.array([0.0, 40.0, 75.0], np.float32),
    )


def production_axes() -> tuple:
    """Axes of the COMMITTED production-intermediate wedge table
    (data/luts/WEDGE_LUT_5_8_9be52d897f4748f4.npz, generated on-chip in
    round 3 at 4000 photons/entry, max_iter 500 with leftover
    renormalization): tau12 x w07 x aspect8 x g3 x phi9 x theta6 direct,
    g4 diffuse — an order of magnitude denser than the round-2 test
    table; `load_or_create_wedge_lut(*production_axes(),
    n_photons=4000)` loads it from cache.  Full reference density
    (`default_axes`) is a ~30-minute on-chip job with the committed
    chunk=256 / max_iter=500 knobs (see ROUND3_NOTES.md)."""
    daxes = WedgeAxes(
        tau=np.array([1e-10, 1e-2, 0.05, 0.15, 0.4, 0.8, 1.5, 3.0,
                      6.0, 12.0, 30.0, 100.0], np.float32),
        w0=np.array([0.0, 0.35, 0.6, 0.8, 0.9, 0.95, 0.99999], np.float32),
        aspect=np.array([0.15, 0.3, 0.5, 0.75, 1.0, 1.5, 2.5, 5.0], np.float32),
        g=np.array([0.0, 0.45, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 9).astype(np.float32),
        theta=np.array([0.0, 20.0, 40.0, 55.0, 67.5, 80.0], np.float32),
    )
    faxes = WedgeAxes(daxes.tau, daxes.w0, daxes.aspect,
                      np.array([0.0, 0.25, 0.5, 0.85], np.float32))
    return daxes, faxes


def default_axes() -> WedgeAxes:
    """Production-grade wedge parameter space (reference wedge LUT
    presets, `src/optprop_parameters.F90` LUT_WEDGE blocks, at the same
    documented angle-density deviation as the cube production tables:
    the smooth dir2diff scattering source tolerates coarser angles, and
    the canonical-triangle mirror symmetrization averages 2 samples per
    stored coefficient)."""
    return WedgeAxes(
        tau=np.array([1e-10, 1e-3, 1e-2, 0.05, 0.15, 0.4, 0.8, 1.5,
                      3.0, 6.0, 12.0, 30.0, 100.0], np.float32),
        w0=np.array([0.0, 0.35, 0.6, 0.8, 0.9, 0.95, 0.99, 0.99999], np.float32),
        aspect=np.array([0.15, 0.3, 0.5, 0.75, 1.0, 1.5, 2.5, 5.0], np.float32),
        g=np.array([0.0, 0.25, 0.5, 0.85], np.float32),
        phi=np.linspace(0.0, 360.0, 13).astype(np.float32),
        theta=np.array([0.0, 15.0, 30.0, 42.5, 55.0, 67.5, 80.0], np.float32),
    )


def _trace_grid(axes: WedgeAxes, src: int, ldir: bool, n_photons: int, seed: int,
                scheme: str = "5_8", chunk: int = 2048, verbose: bool = False,
                apex=None, max_iter: int = 3000, ckpt_path=None):
    """Vectorized tracing over the whole entry grid (vmapped).

    Entries are processed in fixed-size chunks: an unchunked vmap over a
    production-density direct grid materializes the per-photon tally
    buffer for EVERY entry at once (measured 61 GB for 302k entries x
    10k photons on the TPU) and keeps recompiling per grid size; chunks
    bound the live buffer and reuse one compiled kernel.  Per-entry seeds
    come from the GLOBAL entry index, so results are chunk-size
    invariant."""
    grids = [axes.tau, axes.w0, axes.aspect, axes.g]
    if ldir:
        grids += [axes.phi, axes.theta]
    mesh = np.meshgrid(*grids, indexing="ij")
    flat_np = [np.asarray(m.ravel(), np.float32) for m in mesh]
    n = flat_np[0].shape[0]

    ndir = _SCHEME_DIR[scheme]["ndir"]
    if ldir:
        fn = jax.jit(jax.vmap(
            lambda k, t, w, a, gg, ph, th: run_wedge_boxmc(
                k, src, True, t, w, gg, a, ph, th, n_photons=n_photons,
                scheme=scheme, apex=apex, max_iter=max_iter,
            )
        ))
    else:
        fn = jax.jit(jax.vmap(
            lambda k, t, w, a, gg: run_wedge_boxmc(
                k, src, False, t, w, gg, a, n_photons=n_photons, scheme=scheme,
                apex=apex, max_iter=max_iter,
            )
        ))

    base = jax.random.PRNGKey(seed)
    # small (test/mockup) grids fit one chunk — don't pad them up to the
    # full chunk size (up to ~8x wasted tracing on cold cache builds)
    chunk = min(chunk, n)
    # per-chunk checkpointing: production direct grids are ~300k entries
    # per source and a watchdog/preemption kill would otherwise lose the
    # whole source (round 3 lost two ~90%-complete runs this way)
    done_lo = 0
    Ts, Ss = [], []
    if ckpt_path is not None and os.path.exists(ckpt_path):
        z = np.load(ckpt_path)
        done_lo = int(z["done_lo"])
        if done_lo > 0:
            Ts, Ss = [z["T"]], [z["S"]]
        if verbose:
            print(f"  wedge trace src {src}: resume at {done_lo}/{n}", flush=True)

    def _save_ckpt(hi):
        if ckpt_path is None:
            return
        # np.savez appends .npz to names that lack it — keep the suffix
        tmp = ckpt_path[:-len(".npz")] + ".tmp.npz"
        np.savez(tmp, T=np.concatenate(Ts, axis=0), S=np.concatenate(Ss, axis=0),
                 done_lo=hi)
        os.replace(tmp, ckpt_path)

    for ic, lo in enumerate(range(done_lo, n, chunk)):
        hi = min(lo + chunk, n)
        nc = hi - lo
        idx = np.arange(lo, hi)
        if nc < chunk:  # pad to the compiled chunk shape
            idx = np.concatenate([idx, np.full(chunk - nc, lo)])
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.asarray(idx))
        args = [jnp.asarray(f[idx % n]) for f in flat_np]
        T, S = fn(keys, *args)
        Ts.append(np.asarray(T[:nc]))
        Ss.append(np.asarray(S[:nc]))
        if ic % 64 == 63:
            _save_ckpt(hi)
        if verbose and ic % 16 == 0:
            print(f"  wedge trace src {src} {'dir' if ldir else 'diff'}: "
                  f"{hi}/{n}", flush=True)
    T = np.concatenate(Ts, axis=0)
    S = np.concatenate(Ss, axis=0)
    if ckpt_path is not None:
        _save_ckpt(n)
    shp = tuple(len(g) for g in grids)
    return T.reshape(shp + (ndir,)), S.reshape(shp + (NDIFF,))


def _sanitize_dir_tables(daxes: WedgeAxes, d2d: np.ndarray, d2f: np.ndarray,
                         scheme: str = "5_8", apex=None) -> None:
    """Make downwind source rows interpolation-safe (in place).

    A side face is a valid direct inflow only when the sun direction has
    a positive inward component; at downwind (phi, theta) grid points the
    traced "source" photons exit straight back out, producing self-exit
    rows.  In exact arithmetic those rows receive zero flux, but
    interpolation between a valid and a garbage grid point leaks the
    self-exit back into the neighbor exchange (an energy-GAIN loop).
    Fix: zero the geometrically impossible self-exit column and replace
    every downwind grid point by its nearest valid phi (same theta), or
    the nearest valid theta when an entire phi circle is invalid (e.g.
    side faces at theta = 0).  Mirrors the role of the reference's
    LUT_param_phi valid-range bookkeeping (`src/LUT_param_phi.F90`)."""
    phis = np.deg2rad(np.asarray(daxes.phi, np.float64))
    thetas = np.deg2rad(np.asarray(daxes.theta, np.float64))
    PH, TH = np.meshgrid(phis, thetas, indexing="ij")
    d = np.stack(
        [np.sin(PH) * np.sin(TH), np.cos(PH) * np.sin(TH), -np.cos(TH)], axis=-1
    )  # (nphi, nth, 3)
    cx, cy = apex if apex is not None else (1.0, 1.0)
    Lbc = np.hypot(cx - 1.0, cy)
    Lca = np.hypot(cx, cy)
    # inward face normals by tracer face id (0 top, 2 AB, 3 BC, 4 CA);
    # general triangle A=(0,0) B=(1,0) C=(cx,cy) (wedge_boxmc
    # _side_normals convention)
    face_normal = {0: (0.0, 0.0, -1.0), 2: (0.0, 1.0, 0.0),
                   3: (-cy / Lbc, (cx - 1.0) / Lbc, 0.0),
                   4: (cy / Lca, -cx / Lca, 0.0)}
    cfg = _SCHEME_DIR[scheme]

    nphi, nth = len(phis), len(thetas)
    for s, face in enumerate(cfg["src_face"]):
        n = face_normal[face]
        # no straight-line direct photon re-exits its own entry face
        d2d[..., s, cfg["face_dsts"][face]] = 0.0
        valid = d @ np.asarray(n) > 1e-6  # (nphi, nth)
        for it in range(nth):
            v = valid[:, it]
            if v.all() or not v.any():
                continue
            vi = np.where(v)[0]
            for ip in np.where(~v)[0]:
                # circular nearest valid phi
                dist = np.minimum(np.abs(vi - ip), nphi - np.abs(vi - ip))
                j = vi[np.argmin(dist)]
                d2d[..., ip, it, s, :] = d2d[..., j, it, s, :]
                d2f[..., ip, it, s, :] = d2f[..., j, it, s, :]
        # fully-invalid theta rows (grazing): copy nearest valid theta
        row_ok = valid.any(axis=0)
        if row_ok.any() and not row_ok.all():
            ok = np.where(row_ok)[0]
            for it in np.where(~row_ok)[0]:
                j = ok[np.argmin(np.abs(ok - it))]
                d2d[..., :, it, s, :] = d2d[..., :, j, s, :]
                d2f[..., :, it, s, :] = d2f[..., :, j, s, :]


def create_wedge_lut(
    daxes: WedgeAxes, faxes: WedgeAxes, n_photons: int = 5000,
    seed: int = 0, verbose: bool = False, scheme: str = "5_8",
    apex=None, chunk: int = 2048, max_iter: int = 3000,
    ckpt_dir=None,
) -> WedgeLUT:
    """apex=(cx, cy) traces a SHAPE-EXACT table for the general
    triangle A=(0,0) B=(1,0) C=(cx, cy) instead of the canonical right
    triangle — used to quantify (and, per mesh, eliminate) the
    canonical-triangle approximation (`tools/wedge_shape_error.py`).
    The isoceles mirror symmetrization only applies to the canonical
    shape.

    Production-density runs on the chip use chunk=256 / max_iter=500
    (shorter kernels keep the TPU worker watchdog happy; leftover
    renormalization in the tracer absorbs the iteration cap) and a
    ckpt_dir so interrupted runs resume per chunk."""
    cfg = _SCHEME_DIR[scheme]
    nsrc, ndir = len(cfg["srcs"]), cfg["ndir"]
    nd = tuple(len(a) for a in (daxes.tau, daxes.w0, daxes.aspect, daxes.g,
                                daxes.phi, daxes.theta))
    nf = tuple(len(a) for a in (faxes.tau, faxes.w0, faxes.aspect, faxes.g))
    d2d = np.zeros(nd + (nsrc, ndir), np.float32)
    d2f = np.zeros(nd + (nsrc, NDIFF), np.float32)
    f2f = np.zeros(nf + (NDIFF, NDIFF), np.float32)
    if int(np.prod(nd[:6])) < 50_000:
        ckpt_dir = None  # test/mockup grids regenerate in seconds
    if ckpt_dir is not None:
        os.makedirs(ckpt_dir, exist_ok=True)

    def _ckpt(name):
        return None if ckpt_dir is None else os.path.join(ckpt_dir, name + ".npz")

    for i, src in enumerate(cfg["srcs"]):
        if verbose:
            print(f"wedge LUT dir src {src}/{nsrc}", flush=True)
        T, S = _trace_grid(daxes, src, True, n_photons, seed + src, scheme,
                           apex=apex, chunk=chunk, max_iter=max_iter,
                           ckpt_path=_ckpt(f"dir_{src}"))
        d2d[..., i, :] = T
        d2f[..., i, :] = S
    for src in range(NDIFF):
        if verbose:
            print(f"wedge LUT diff src {src}/{NDIFF}", flush=True)
        _, S = _trace_grid(faxes, src, False, n_photons, seed + 100 + src,
                           scheme, apex=apex, chunk=chunk, max_iter=max_iter,
                           ckpt_path=_ckpt(f"diff_{src}"))
        f2f[..., src, :] = S

    _sanitize_dir_tables(daxes, d2d, d2f, scheme, apex=apex)

    if apex is None:
        # exact mirror symmetry of the right isoceles triangle about the
        # axis through B: swaps AB <-> BC, fixes top/bot/CA.  Averaging
        # the diffuse table with its mirror image halves the MC variance
        # and makes the symmetry exact (cube analogue: `optprop/lut.py:
        # symmetrize_tables`).
        perm = np.array([0, 3, 4, 1, 2, 5, 6, 7])
        f2f[:] = 0.5 * (f2f + f2f[..., perm, :][..., :, perm])

    # phi is periodic: force the 360-degree column equal to 0 degrees
    if np.isclose(daxes.phi[0], 0.0) and np.isclose(daxes.phi[-1], 360.0):
        d2d[..., -1, :, :, :] = d2d[..., 0, :, :, :]
        d2f[..., -1, :, :, :] = d2f[..., 0, :, :, :]

    for name, t in (("dir2dir", d2d), ("dir2diff", d2f), ("diff2diff", f2f)):
        assert np.isfinite(t).all(), f"wedge LUT {name} has non-finite entries"
        rows = t.sum(-1)
        assert (rows <= 1.0 + 1e-3).all(), f"wedge LUT {name} row sums exceed 1"
    return WedgeLUT(daxes, faxes, d2d, d2f, f2f, scheme,
                    tuple(apex) if apex is not None else (1.0, 1.0))


def load_or_create_wedge_lut(
    daxes: Optional[WedgeAxes] = None, faxes: Optional[WedgeAxes] = None,
    n_photons: int = 5000, basename: Optional[str] = None, verbose: bool = False,
    scheme: str = "5_8", apex=None, chunk: Optional[int] = None,
    max_iter: Optional[int] = None,
) -> WedgeLUT:
    """chunk/max_iter default from env WEDGE_CHUNK / WEDGE_MAX_ITER so
    production chip jobs can shorten the tracing kernels (watchdog) —
    the cache key deliberately excludes them (same physics up to the
    documented leftover renormalization)."""
    daxes = daxes or test_axes()
    faxes = faxes or WedgeAxes(daxes.tau, daxes.w0, daxes.aspect, daxes.g)
    if chunk is None:
        chunk = int(os.environ.get("WEDGE_CHUNK", "2048"))
    if max_iter is None:
        max_iter = int(os.environ.get("WEDGE_MAX_ITER", "3000"))
    root = basename or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "data", "luts",
    )
    apex_t = tuple(float(v) for v in apex) if apex is not None else (1.0, 1.0)
    apex_key = "" if apex is None else f"{apex_t[0]:.4f},{apex_t[1]:.4f}"
    key = hashlib.sha256(
        (daxes.hash() + faxes.hash() + str(n_photons) + apex_key).encode()
    ).hexdigest()[:16]
    path = os.path.join(root, f"WEDGE_LUT_{scheme}_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return WedgeLUT(daxes, faxes, z["dir2dir"], z["dir2diff"], z["diff2diff"],
                        scheme, apex_t)
    os.makedirs(root, exist_ok=True)
    lut = create_wedge_lut(daxes, faxes, n_photons, verbose=verbose, scheme=scheme,
                           apex=apex, chunk=chunk, max_iter=max_iter,
                           ckpt_dir=os.path.join(root, f"ckpt_WEDGE_{scheme}_{key}"))
    np.savez_compressed(path, dir2dir=lut.dir2dir, dir2diff=lut.dir2diff,
                        diff2diff=lut.diff2diff)
    return lut


def wedge_lut_for_mesh(mesh, daxes=None, faxes=None, n_photons: int = 5000,
                       basename=None, verbose: bool = False) -> WedgeLUT:
    """Shape-AWARE wedge table for an unstructured mesh: traced at the
    mesh's mean cell shape (area-weighted mean apex in the per-cell
    canonical frame) instead of the canonical right triangle.

    This replaces the reference's triangle-shape LUT axes
    (`src/optprop_base.F90:230-243`) for the practical ICON case where
    cell shapes cluster tightly around one (near-equilateral) shape:
    residual per-cell shape deviation is handled by the param-phi
    azimuth map relative to THIS table's shape (`LUT_param_phi`
    analogue).  Flux-level accuracy quantified in
    `tools/wedge_shape_error.py` / PARITY.md."""
    v = mesh.verts[mesh.tris]  # (nc, 3, 2)
    ab = v[:, 1] - v[:, 0]
    ac = v[:, 2] - v[:, 0]
    L = np.maximum(np.linalg.norm(ab, axis=-1), 1e-30)
    abh = ab / L[:, None]
    cx = (ac * abh).sum(-1) / L
    cy = np.abs(ac[:, 1] * abh[:, 0] - ac[:, 0] * abh[:, 1]) / L
    w = mesh.area / mesh.area.sum()
    apex = (float((cx * w).sum()), float(np.maximum((cy * w).sum(), 1e-3)))
    return load_or_create_wedge_lut(daxes, faxes, n_photons, basename,
                                    verbose, apex=apex)


class WedgeOptProp:
    """Batched coefficient lookups on the wedge tables."""

    def __init__(self, lut: WedgeLUT):
        self.lut = lut
        self._d2d = jnp.asarray(lut.dir2dir, ireals)
        self._d2f = jnp.asarray(lut.dir2diff, ireals)
        self._f2f = jnp.asarray(lut.diff2diff, ireals)

    def _fracs(self, axes: WedgeAxes, tauz, w0, g, aspect):
        return [
            fractional_index(jnp.asarray(axes.tau, ireals), tauz),
            fractional_index(jnp.asarray(axes.w0, ireals), w0),
            fractional_index(jnp.asarray(axes.aspect, ireals), aspect),
            fractional_index(jnp.asarray(axes.g, ireals), g),
        ]

    def diff_coeffs(self, tauz, w0, g, aspect):
        """(..., NDIFF src, NDIFF dst)."""
        fr = self._fracs(self.lut.faxes, tauz, w0, g, aspect)
        return interp_multilinear(self._f2f, fr)

    def dir_coeffs(self, tauz, w0, g, aspect, phi_deg, theta_deg):
        """(..., N_DIR_SRC, NDIR) and (..., N_DIR_SRC, NDIFF).

        phi wraps periodically; pass per-cell phi (the T1 orientation
        adds 180 upstream)."""
        ax = self.lut.daxes
        phi = jnp.mod(jnp.asarray(phi_deg, ireals), 360.0)
        fr = self._fracs(ax, tauz, w0, g, aspect) + [
            fractional_index(jnp.asarray(ax.phi, ireals), phi),
            fractional_index(jnp.asarray(ax.theta, ireals), jnp.asarray(theta_deg, ireals)),
        ]
        # broadcast the scalar angle fracs over the field shape
        shp = jnp.broadcast_shapes(*[f.shape for f in fr])
        fr = [jnp.broadcast_to(f, shp) for f in fr]
        return interp_multilinear(self._d2d, fr), interp_multilinear(self._d2f, fr)


def mesh_cell_shapes(mesh):
    """Per-cell apex (cx, cy) in the cell-local canonical frame (side 0
    = AB on +x, unit AB)."""
    v = mesh.verts[mesh.tris]  # (nc, 3, 2)
    ab = v[:, 1] - v[:, 0]
    ac = v[:, 2] - v[:, 0]
    L = np.maximum(np.linalg.norm(ab, axis=-1), 1e-30)
    abh = ab / L[:, None]
    cx = (ac * abh).sum(-1) / L
    cy = np.abs(ac[:, 1] * abh[:, 0] - ac[:, 0] * abh[:, 1]) / L
    return cx, np.maximum(cy, 1e-6)


def wedge_optprop_for_mesh(mesh, daxes=None, faxes=None, n_photons: int = 5000,
                           basename=None, verbose: bool = False,
                           shape_tol: float = 0.05):
    """Shape coverage for an arbitrary triangle mesh (the reference's
    triangle-shape LUT axes, `src/optprop_base.F90:230-283` /
    `src/LUT_param_phi.F90:20-47`, realized as per-cell TABLE BLENDING
    instead of extra gather axes — each traced table is shape-exact at
    its sample apex, and a cell interpolates bilinearly between the
    samples that bracket its own shape).

    Near-uniform meshes (apex spread <= shape_tol in both coordinates)
    get ONE mean-shape table (`wedge_lut_for_mesh` economy); wider
    distributions get the 2/4 bounding-box corner tables and a
    `WedgeOptPropShaped` that blends per cell.  Flux-level accuracy on
    a strongly distorted mesh is measured in
    `tools/wedge_shape_error.py --flux-hetero` (PARITY.md)."""
    cx, cy = mesh_cell_shapes(mesh)
    w = mesh.area / mesh.area.sum()
    lo = (float(cx.min()), float(cy.min()))
    hi = (float(cx.max()), float(cy.max()))
    span = (hi[0] - lo[0], hi[1] - lo[1])
    if max(span) <= shape_tol:
        return WedgeOptProp(wedge_lut_for_mesh(
            mesh, daxes, faxes, n_photons, basename, verbose))
    xs = [lo[0], hi[0]] if span[0] > shape_tol else [float((cx * w).sum())]
    ys = [lo[1], hi[1]] if span[1] > shape_tol else [float((cy * w).sum())]
    luts = [
        load_or_create_wedge_lut(daxes, faxes, n_photons, basename, verbose,
                                 apex=(ax, ay))
        for ay in ys for ax in xs
    ]
    opp = WedgeOptPropShaped(luts)
    opp.bind_cells(cx, cy)
    return opp


class WedgeOptPropShaped:
    """Per-cell shape interpolation over K shape-sample wedge tables.

    Each sample table is traced shape-exact at one apex; `bind_cells`
    computes bilinear blend weights in (cx, cy) apex space (clipped to
    the sample hull) per mesh cell.  Lookups evaluate every sample
    table and blend — K x the single-table cost, covering
    shape-heterogeneous meshes that a single canonical/mean-shape table
    handles with ~10-16% flux error (PARITY.md).  The per-table
    param-phi azimuth map is applied INTERNALLY (each table maps the
    raw cell azimuth onto its own sample shape), so solvers pass the
    unmapped cell azimuth."""

    def __init__(self, luts):
        assert luts, "need at least one shape-sample table"
        self.luts = list(luts)
        self.tabs = [WedgeOptProp(l) for l in self.luts]
        self.apexes = np.asarray([tuple(l.apex) for l in self.luts], np.float64)
        self.lut = self.luts[0]  # scheme/axes accessor compatibility
        self._w = None
        self._cells = None

    def bind_cells(self, cx, cy) -> None:
        xs = np.unique(self.apexes[:, 0])
        ys = np.unique(self.apexes[:, 1])
        u = (np.clip((cx - xs[0]) / (xs[-1] - xs[0]), 0.0, 1.0)
             if len(xs) > 1 else np.zeros_like(cx))
        v = (np.clip((cy - ys[0]) / (ys[-1] - ys[0]), 0.0, 1.0)
             if len(ys) > 1 else np.zeros_like(cy))
        ws = []
        for l in self.luts:
            ax, ay = l.apex
            wx = np.where(np.isclose(ax, xs[0]), 1.0 - u, u) if len(xs) > 1 \
                else np.ones_like(u)
            wy = np.where(np.isclose(ay, ys[0]), 1.0 - v, v) if len(ys) > 1 \
                else np.ones_like(v)
            ws.append(wx * wy)
        self._w = jnp.asarray(np.stack(ws), ireals)  # (K, nc)
        self._cells = (jnp.asarray(cx, ireals), jnp.asarray(cy, ireals))

    def _blend(self, parts):
        out = None
        for k, p in enumerate(parts):
            w = self._w[k].reshape((1,) * (p.ndim - 3) + (-1, 1, 1))
            out = p * w if out is None else out + p * w
        return out

    def diff_coeffs(self, tauz, w0, g, aspect):
        assert self._w is not None, "call bind_cells(cx, cy) first"
        return self._blend([t.diff_coeffs(tauz, w0, g, aspect)
                            for t in self.tabs])

    def dir_coeffs(self, tauz, w0, g, aspect, phi_deg, theta_deg):
        """phi_deg: RAW cell azimuth (phi + phi_rot), unmapped — each
        sample table applies its own param-phi azimuth map."""
        from tenstream_tpu.plexrt.param_phi import canonical_azimuth_map

        assert self._w is not None, "call bind_cells(cx, cy) first"
        cx, cy = self._cells
        dd_parts, df_parts = [], []
        for t in self.tabs:
            ax, ay = t.lut.apex
            phi_k = canonical_azimuth_map(
                jnp.asarray(phi_deg, ireals), cx[None, :], cy[None, :],
                float(ax), float(ay))
            dd, df = t.dir_coeffs(tauz, w0, g, aspect, phi_k, theta_deg)
            dd_parts.append(dd)
            df_parts.append(df)
        return self._blend(dd_parts), self._blend(df_parts)
