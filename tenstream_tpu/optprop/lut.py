"""Lookup tables of BoxMC transfer coefficients.

Parity: reference `src/optprop_LUT.F90` (load/create/interp tables, the
per-scheme parameter spaces in `src/optprop_base.F90:147-330` and axis
presets in `src/optprop_parameters.F90:53-245`) and the offline generator
`src/createLUT.F90`.

Differences by design:
  - Storage is a single .npz per (scheme, kind) instead of netCDF+mmap4;
    tables are small enough to live on-device.
  - Generation runs the vectorized JAX BoxMC on TPU (vmapped over table
    entries) instead of an MPI master/worker farm
    (`src/optprop_LUT.F90:591-893`); partial results are checkpointed to
    disk between chunks so interrupted generation resumes.
  - Table layout is (n_tau, n_w0, n_aspect, n_g[, n_phi, n_theta],
    src, dst) float32.

Direct tables carry (phi, theta) axes; at solve time the per-solve sun
angle slices/blends them down to 4-D before the per-cell interpolation
(the reference effectively does the same — phi/theta are fixed per solve).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.boxmc.tracer import run_boxmc
from tenstream_tpu.boxmc.schemes import get_box_scheme

# Axis presets, reduced-but-log-spaced versions of the reference presets
# (`src/optprop_parameters.F90`: preset_tau31 spans 1e-10..100,
# preset_w020 crowds toward 1, preset_aspect23 spans 0.02..7.45,
# preset_g6 spans 0..0.85).
PRESET_TAU15 = np.array(
    [1e-10, 1e-5, 1e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 0.3, 0.7, 1.5, 3.0, 7.0, 20.0, 100.0],
    np.float32,
)
PRESET_W010 = np.array(
    [0.0, 0.3, 0.55, 0.7, 0.8, 0.88, 0.93, 0.97, 0.99, 0.99999], np.float32
)
PRESET_ASPECT13 = np.array(
    [0.02, 0.042, 0.075, 0.133, 0.237, 0.422, 0.75, 1.0, 1.25, 1.953, 3.052, 4.768, 7.451],
    np.float32,
)
PRESET_G4 = np.array([0.0, 0.25, 0.5, 0.85], np.float32)
PRESET_PHI7 = np.linspace(0.0, 90.0, 7).astype(np.float32)
PRESET_THETA10 = np.linspace(0.0, 90.0, 10).astype(np.float32)


@dataclass(frozen=True)
class LUTAxes:
    tau: np.ndarray
    w0: np.ndarray
    aspect: np.ndarray
    g: np.ndarray
    phi: Optional[np.ndarray] = None  # direct tables only
    theta: Optional[np.ndarray] = None

    def cache_key(self, scheme: str, kind: str, n_photons: int) -> str:
        h = hashlib.sha1()
        payload = {
            "version": _CACHE_VERSION,
            "scheme": scheme,
            "kind": kind,
            "n_photons": n_photons,
            "axes": [
                np.asarray(a).tolist()
                for a in (self.tau, self.w0, self.aspect, self.g)
            ]
            + ([np.asarray(self.phi).tolist(), np.asarray(self.theta).tolist()] if self.phi is not None else []),
        }
        h.update(json.dumps(payload).encode())
        return h.hexdigest()[:16]


_CACHE_VERSION = 2  # bump when table generation/symmetrization changes


# ---------------------------------------------------------------------------
# Symmetrization: average MC tables over the cube's symmetry group.
# Physically exact for dx == dy cells (which the reference asserts,
# `src/pprts.F90:459`) and reduces MC variance by the group order; it also
# makes the mirror/rotation solver symmetries exact (tested by
# test_mirror_symmetry_exact / test_azimuth_symmetry).
# Diffuse-dof permutations per scheme: x-mirror, y-mirror, z-mirror,
# x<->y exchange (the latter pairs with the LUT's phi -> 90-phi mirror for
# the direct tables).
# ---------------------------------------------------------------------------

# mirror permutations are generated structurally per scheme
# (`StreamScheme.diff_mirror_perms` / `dir_mirror_perm_xy`)


def _perm_group(perms):
    """Closure of the given permutations under composition."""
    import itertools

    n = len(perms[0])
    ident = tuple(range(n))
    group = {ident}
    frontier = [tuple(p) for p in perms]
    while frontier:
        new = []
        for p in frontier:
            if p in group:
                continue
            group.add(p)
            for q in list(group):
                for a, b in ((p, q), (q, p)):
                    c = tuple(a[i] for i in b)
                    if c not in group:
                        new.append(c)
        frontier = new
    return [np.asarray(p) for p in sorted(group)]


def symmetrize_tables(scheme: str, dir2dir, dir2diff, diff2diff, phi_grid):
    """Average the tables over the cube symmetry group (see above)."""
    from tenstream_tpu.streams import SCHEMES

    if scheme not in SCHEMES:
        return dir2dir, dir2diff, diff2diff
    sch = SCHEMES[scheme]
    p = sch.diff_mirror_perms()

    # diffuse: full group from x/y/z mirrors and the x<->y exchange
    group = _perm_group([p["mx"], p["my"], p["mz"], p["mxy"]])
    acc = np.zeros_like(diff2diff)
    for g in group:
        acc += diff2diff[..., g, :][..., :, g]
    diff2diff = acc / len(group)

    # direct tables: phi -> 90 - phi pairs with the x<->y exchange,
    # valid when the phi axis is mirror-symmetric about 45 deg.
    if np.allclose(phi_grid + phi_grid[::-1], 90.0, atol=1e-3):
        pd = np.asarray(sch.dir_mirror_perm_xy())
        pf = np.asarray(p["mxy"])
        dd_m = dir2dir[:, :, :, :, ::-1][..., pd, :][..., :, pd]
        df_m = dir2diff[:, :, :, :, ::-1][..., pd, :][..., :, pf]
        dir2dir = 0.5 * (dir2dir + dd_m)
        dir2diff = 0.5 * (dir2diff + df_m)
        # additionally, the canonical octant keeps a y-mirror when phi=90
        # and an x-mirror when phi=0; skipped (single-slice effect only).
    return dir2dir, dir2diff, diff2diff


def default_axes(direct: bool) -> LUTAxes:
    if direct:
        return LUTAxes(PRESET_TAU15, PRESET_W010, PRESET_ASPECT13, PRESET_G4, PRESET_PHI7, PRESET_THETA10)
    return LUTAxes(PRESET_TAU15, PRESET_W010, PRESET_ASPECT13, PRESET_G4)


def mockup_axes(direct: bool) -> LUTAxes:
    """Tiny synthetic parameter space for tests.

    Parity: `-skip_load_LUT` / `LUT_mockup` substitute small spaces so
    solver logic is testable without the real tables
    (`src/optprop_base.F90:453-486`).
    """
    tau = np.array([1e-10, 0.03, 0.3, 2.0, 20.0], np.float32)
    w0 = np.array([0.0, 0.5, 0.9, 0.99999], np.float32)
    aspect = np.array([0.1, 0.5, 1.0, 2.0], np.float32)
    g = np.array([0.0, 0.5], np.float32)
    if direct:
        phi = np.array([0.0, 45.0, 90.0], np.float32)
        theta = np.array([0.0, 40.0, 80.0], np.float32)
        return LUTAxes(tau, w0, aspect, g, phi, theta)
    return LUTAxes(tau, w0, aspect, g)


@dataclass
class LUT:
    """One table pair for a scheme: direct (T & S) and diffuse (S)."""

    scheme: str
    dir_axes: LUTAxes
    diff_axes: LUTAxes
    # dir2dir: (ntau, nw0, nasp, ng, nphi, ntheta, ndir, ndir)  [src, dst]
    dir2dir: np.ndarray
    # dir2diff: (..., ndir, ndiff)
    dir2diff: np.ndarray
    # diff2diff: (ntau, nw0, nasp, ng, ndiff, ndiff)
    diff2diff: np.ndarray

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez_compressed(
            path,
            scheme=self.scheme,
            dir2dir=self.dir2dir,
            dir2diff=self.dir2diff,
            diff2diff=self.diff2diff,
            **{f"dir_{k}": np.asarray(v) for k, v in dataclasses.asdict(self.dir_axes).items() if v is not None},
            **{f"diff_{k}": np.asarray(v) for k, v in dataclasses.asdict(self.diff_axes).items() if v is not None},
        )

    @staticmethod
    def load(path: str) -> "LUT":
        z = np.load(path, allow_pickle=False)
        dir_axes = LUTAxes(
            z["dir_tau"], z["dir_w0"], z["dir_aspect"], z["dir_g"], z["dir_phi"], z["dir_theta"]
        )
        diff_axes = LUTAxes(z["diff_tau"], z["diff_w0"], z["diff_aspect"], z["diff_g"])
        return LUT(
            scheme=str(z["scheme"]),
            dir_axes=dir_axes,
            diff_axes=diff_axes,
            dir2dir=z["dir2dir"],
            dir2diff=z["dir2diff"],
            diff2diff=z["diff2diff"],
        )


def _entry_grid(axes: LUTAxes, direct: bool) -> np.ndarray:
    dims = [axes.tau, axes.w0, axes.aspect, axes.g]
    if direct:
        dims += [axes.phi, axes.theta]
    mesh = np.meshgrid(*dims, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1).astype(np.float32)  # (N, 4 or 6)


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _trace_entries(
    scheme: str,
    entries: np.ndarray,
    src: int,
    ldir: bool,
    n_photons: int,
    key,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run BoxMC for a list of parameter entries.

    On accelerators the Pallas VMEM-resident kernel traces entries
    (photon count fixed at its batch size); on CPU the vmapped jnp
    tracer runs (the Pallas path also works under
    `pltpu.force_tpu_interpret_mode`, used by tests).
    """
    box = get_box_scheme(scheme)
    direct_cols = entries.shape[1] == 6
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if ldir and box.dir_classify is not None:
        use_pallas = False  # positional classification: jnp tracer only (for now)
    if box.diff_face_class is not None:
        use_pallas = False  # angular-bin classification: jnp tracer only (for now)

    if use_pallas:
        from tenstream_tpu.boxmc.pallas_tracer import run_boxmc_pallas

        params = np.zeros((entries.shape[0], 8), np.float32)
        params[:, : entries.shape[1]] = entries
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        Ts, Ss = [], []
        for lo in range(0, entries.shape[0], chunk):
            T, S = run_boxmc_pallas(
                jnp.asarray(params[lo : lo + chunk]), scheme, src, ldir,
                seed=seed + lo,
            )
            Ts.append(np.asarray(T))
            Ss.append(np.asarray(S))
        return np.concatenate(Ts, 0), np.concatenate(Ss, 0)

    def one(params, k):
        # entry grid order is (tau, w0, aspect, g[, phi, theta])
        tauz, w0, aspect, g = params[0], params[1], params[2], params[3]
        phi = params[4] if direct_cols else 0.0
        theta = params[5] if direct_cols else 0.0
        return run_boxmc(
            k, scheme, src, ldir, tauz, w0, g, aspect, phi, theta, n_photons=n_photons
        )

    fn = jax.jit(jax.vmap(one))
    Ts, Ss = [], []
    n = entries.shape[0]
    for lo in range(0, n, chunk):
        part = jnp.asarray(entries[lo : lo + chunk])
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(lo, lo + part.shape[0]))
        T, S = fn(part, keys)
        Ts.append(np.asarray(T))
        Ss.append(np.asarray(S))
    return np.concatenate(Ts, 0), np.concatenate(Ss, 0)


def create_lut(
    scheme: str,
    dir_axes: Optional[LUTAxes] = None,
    diff_axes: Optional[LUTAxes] = None,
    n_photons: int = 10000,
    key=None,
    verbose: bool = False,
    checkpoint_path: Optional[str] = None,
) -> LUT:
    """Generate all tables for a scheme (reference `createLUT`,
    `src/optprop_LUT.F90:591`).  With `checkpoint_path`, per-source
    partial tables are written after each source so interrupted runs
    resume (parity with LUT_dump_interval checkpointing :625-796)."""
    box = get_box_scheme(scheme)
    dir_axes = dir_axes or default_axes(True)
    diff_axes = diff_axes or default_axes(False)
    key = key if key is not None else jax.random.PRNGKey(12345)

    dshape = tuple(len(a) for a in (dir_axes.tau, dir_axes.w0, dir_axes.aspect, dir_axes.g, dir_axes.phi, dir_axes.theta))
    fshape = tuple(len(a) for a in (diff_axes.tau, diff_axes.w0, diff_axes.aspect, diff_axes.g))

    dir_entries = _entry_grid(dir_axes, True)
    diff_entries = _entry_grid(diff_axes, False)

    dir2dir = np.zeros(dshape + (box.ndir, box.ndir), np.float32)
    dir2diff = np.zeros(dshape + (box.ndir, box.ndiff), np.float32)
    diff2diff = np.zeros(fshape + (box.ndiff, box.ndiff), np.float32)

    def _ckpt():
        if checkpoint_path:
            os.makedirs(os.path.dirname(os.path.abspath(checkpoint_path)), exist_ok=True)
            np.savez_compressed(checkpoint_path, dir2dir=dir2dir, dir2diff=dir2diff, diff2diff=diff2diff)

    ck = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if ck["dir2dir"].shape == dir2dir.shape:
            dir2dir, dir2diff, diff2diff = ck["dir2dir"].copy(), ck["dir2diff"].copy(), ck["diff2diff"].copy()

    def _validate(T, S, what):
        if not (np.isfinite(T).all() and np.isfinite(S).all()):
            raise FloatingPointError(f"non-finite BoxMC tallies in {what}")
        worst = (T.sum(-1) + S.sum(-1)).max()
        if worst > 1.0 + 1e-3:
            raise FloatingPointError(f"energy creation in {what}: max row sum {worst}")

    for src in range(box.ndir):
        if dir2dir[..., src, :].sum() > 0:
            continue  # resumed from checkpoint
        T, S = _trace_entries(scheme, dir_entries, src, True, n_photons, jax.random.fold_in(key, src))
        _validate(T, S, f"dir src {src}")
        dir2dir[..., src, :] = T.reshape(dshape + (box.ndir,))
        dir2diff[..., src, :] = S.reshape(dshape + (box.ndiff,))
        if verbose:
            print(f"[lut:{scheme}] direct src {src + 1}/{box.ndir} done", flush=True)
        _ckpt()

    for src in range(box.ndiff):
        if diff2diff[..., src, :].sum() > 0:
            continue
        T, S = _trace_entries(scheme, diff_entries, src, False, n_photons, jax.random.fold_in(key, 100 + src))
        _validate(T, S, f"diff src {src}")
        diff2diff[..., src, :] = S.reshape(fshape + (box.ndiff,))
        if verbose:
            print(f"[lut:{scheme}] diffuse src {src + 1}/{box.ndiff} done", flush=True)
        _ckpt()

    dir2dir, dir2diff, diff2diff = symmetrize_tables(
        scheme, dir2dir, dir2diff, diff2diff, np.asarray(dir_axes.phi)
    )
    return LUT(scheme, dir_axes, diff_axes, dir2dir, dir2diff, diff2diff)


def lut_basename() -> str:
    return os.environ.get(
        "TENSTREAM_TPU_LUT_DIR", os.path.join(os.path.dirname(__file__), "..", "..", "data", "luts")
    )


def load_or_create_lut(
    scheme: str,
    dir_axes: Optional[LUTAxes] = None,
    diff_axes: Optional[LUTAxes] = None,
    n_photons: int = 10000,
    basename: Optional[str] = None,
    verbose: bool = False,
) -> LUT:
    """Disk-cached table access (reference loads prebuilt tables from
    `lut_basename`, `src/optprop_parameters.F90:38`)."""
    dir_axes = dir_axes or default_axes(True)
    diff_axes = diff_axes or default_axes(False)
    base = basename or lut_basename()
    tag = dir_axes.cache_key(scheme, "dir", n_photons)[:8] + diff_axes.cache_key(scheme, "diff", n_photons)[:8]
    path = os.path.abspath(os.path.join(base, f"LUT_{scheme}_{tag}.npz"))
    if os.path.exists(path):
        return LUT.load(path)
    lut = create_lut(
        scheme, dir_axes, diff_axes, n_photons, verbose=verbose,
        checkpoint_path=path + ".partial.npz",
    )
    lut.save(path)
    try:
        os.remove(path + ".partial.npz")
    except OSError:
        pass
    return lut
