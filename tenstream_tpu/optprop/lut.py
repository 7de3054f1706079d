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


# Reference production presets (`src/optprop_parameters.F90`):
# preset_tau31 (:144), preset_w020 (:188), preset_aspect23 (:106),
# preset_g6 (:243); phi/theta 19 points over [0, 90]
# (`src/optprop_base.F90:230-243`, LUT_3_10 entry).
PRESET_TAU31 = np.array(
    [1e-10, 3.62266272998e-07, 7.04565803675e-06, 4.47545500233e-05,
     0.000172126759821, 0.000495994753047, 0.00119161313679,
     0.00251026980343, 0.00480799264297, 0.00856221891924,
     0.0143961482731, 0.0231530284254, 0.0358868239775,
     0.0541358315379, 0.079959118223, 0.11623968405, 0.167882053841,
     0.246414427244, 0.350199325489, 0.502459974196, 0.759082408765,
     1.08083180518, 1.5415157991, 2.19832932733, 3.04549626819,
     4.27145477454, 6.16953841432, 9.43719309835, 15.7335501106,
     29.5819342206, 100.0], np.float32)
PRESET_TAU20 = np.array(
    [1e-10, 2.33773213401e-06, 5.40185638224e-05, 0.000365962943669,
     0.00145415861897, 0.00431514105527, 0.0105306225135,
     0.0225104907999, 0.044534085216, 0.0835690735283,
     0.152160041198, 0.271322429414, 0.492503225042,
     0.91860742252, 1.60959133986, 2.79337830498, 4.89077663742,
     9.35922562367, 21.643468069, 100.0], np.float32)
PRESET_W020 = np.array(
    [0.0, 0.152960717624, 0.295085090042, 0.416951893959, 0.521358613652,
     0.610087211908, 0.684967634054, 0.747886390181, 0.800286677013,
     0.84336972609, 0.878674797098, 0.906377786525, 0.928097831502,
     0.943463164595, 0.954135786554, 0.963824066888, 0.972632134967,
     0.981529289348, 0.990759644674, 0.99999], np.float32)
PRESET_ASPECT23 = np.array(
    [0.02, 0.032, 0.042, 0.056, 0.075, 0.1, 0.133, 0.178, 0.237,
     0.316, 0.422, 0.562, 0.75, 1.0, 1.25, 1.562, 1.953, 2.441,
     3.052, 3.815, 4.768, 5.96, 7.451], np.float32)
PRESET_G6 = np.array([0.0, 0.2424, 0.4137, 0.5717, 0.7144, 0.85], np.float32)
PRESET_PHI19 = np.linspace(0.0, 90.0, 19).astype(np.float32)
PRESET_THETA19 = np.linspace(0.0, 90.0, 19).astype(np.float32)


def production_axes(direct: bool) -> LUTAxes:
    """Production parameter space.

    Diffuse: the FULL reference density (tau31 x w020 x aspect23 x g6,
    `src/optprop_base.F90:238-243`).  Direct: the same tau/w0/aspect/g
    presets as the reference's ANN space with phi7 x theta10 angle axes —
    a documented deviation from the reference's 19x19: the dir2dir block
    (where the sharp angular structure lives) is NOT interpolated from
    this table but computed in closed form at the exact per-solve angles
    (`boxmc.direct_transmission`), so only the smooth dir2diff scattering
    source uses the tabulated angles.
    """
    if direct:
        return LUTAxes(PRESET_TAU15, PRESET_W010, PRESET_ASPECT13, PRESET_G4,
                       PRESET_PHI7, PRESET_THETA10)
    return LUTAxes(PRESET_TAU31, PRESET_W020, PRESET_ASPECT23, PRESET_G6)


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

    def save(self, path: str, meta: Optional[dict] = None) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        extra = {}
        if meta is not None:
            extra["meta_json"] = np.asarray(json.dumps(meta))
        np.savez_compressed(
            path,
            scheme=self.scheme,
            dir2dir=self.dir2dir,
            dir2diff=self.dir2diff,
            diff2diff=self.diff2diff,
            **{f"dir_{k}": np.asarray(v) for k, v in dataclasses.asdict(self.dir_axes).items() if v is not None},
            **{f"diff_{k}": np.asarray(v) for k, v in dataclasses.asdict(self.diff_axes).items() if v is not None},
            **extra,
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
    max_iter: int = 3000,
    cost_sort: bool = True,
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
            k, scheme, src, ldir, tauz, w0, g, aspect, phi, theta,
            n_photons=n_photons, max_iter=max_iter,
        )

    fn = jax.jit(jax.vmap(one))

    # cost-sorted chunking: the vmapped while_loop runs a chunk until
    # its SLOWEST entry's photons die, so one thick-conservative LUT
    # corner (tau ~ 100, w0 -> 1: random-walk escape needs ~tau^2
    # scatter events) drags a whole mixed chunk to max_iter.  Grouping
    # entries by expected walk length lets the cheap majority exit in
    # tens of iterations.
    n = entries.shape[0]
    if cost_sort and n > 64:
        cost = entries[:, 0] * entries[:, 1]  # tau * w0
        order = np.argsort(cost, kind="stable")
    else:
        order = np.arange(n)
    ordered = entries[order]

    # per-chunk walk cap: chunks dominated by the thick-conservative
    # corner (median tau*w0 > 10: random-walk escape needs ~tau^2 steps)
    # get a reduced cap — their tallies are dominated by early escapes
    # and the truncation redistribution preserves the observed exit
    # distribution; everything else keeps the full budget (cheap chunks
    # exit when their photons die).
    def one_capped(params, k):
        tauz, w0, aspect, g = params[0], params[1], params[2], params[3]
        phi = params[4] if direct_cols else 0.0
        theta = params[5] if direct_cols else 0.0
        return run_boxmc(
            k, scheme, src, ldir, tauz, w0, g, aspect, phi, theta,
            n_photons=n_photons, max_iter=min(600, max_iter),
        )

    fn_capped = jax.jit(jax.vmap(one_capped))

    # Shape discipline: adaptive rounds shrink the active set every
    # round, and each distinct chunk shape is a fresh jit compile (~19
    # min through the remote compile service on this TPU).  Pad the
    # trailing partial chunk: to the full chunk size on accelerators
    # (one shape, ever), to the next power of two on CPU (compiles are
    # cheap there and small active sets shouldn't trace 4096 rows).
    pad_full = jax.default_backend() != "cpu"
    Ts, Ss = [], []
    for lo in range(0, n, chunk):
        part_np = ordered[lo : lo + chunk]
        nvalid = part_np.shape[0]
        if nvalid < chunk:
            target = chunk if pad_full else max(64, 1 << (nvalid - 1).bit_length())
            if target > nvalid:
                part_np = np.concatenate(
                    [part_np, np.repeat(part_np[-1:], target - nvalid, axis=0)], axis=0
                )
        part = jnp.asarray(part_np)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(lo, lo + part.shape[0]))
        thick = float(np.median(part_np[:, 0] * part_np[:, 1])) > 10.0
        T, S = (fn_capped if thick else fn)(part, keys)
        Ts.append(np.asarray(T)[:nvalid])
        Ss.append(np.asarray(S)[:nvalid])
    T = np.concatenate(Ts, 0)
    S = np.concatenate(Ss, 0)
    inv = np.empty_like(order)
    inv[order] = np.arange(n)
    return T[inv], S[inv]


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


def _trace_adaptive(
    scheme: str,
    entries: np.ndarray,
    src: int,
    ldir: bool,
    key,
    *,
    stddev_atol: float,
    stddev_rtol: float,
    round_photons: int = 5120,
    min_rounds: int = 4,
    max_rounds: int = 64,
    chunk: int = 4096,
    use_pallas: Optional[bool] = None,
    conv_cols: Optional[slice] = None,
    checkpoint_path: Optional[str] = None,
    verbose: bool = False,
    max_iter: int = 3000,
    row_atol: float = 1e-4,
):
    """Per-entry adaptive Monte Carlo with the reference's convergence
    criterion: converged when for every coefficient the standard error of
    the mean is < atol AND (mean < max(atol, 1e-5) OR sem/mean < rtol)
    (reference `std_update`, `src/boxmc.F90:968-996`, tolerances
    `src/optprop_parameters.F90:255-259`) — PLUS a row-sum criterion the
    reference lacks: the SEM of the summed scattered energy (over
    `conv_cols`) must satisfy sem_row < max(row_atol, rtol * row_sum).

    The row criterion exists because the per-coefficient absolute atol
    silently starves optically thin entries: their coefficients sit far
    below atol, so 2 rounds "converge" them with O(100%) relative noise,
    and a scene whose 3-D layers are thin (Rayleigh regime, tau ~ 1e-3
    per layer) then reads almost pure noise from the table (measured:
    a 5% TOA-flux error against a DISORT column truth on the reference
    regression scene).  Thin entries are 1-2 step walks, so rows are
    cheap to converge RELATIVELY; `row_atol` floors the cost for rows
    whose total is itself negligible.

    Rounds of `round_photons` photons are traced per still-active entry;
    Welford statistics across rounds estimate the SEM.  `conv_cols`
    restricts the convergence check (used to ignore the T columns when
    dir2dir is replaced by the closed form).  Returns
    (T, S, rounds, sem) with T/S the across-round means.
    """
    from tenstream_tpu.boxmc.schemes import get_box_scheme

    box = get_box_scheme(scheme)
    N = entries.shape[0]
    nT = box.ndir if ldir else 0
    width = nT + box.ndiff

    mean = np.zeros((N, width), np.float64)
    m2 = np.zeros((N, width), np.float64)
    rounds = np.zeros((N,), np.int64)

    if checkpoint_path:
        # advisory lock: two processes adaptively tracing the same
        # checkpoint silently lose each other's updates (last writer
        # wins per slice) — observed when a CPU refinement pass and a
        # TPU generation pass raced diff_src0.npz
        lock = checkpoint_path + ".lock"
        os.makedirs(os.path.dirname(checkpoint_path) or ".", exist_ok=True)
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
        except FileExistsError:
            try:
                other = int(open(lock).read().strip() or 0)
                os.kill(other, 0)  # raises if dead
                raise RuntimeError(
                    f"checkpoint {checkpoint_path} is locked by live pid {other}; "
                    "refusing concurrent adaptive tracing (lost-update hazard)"
                )
            except (ProcessLookupError, ValueError, PermissionError):
                with open(lock, "w") as f:  # stale lock: take it over
                    f.write(str(os.getpid()))

    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if ck["mean"].shape == mean.shape:
            mean, m2, rounds = ck["mean"], ck["m2"], ck["rounds"]

    cols = conv_cols if conv_cols is not None else slice(None)

    def _unconverged():
        n = np.maximum(rounds, 1)[:, None].astype(np.float64)
        sem = np.sqrt(np.maximum(m2, 0.0) / n) / np.sqrt(n)
        m = mean
        relvar = np.where(m >= max(stddev_atol, 1e-5), sem / np.maximum(m, 1e-30), 0.0)
        bad = (sem[:, cols] >= stddev_atol) | (relvar[:, cols] >= stddev_rtol)
        # row-sum relative criterion (see docstring): multinomial dst
        # splits are negatively correlated, so sum-of-variances is a
        # conservative row-sem estimate
        row = m[:, cols].sum(axis=1)
        sem_row = np.sqrt((sem[:, cols] ** 2).sum(axis=1))
        # Poisson floor: with O(1) photon counts the Welford sem is
        # itself noisy (and exactly 0 for all-zero rows); the binomial
        # rate sem sqrt(p/N) bounds it from first principles
        nphot = np.maximum(rounds, 1).astype(np.float64) * round_photons
        sem_row = np.maximum(sem_row, np.sqrt(np.maximum(row, 0.0) / nphot))
        bad_row = sem_row >= np.maximum(row_atol, stddev_rtol * row)
        return bad.any(axis=1) | bad_row | (rounds < min_rounds)

    # Rounds are traced in SLICES with a Welford merge + checkpoint after
    # each one: production direct-table rounds run for hours, and a
    # round-granular checkpoint would lose everything on interruption
    # (observed: multi-hour dir rounds killed at a round boundary keep
    # zero progress).  Per-slice keys fold the slice offset into the
    # round key, so slices draw independent streams; a re-traced slice
    # after an interruption merges extra independent samples, which the
    # per-entry round counts account for.
    save_every = 16384
    try:
        _trace_adaptive_loop(
            scheme, entries, src, ldir, key, mean, m2, rounds,
            _unconverged, max_rounds, round_photons, chunk, use_pallas,
            max_iter, checkpoint_path, verbose, save_every, N,
        )
    finally:
        if checkpoint_path:
            try:
                os.remove(checkpoint_path + ".lock")
            except OSError:
                pass

    n = np.maximum(rounds, 1)[:, None].astype(np.float64)
    sem = np.sqrt(np.maximum(m2, 0.0) / n) / np.sqrt(n)
    return (
        mean[:, :nT].astype(np.float32),
        mean[:, nT:].astype(np.float32),
        rounds,
        sem.astype(np.float32),
    )


def _trace_adaptive_loop(
    scheme, entries, src, ldir, key, mean, m2, rounds, _unconverged,
    max_rounds, round_photons, chunk, use_pallas, max_iter,
    checkpoint_path, verbose, save_every, N,
):
    while True:
        active = np.nonzero(_unconverged() & (rounds < max_rounds))[0]
        if active.size == 0:
            break
        r = int(rounds[active].min())
        rkey = jax.random.fold_in(key, 7919 * r + src)
        for lo in range(0, active.size, save_every):
            sl = active[lo : lo + save_every]
            T, S = _trace_entries(
                scheme, entries[sl], src, ldir, round_photons,
                jax.random.fold_in(rkey, lo), chunk=chunk,
                use_pallas=use_pallas, max_iter=max_iter,
            )
            c = np.concatenate([T, S], axis=-1).astype(np.float64) if ldir else S.astype(np.float64)
            rounds[sl] += 1
            nr = rounds[sl, None].astype(np.float64)
            delta = c - mean[sl]
            mean[sl] += delta / nr
            m2[sl] += delta * (c - mean[sl])
            if checkpoint_path:
                os.makedirs(os.path.dirname(os.path.abspath(checkpoint_path)), exist_ok=True)
                np.savez_compressed(checkpoint_path, mean=mean, m2=m2, rounds=rounds)
            if verbose and active.size > save_every:
                print(
                    f"[lut:{scheme}] {'dir' if ldir else 'diff'} src {src} "
                    f"round {r + 1}: {min(lo + save_every, active.size)}"
                    f"/{active.size} traced", flush=True,
                )
        if verbose:
            print(
                f"[lut:{scheme}] {'dir' if ldir else 'diff'} src {src} round "
                f"{r + 1}: {active.size}/{N} entries active", flush=True,
            )


def _diff_orbits(scheme: str):
    """Orbit representatives of the diffuse sources under the cube
    symmetry group, plus for every source a group permutation mapping it
    onto its representative.  Returns (reps, assign) with
    assign[s] = (rep, perm) such that table[s, d] = table[rep, perm[d]]."""
    from tenstream_tpu.streams import SCHEMES

    sch = SCHEMES[scheme]
    p = sch.diff_mirror_perms()
    group = _perm_group([p["mx"], p["my"], p["mz"], p["mxy"]])
    assign = {}
    reps = []
    for s in range(sch.ndiff):
        found = None
        for g in group:
            if int(g[s]) in reps:
                found = (int(g[s]), g)
                break
        if found is None:
            reps.append(s)
            ident = np.arange(sch.ndiff)
            found = (s, ident)
        assign[s] = found
    return reps, assign


def create_production_lut(
    scheme: str,
    dir_axes: Optional[LUTAxes] = None,
    diff_axes: Optional[LUTAxes] = None,
    *,
    stddev_atol: float = 5e-4,
    stddev_rtol: float = 5e-2,
    # dir2diff tolerance is 6x the reference's 5e-4 per raw entry: the
    # final phi-mirror + src-orbit symmetrization averages ~2-4
    # independent samples per coefficient, and the dir2dir block (where
    # the reference spends most of its photons) is exact here
    dir_stddev_atol: float = 3e-3,
    max_rounds: int = 64,
    # the row-sum criterion (see `_trace_adaptive`) needs up to ~40
    # rounds near its tau ~ 2e-3 crossover; those entries are 1-2 step
    # walks, so the raised cap costs minutes, not hours
    dir_max_rounds: int = 64,
    round_photons: int = 5120,
    checkpoint_dir: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    verbose: bool = True,
    # walk-length cap during generation: biases only the thick
    # conservative corner (tau >~ 50, w0 -> 1) where the truncation
    # redistribution keeps energy conservation exact and the angular
    # distribution is isotropic anyway
    max_iter: int = 1500,
) -> Tuple[LUT, dict]:
    """Production-grade table generation.

    Four structural upgrades over `create_lut` (all documented deviations
    from the reference's plain per-entry MC, `src/optprop_LUT.F90:591`):

      1. dir2dir comes from the CLOSED FORM (`boxmc.direct_transmission`)
         — exact, so the direct MC only needs to converge the dir2diff
         columns (dir_stddev_atol; the reference needs ~1e6 photons per
         entry for its T coefficients alone).
      2. Adaptive per-entry convergence to the reference's stddev
         criteria (atol 5e-4 / rtol 5e-2 for the diffuse table,
         `src/optprop_parameters.F90:255-259`).
      3. Cube-group reduction: only orbit-representative diffuse sources
         are traced (the remaining rows follow exactly by symmetry), and
         direct sources are traced only for phi <= 45 (the phi -> 90-phi
         mirror with the x<->y stream exchange fills the rest).
      4. Achieved-tolerance metadata is returned for honesty (max/median
         SEM per table).

    Returns (lut, meta).
    """
    from tenstream_tpu.boxmc.direct_transmission import (
        dir2dir_table,
        supports_scheme,
    )
    from tenstream_tpu.boxmc.schemes import get_box_scheme
    from tenstream_tpu.streams import SCHEMES

    box = get_box_scheme(scheme)
    dir_axes = dir_axes or production_axes(True)
    diff_axes = diff_axes or production_axes(False)
    key = jax.random.PRNGKey(20260817)
    ck = (lambda name: os.path.join(checkpoint_dir, name) if checkpoint_dir else None)

    # Schemes with sub-face-resolved direct streams (8_10/8_16/8_18:
    # the top face splits 2x2) have no closed-form dir2dir yet; for
    # them the adaptive MC converges the T columns too (the reference's
    # own approach for ALL schemes, `src/optprop_LUT.F90:591`) and the
    # MC T fills dir2dir.  meta["dir2dir_source"] records which path
    # produced the table.
    have_closed_form = supports_scheme(scheme)

    meta: dict = {"scheme": scheme, "stddev_atol": stddev_atol, "stddev_rtol": stddev_rtol}

    # ---------------- diffuse table: orbit reps + adaptive MC ----------
    fshape = tuple(len(a) for a in (diff_axes.tau, diff_axes.w0, diff_axes.aspect, diff_axes.g))
    diff_entries = _entry_grid(diff_axes, False)
    diff2diff = np.zeros(fshape + (box.ndiff, box.ndiff), np.float32)
    reps, assign = _diff_orbits(scheme)
    rep_rows = {}
    sems = []
    rounds_all = []
    for srep in reps:
        _, S, rounds, sem = _trace_adaptive(
            scheme, diff_entries, srep, False, key,
            stddev_atol=stddev_atol, stddev_rtol=stddev_rtol,
            round_photons=round_photons, max_rounds=max_rounds,
            use_pallas=use_pallas, verbose=verbose, max_iter=max_iter,
            checkpoint_path=ck(f"diff_src{srep}.npz"),
        )
        rep_rows[srep] = S.reshape(fshape + (box.ndiff,))
        sems.append(sem)
        rounds_all.append(rounds)
    for s in range(box.ndiff):
        rep, g = assign[s]
        diff2diff[..., s, :] = rep_rows[rep][..., np.asarray(g)]
    sems = np.concatenate(sems, 0)
    rounds_cat = np.concatenate(rounds_all, 0)
    meta["diff_sem_max"] = float(sems.max())
    meta["diff_sem_median"] = float(np.median(sems))
    meta["diff_rounds_mean"] = float(rounds_cat.mean())
    meta["diff_photons_total"] = float(rounds_cat.sum() * round_photons)

    # ---------------- direct: closed-form dir2dir + MC dir2diff --------
    dshape = tuple(len(a) for a in (dir_axes.tau, dir_axes.w0, dir_axes.aspect, dir_axes.g, dir_axes.phi, dir_axes.theta))
    nphi = len(dir_axes.phi)
    phi_sym = bool(np.allclose(dir_axes.phi + dir_axes.phi[::-1], 90.0, atol=1e-3))
    nphi_lo = (nphi + 1) // 2 if phi_sym else nphi
    lo_axes = LUTAxes(dir_axes.tau, dir_axes.w0, dir_axes.aspect, dir_axes.g,
                      dir_axes.phi[:nphi_lo], dir_axes.theta)
    lo_shape = dshape[:4] + (nphi_lo, dshape[5])
    dir_entries = _entry_grid(lo_axes, True)

    dir2diff = np.zeros(dshape + (box.ndir, box.ndiff), np.float32)
    dir2dir_mc = (None if have_closed_form
                  else np.zeros(dshape + (box.ndir, box.ndir), np.float32))
    sems = []
    rounds_all = []
    for src in range(box.ndir):
        T, S, rounds, sem = _trace_adaptive(
            scheme, dir_entries, src, True, key,
            stddev_atol=dir_stddev_atol, stddev_rtol=stddev_rtol,
            round_photons=round_photons, max_rounds=dir_max_rounds,
            use_pallas=use_pallas, verbose=verbose, max_iter=max_iter,
            # with a closed-form T only the S columns gate convergence
            conv_cols=(slice(box.ndir, None) if have_closed_form else None),
            checkpoint_path=ck(f"dir_src{src}.npz"),
        )
        dir2diff[:, :, :, :, :nphi_lo, :, src, :] = S.reshape(lo_shape + (box.ndiff,))
        if dir2dir_mc is not None:
            dir2dir_mc[:, :, :, :, :nphi_lo, :, src, :] = T.reshape(lo_shape + (box.ndir,))
        sems.append(sem[:, box.ndir:] if have_closed_form else sem)
        rounds_all.append(rounds)
    if phi_sym and nphi_lo < nphi:
        # mirror-fill phi > 45: phi -> 90-phi pairs with the x<->y
        # exchange of both src and dst streams (see symmetrize_tables)
        sch = SCHEMES[scheme]
        pd = np.asarray(sch.dir_mirror_perm_xy())
        pf = np.asarray(sch.diff_mirror_perms()["mxy"])
        for i in range(nphi_lo, nphi):
            j = nphi - 1 - i
            dir2diff[:, :, :, :, i] = dir2diff[:, :, :, :, j][..., pd, :][..., :, pf]
            if dir2dir_mc is not None:
                dir2dir_mc[:, :, :, :, i] = (
                    dir2dir_mc[:, :, :, :, j][..., pd, :][..., :, pd]
                )
    sems = np.concatenate(sems, 0)
    rounds_cat = np.concatenate(rounds_all, 0)
    meta["dir_sem_max"] = float(sems.max())
    meta["dir_sem_median"] = float(np.median(sems))
    meta["dir_rounds_mean"] = float(rounds_cat.mean())
    meta["dir_photons_total"] = float(rounds_cat.sum() * round_photons)
    meta["dir2dir_source"] = "closed_form" if have_closed_form else "mc"

    if have_closed_form:
        dd = dir2dir_table(scheme, dir_axes.tau, dir_axes.aspect, dir_axes.phi, dir_axes.theta)
        dir2dir = np.broadcast_to(
            dd[:, None, :, None], dshape + (box.ndir, box.ndir)
        ).copy()
    else:
        dir2dir = dir2dir_mc

    dir2dir, dir2diff, diff2diff = symmetrize_tables(
        scheme, dir2dir, dir2diff, diff2diff, np.asarray(dir_axes.phi)
    )
    # Physical conservation clamp: dir2dir is EXACT (closed form) while
    # dir2diff is MC — the MC run's own (noisy) direct transmission can
    # undershoot the exact one, leaving S-row sums that overshoot the
    # remaining 1 - T budget by MC noise.  Scale each S row down into its
    # exact budget (never up); this removes the only way the table can
    # create energy, so the gate below checks real defects, not noise.
    t_sum = dir2dir.sum(-1)
    s_sum = dir2diff.sum(-1)
    budget = np.maximum(1.0 - t_sum, 0.0)
    scale = np.where(s_sum > budget, budget / np.maximum(s_sum, 1e-30), 1.0)
    nclamped = int((scale < 1.0).sum())
    if nclamped:
        meta["dir2diff_rows_clamped"] = nclamped
        meta["dir2diff_clamp_min_scale"] = float(scale.min())
    dir2diff = dir2diff * scale[..., None]
    # energy-conservation gate (reference `src/optprop_LUT.F90:1489-1504`)
    viol = (dir2dir.sum(-1) + dir2diff.sum(-1) - 1.0).max()
    violf = (diff2diff.sum(-1) - 1.0).max()
    meta["energy_violation_dir"] = float(max(viol, 0.0))
    meta["energy_violation_diff"] = float(max(violf, 0.0))
    if max(viol, violf) > 5 * dir_stddev_atol:
        raise FloatingPointError(
            f"energy creation in generated tables: dir {viol:.2e} diff {violf:.2e}"
        )

    return LUT(scheme, dir_axes, diff_axes, dir2dir, dir2diff, diff2diff), meta


def compose_production_lut(
    scheme: str,
    donor_path: str,
    checkpoint_dir: str,
    diff_axes: Optional[LUTAxes] = None,
    round_photons: int = 5120,
) -> Tuple[LUT, dict]:
    """Staged delivery: compose a production table from the CONVERGED
    diffuse checkpoints plus a donor LUT's direct tables.

    The diffuse table is where the production axis density matters most
    (it feeds every iteration of the diffuse solve); dir2dir is
    regenerated CLOSED-FORM on the donor's direct axes (exact regardless
    of donor quality, `boxmc.direct_transmission`), and the donor's
    MC dir2diff provides the smooth scattering source.  Each table
    carries its own axes, so mixed densities interpolate correctly by
    construction.  Documented staged deviation: the full-density
    adaptive dir2diff pass continues from its own checkpoints and
    replaces the donor block when done.
    """
    from tenstream_tpu.boxmc.direct_transmission import dir2dir_table
    from tenstream_tpu.boxmc.schemes import get_box_scheme

    box = get_box_scheme(scheme)
    diff_axes = diff_axes or production_axes(False)
    fshape = tuple(len(a) for a in (diff_axes.tau, diff_axes.w0, diff_axes.aspect, diff_axes.g))
    nent = int(np.prod(fshape))
    reps, assign = _diff_orbits(scheme)
    meta: dict = {"scheme": scheme, "composed_from": os.path.basename(donor_path)}

    diff2diff = np.zeros(fshape + (box.ndiff, box.ndiff), np.float32)
    rep_rows = {}
    sems, rounds_all = [], []
    for srep in reps:
        ckp = os.path.join(checkpoint_dir, f"diff_src{srep}.npz")
        ck = np.load(ckp)
        mean, m2, rounds = ck["mean"], ck["m2"], ck["rounds"]
        if mean.shape[0] != nent or not (rounds >= 1).all():
            raise RuntimeError(
                f"diffuse checkpoint {ckp} incomplete: "
                f"{int((rounds >= 1).sum())}/{nent} entries have >=1 round"
            )
        n = np.maximum(rounds, 1)[:, None].astype(np.float64)
        sems.append((np.sqrt(np.maximum(m2, 0.0) / n) / np.sqrt(n)).astype(np.float32))
        rounds_all.append(rounds)
        rep_rows[srep] = mean.astype(np.float32).reshape(fshape + (box.ndiff,))
    for s in range(box.ndiff):
        rep, g = assign[s]
        diff2diff[..., s, :] = rep_rows[rep][..., np.asarray(g)]
    sems_cat = np.concatenate(sems, 0)
    rounds_cat = np.concatenate(rounds_all, 0)
    meta["diff_sem_max"] = float(sems_cat.max())
    meta["diff_sem_median"] = float(np.median(sems_cat))
    meta["diff_rounds_mean"] = float(rounds_cat.mean())
    meta["diff_photons_total"] = float(rounds_cat.sum() * round_photons)

    donor = LUT.load(donor_path)
    dir_axes = donor.dir_axes
    dshape = tuple(len(a) for a in (dir_axes.tau, dir_axes.w0, dir_axes.aspect,
                                    dir_axes.g, dir_axes.phi, dir_axes.theta))
    try:
        dd = dir2dir_table(scheme, dir_axes.tau, dir_axes.aspect, dir_axes.phi,
                           dir_axes.theta)
        dir2dir = np.broadcast_to(
            dd[:, None, :, None], dshape + (box.ndir, box.ndir)
        ).copy()
    except ValueError:
        # quadrant-resolved direct schemes (8_*) have no closed form
        # (sub-cell face-quadrant geometry); stage the donor's MC
        # dir2dir block instead — it rides the donor's own axes, so the
        # mixed densities interpolate correctly like dir2diff does
        meta["dir2dir_from_donor_mc"] = True
        dir2dir = np.asarray(donor.dir2dir, np.float32).copy()
    dir2diff = np.asarray(donor.dir2diff, np.float32).copy()

    dir2dir, dir2diff, diff2diff = symmetrize_tables(
        scheme, dir2dir, dir2diff, diff2diff, np.asarray(dir_axes.phi)
    )
    # same conservation clamp + gate as create_production_lut
    budget = np.maximum(1.0 - dir2dir.sum(-1), 0.0)
    s_sum = dir2diff.sum(-1)
    scale = np.where(s_sum > budget, budget / np.maximum(s_sum, 1e-30), 1.0)
    dir2diff = dir2diff * scale[..., None]
    viol = float(max((dir2dir.sum(-1) + dir2diff.sum(-1) - 1.0).max(), 0.0))
    violf = float(max((diff2diff.sum(-1) - 1.0).max(), 0.0))
    meta["energy_violation_dir"] = viol
    meta["energy_violation_diff"] = violf
    if max(viol, violf) > 2.5e-2:
        raise FloatingPointError(
            f"energy creation in composed tables: dir {viol:.2e} diff {violf:.2e}"
        )
    return LUT(scheme, dir_axes, diff_axes, dir2dir, dir2diff, diff2diff), meta


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
