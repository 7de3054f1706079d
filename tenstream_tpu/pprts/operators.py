"""Matrix-free stream-transport operators (gather -> block matvec -> scatter).

Parity: these are the stencil operators that the reference assembles into
PETSc AIJ matrices (`set_dir_coeff`/`set_diff_coeff`,
`src/pprts.F90:4493,5511`) and applies matrix-free in
`src/pprts_shell.F90` (`op_mat_mult_ediff`:366) and the explicit SOR sweep
(`src/pprts_explicit.F90:849-1015`).

TPU-first redesign: instead of per-cell scalar loops over (src, dst)
pairs, whole-grid shifted views feed one einsum per operator application —
a fused gather / dense-block-matvec / scatter.  Horizontal periodicity is
expressed with `jnp.roll`, which GSPMD lowers to collective-permutes of
the shard halo when x/y are sharded over a device mesh (this replaces the
reference's hand-rolled MPI Isend/Irecv halo exchange,
`src/pprts_explicit.F90:232-328,715-848`).

Conventions (see `grid.py`): stream fields (ndof, Nz+1, Nx, Ny) are
face-indexed; coeff fields (nsrc, ndst, Nz, Nx, Ny) are cell-indexed.
`is_inward` means +z (down) / +x / +y.  The albedo closure row
(Eup_sfc = albedo * Edn_sfc, reference `set_albedo_coeff`:5755) is part
of `diffuse_apply`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.streams import StreamScheme


@jax.tree_util.register_pytree_node_class
class OrbitCoeff:
    """Diffuse (src, dst) coefficient field stored as ONE channel per
    orbit of the solver symmetry subgroup {x-mirror, y-mirror, x<->y}
    (24 channels instead of ndiff^2 = 100 for 3_10).

    Symmetrized LUT tables repeat each coefficient over its cube-group
    orbit, so the assembled per-cell field carries 4.2x redundancy; this
    wrapper keeps the compact form end-to-end — the fields the BiCGStab
    operator re-reads EVERY iteration shrink from 6.2 GB to 1.5 GB at the
    BASELINE 256^2x128 scale, and assembly writes shrink by the same
    factor.  The z-mirror is deliberately NOT in the subgroup: the
    atm-collapse super-layer's adding-folded blocks are up/down
    asymmetric (Rtop != Rbot).

    `idx[src, dst]` is the static orbit id; consumers expand lazily
    (`full()`, fused into the einsum by XLA) or use the static-index
    helpers (`entry`, `dst_sums`).
    """

    def __init__(self, orb: jnp.ndarray, idx: np.ndarray):
        self.orb = orb  # (norb, Nz, Nx, Ny)
        self.idx = np.asarray(idx, np.int64)  # (ndiff, ndiff) static

    def tree_flatten(self):
        return (self.orb,), (self.idx.tobytes(), self.idx.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        buf, shape = aux
        return cls(children[0], np.frombuffer(buf, np.int64).reshape(shape))

    @property
    def dtype(self):
        return self.orb.dtype

    @property
    def shape(self):
        nf = self.idx.shape[0]
        return (nf, nf) + tuple(self.orb.shape[1:])

    def astype(self, dt):
        return OrbitCoeff(self.orb.astype(dt), self.idx)

    def full(self) -> jnp.ndarray:
        """Expanded (ndiff, ndiff, Nz, Nx, Ny) view (static-index take —
        XLA fuses it into the consuming einsum, no materialized copy)."""
        nf = self.idx.shape[0]
        e = jnp.take(self.orb, jnp.asarray(self.idx.ravel(), jnp.int32), axis=0)
        return e.reshape((nf, nf) + tuple(self.orb.shape[1:]))

    def entry(self, s: int, d: int) -> jnp.ndarray:
        """Single (src, dst) coefficient field (Nz, Nx, Ny)."""
        return self.orb[int(self.idx[s, d])]

    def dst_sums(self, dtype=None) -> jnp.ndarray:
        """sum over dst per src (== expanded .astype(dtype).sum(axis=1)),
        via a static per-orbit count matrix."""
        norb = self.orb.shape[0]
        nf = self.idx.shape[0]
        R = np.zeros((nf, norb), np.float32)
        for s in range(nf):
            for d in range(nf):
                R[s, self.idx[s, d]] += 1.0
        orb = self.orb if dtype is None else self.orb.astype(dtype)
        return jnp.einsum("so,o...->s...", jnp.asarray(R, orb.dtype), orb)

    def set_layer0(self, block_full: jnp.ndarray) -> "OrbitCoeff":
        """Overwrite layer 0 with a full (ndiff, ndiff, Nx, Ny) block
        (must itself be orbit-consistent, e.g. the atm-collapse folded
        blocks); picks the orbit-representative entries."""
        norb = self.orb.shape[0]
        reps = [None] * norb
        nf = self.idx.shape[0]
        for s in range(nf):
            for d in range(nf):
                o = int(self.idx[s, d])
                if reps[o] is None:
                    reps[o] = (s, d)
        orb0 = jnp.stack([block_full[s, d] for (s, d) in reps], axis=0)
        return OrbitCoeff(self.orb.at[:, 0].set(orb0.astype(self.orb.dtype)), self.idx)


def diff_coeff_full(coeff) -> jnp.ndarray:
    """Expanded (ndiff, ndiff, ...) array for either storage form."""
    return coeff.full() if isinstance(coeff, OrbitCoeff) else coeff


def diff_dst_sums(coeff, dtype=None) -> jnp.ndarray:
    """coeff.astype(dtype).sum(axis=1) for either storage form."""
    if isinstance(coeff, OrbitCoeff):
        return coeff.dst_sums(dtype)
    c = coeff if dtype is None else coeff.astype(dtype)
    return c.sum(axis=1)


def gather_diff_src(scheme: StreamScheme, x: jnp.ndarray) -> jnp.ndarray:
    """Per-cell source values for every diffuse dof.

    x: (ndiff, Nz+1, Nx, Ny) face-indexed -> (ndiff, Nz, Nx, Ny)
    cell-indexed entry values (reference `msrc` logic,
    `src/pprts_explicit.F90:913-926`).
    """
    axis = scheme.diff_axis()
    inward = scheme.diff_inward()
    rows = []
    for d in range(scheme.ndiff):
        v = x[d]
        if axis[d] == 0:
            rows.append(v[:-1] if inward[d] else v[1:])
        elif axis[d] == 1:
            # inward (+x): enters cell i via face i; outward: via face i+1
            rows.append(v[:-1] if inward[d] else jnp.roll(v[:-1], -1, axis=1))
        else:
            rows.append(v[:-1] if inward[d] else jnp.roll(v[:-1], -1, axis=2))
    return jnp.stack(rows, axis=0)


def scatter_diff_dst(scheme: StreamScheme, contrib: jnp.ndarray, nz: int) -> jnp.ndarray:
    """Scatter per-cell destination contributions onto face-indexed arrays.

    contrib: (ndiff, Nz, Nx, Ny) cell-indexed -> (ndiff, Nz+1, Nx, Ny)
    (reference `mdst` logic, `src/pprts_explicit.F90:910,933,956`).
    """
    axis = scheme.diff_axis()
    inward = scheme.diff_inward()
    out_rows = []
    zeros_level = jnp.zeros_like(contrib[0, :1])
    for d in range(scheme.ndiff):
        c = contrib[d]
        if axis[d] == 0:
            row = (
                jnp.concatenate([zeros_level, c], axis=0)
                if inward[d]
                else jnp.concatenate([c, zeros_level], axis=0)
            )
        elif axis[d] == 1:
            c2 = jnp.roll(c, 1, axis=1) if inward[d] else c
            row = jnp.concatenate([c2, zeros_level], axis=0)
        else:
            c2 = jnp.roll(c, 1, axis=2) if inward[d] else c
            row = jnp.concatenate([c2, zeros_level], axis=0)
        out_rows.append(row)
    return jnp.stack(out_rows, axis=0)


def _orbit_contrib(coeff: "OrbitCoeff", src: jnp.ndarray) -> jnp.ndarray:
    """contrib[d] = sum_s orb[idx[s, d]] * src[s], via STATIC slicing of
    the orbit channels — never expanding to the dense (ndiff^2, ...)
    field.

    The expansion-based path (`full()` + einsum) relies on XLA fusing
    the `take` into the consumer; inside a `lax.while_loop` XLA instead
    hoists the loop-invariant expansion OUT of the loop and materializes
    the full (ndiff^2, Nz, Nx, Ny) field — twice, with a layout copy
    (measured at 256^2x113: 2 x 2.8 GB per band, the round-2
    BASELINE-scale OOM anatomy, `ROUND2_NOTES.md` item 3).  Static
    slices give XLA nothing to hoist: the while-loop body reads the
    compact (norb, ...) field directly.

    Sources sharing an orbit for the same destination are summed BEFORE
    the multiply (fewer FMAs and fewer coefficient re-reads).
    """
    nf = coeff.idx.shape[0]
    rows = []
    for d in range(nf):
        groups: dict = {}
        for s in range(nf):
            groups.setdefault(int(coeff.idx[s, d]), []).append(s)
        acc = None
        for o, ss in sorted(groups.items()):
            ssum = src[ss[0]]
            for s in ss[1:]:
                ssum = ssum + src[s]
            term = coeff.orb[o].astype(src.dtype) * ssum
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def diffuse_scatter(
    scheme: StreamScheme,
    coeff: jnp.ndarray,
    x: jnp.ndarray,
    albedo2d: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """S(x): one application of the diffuse transport scatter.

    coeff: (ndiff, ndiff, Nz, Nx, Ny) [src, dst] or `OrbitCoeff`;
    x: (ndiff, Nz+1, Nx, Ny).  Returns the same shape as x.  With
    `albedo2d` (Nx, Ny), includes the surface reflection closure.
    """
    src = gather_diff_src(scheme, x)
    if isinstance(coeff, OrbitCoeff):
        contrib = _orbit_contrib(coeff, src)
    else:
        contrib = jnp.einsum("sdkij,skij->dkij", coeff.astype(x.dtype), src)
    out = scatter_diff_dst(scheme, contrib, x.shape[1] - 1)
    if albedo2d is not None:
        out = add_surface_reflection(scheme, out, x, albedo2d)
    return out


def add_surface_reflection(scheme: StreamScheme, out, x, albedo2d):
    """Lambertian surface closure (Eup_sfc += albedo * Edn_sfc), split
    over the upward bins by hemisphere fraction (reference
    `set_albedo_coeff`, `src/pprts.F90:5755`)."""
    inward = scheme.diff_inward()
    ntop = scheme.difftop.dof
    dn = [d for d in range(ntop) if inward[d]]
    up = [d for d in range(ntop) if not inward[d]]
    wtop = scheme.difftop_weights()
    edn_sfc = sum(x[d, -1] for d in dn)
    for d in up:
        out = out.at[d, -1].add(albedo2d * edn_sfc * float(wtop[d]))
    return out


def gather_dir_src(
    scheme: StreamScheme, e: jnp.ndarray, xinc: int, yinc: int
) -> jnp.ndarray:
    """Per-cell source values for every direct dof.

    e: (ndir, Nz+1, Nx, Ny) face-indexed direct radiation; side dofs of
    cell (k,i,j) enter via the upwind face (reference
    `src/pprts_explicit.F90:407,411`: src x at i+1-xinc, y at j+1-yinc;
    face-indexed that is face i for xinc=1, face i+1 for xinc=0).
    """
    axis = scheme.dir_axis()
    rows = []
    for s in range(scheme.ndir):
        v = e[s]
        if axis[s] == 0:
            rows.append(v[:-1])
        elif axis[s] == 1:
            rows.append(v[:-1] if xinc == 1 else jnp.roll(v[:-1], -1, axis=1))
        else:
            rows.append(v[:-1] if yinc == 1 else jnp.roll(v[:-1], -1, axis=2))
    return jnp.stack(rows, axis=0)


def dir2diff_source(
    scheme: StreamScheme,
    dir2diff: jnp.ndarray,
    edir: jnp.ndarray,
    xinc: int,
    yinc: int,
) -> jnp.ndarray:
    """Diffuse source from scattered direct radiation.

    Parity: `set_solar_source` (`src/pprts.F90:4684-4846`): the dir2diff
    block maps per-cell direct sources onto diffuse destination faces.
    dir2diff: (ndir, ndiff, Nz, Nx, Ny); edir: (ndir, Nz+1, Nx, Ny) [W].
    Returns b: (ndiff, Nz+1, Nx, Ny) [W].
    """
    src = gather_dir_src(scheme, edir, xinc, yinc)
    # unrolled over the (few) direct sources instead of einsum: the dot
    # lowering transposes the (ndir, ndiff, Nz, Nx, Ny) operand into a
    # (..., ndiff, ndir)-minor copy (measured 3x 1.66 GB at 256^2x113,
    # band_chunk=2); static slices + broadcast multiplies fuse instead
    contrib = None
    for s in range(scheme.ndir):
        t = dir2diff[s] * src[s][None]
        contrib = t if contrib is None else contrib + t
    return scatter_diff_dst(scheme, contrib, edir.shape[1] - 1)


def direct_surface_reflection(
    scheme: StreamScheme, edir: jnp.ndarray, albedo2d: jnp.ndarray
) -> jnp.ndarray:
    """b contribution: ground albedo reflecting the direct beam into the
    upward diffuse dofs (reference `src/pprts.F90:4830-4845`)."""
    ntop_dir = scheme.dirtop.dof
    inward = scheme.diff_inward()
    edir_sfc = edir[:ntop_dir, -1].sum(axis=0)
    b = jnp.zeros(
        (scheme.ndiff,) + edir.shape[1:], dtype=edir.dtype
    )
    wtop = scheme.difftop_weights()
    for d in range(scheme.difftop.dof):
        if not inward[d]:
            b = b.at[d, -1].add(edir_sfc * albedo2d * float(wtop[d]))
    return b


def residual_norm(x_new: jnp.ndarray, x_old: jnp.ndarray) -> jnp.ndarray:
    """Mean L2 norm of the update (reference convergence measure,
    `src/pprts_explicit.F90:176-189`)."""
    return jnp.linalg.norm((x_new - x_old).ravel())
