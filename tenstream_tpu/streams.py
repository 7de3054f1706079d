"""Stream-scheme definitions for the cube solvers.

Parity: reference `src/pprts.F90:256-450` (per-scheme `is_inward` masks and
dof counts) and the BoxMC `.inc` stream geometries (e.g.
`src/boxmc_3_10.inc:20-64`).  A scheme "A_B" has A direct and B diffuse
streams per cell, grouped as

  direct : [dirtop dofs | dirside-x dofs | dirside-y dofs]
  diffuse: [difftop dofs | diffside-x dofs | diffside-y dofs]

`is_inward` semantics (reference `t_dof`, `src/pprts_base.F90:171`):
for top dofs, inward == downward (+z index direction); for side dofs,
inward == toward increasing x (resp. y).  The state arrays index streams
by the face at the low-index side of a cell: top stream dof at level k
lives on the z-face above cell-layer k; a side stream dof at column i
lives on the x-face between cells i-1 and i (periodic).

`area_divider` splits the face area across the dofs sharing it
(`src/pprts.F90:362-368` for 8_10: dirtop divider 4, dirside 2).

Stream <-> LUT numbering: the flattened diffuse dof order here equals the
BoxMC destination numbering of the reference schemes (checked against
`src/boxmc_3_10.inc:36-64`), so transfer matrices are indexed [src, dst]
with both in dof order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np


@dataclass(frozen=True)
class DofGroup:
    is_inward: Tuple[bool, ...]
    area_divider: int = 1

    @property
    def dof(self) -> int:
        return len(self.is_inward)

    @property
    def streams(self) -> int:
        # reference: difftop%streams = dof/2 (up/down pairs), dir streams = dof
        return max(1, self.dof)


@dataclass(frozen=True)
class StreamScheme:
    """Static description of one solver scheme (replaces the reference's
    13 `t_solver_*` derived types with data)."""

    name: str
    dirtop: DofGroup
    dirside: DofGroup
    difftop: DofGroup
    diffside: DofGroup
    # True when the difftop dofs are azimuth-sectored (+y,-x,-y,+x) x
    # (up,dn) pairs (3_16 / 8_16 style)
    sectored_top: bool = False

    # ---- counts ---------------------------------------------------------
    @property
    def ndir(self) -> int:
        return self.dirtop.dof + 2 * self.dirside.dof

    @property
    def ndiff(self) -> int:
        return self.difftop.dof + 2 * self.diffside.dof

    @property
    def difftop_streams(self) -> int:
        return max(1, self.difftop.dof // 2)

    @property
    def diffside_streams(self) -> int:
        return max(1, self.diffside.dof // 2)

    # ---- offset/direction tables (numpy, used at trace time) ------------
    def dir_src_offsets(self) -> np.ndarray:
        """(ndir, 3) int offsets (dz, dx, dy) of each direct src face
        relative to cell (k,i,j), for canonical sun orientation
        xinc=yinc=1 (reference sweep reads src top at k, x-side at face i,
        y-side at face j: `src/pprts_explicit.F90:399-413` with
        i+1-xinc == i for xinc=1)."""
        out = []
        for _ in range(self.dirtop.dof):
            out.append((0, 0, 0))
        for _ in range(self.dirside.dof):
            out.append((0, 0, 0))
        for _ in range(self.dirside.dof):
            out.append((0, 0, 0))
        return np.array(out, np.int32)

    def diff_axis(self) -> np.ndarray:
        """(ndiff,) axis id per diffuse dof: 0=z(top), 1=x-side, 2=y-side."""
        return np.array(
            [0] * self.difftop.dof + [1] * self.diffside.dof + [2] * self.diffside.dof,
            np.int32,
        )

    def diff_inward(self) -> np.ndarray:
        """(ndiff,) bool: inward flag per diffuse dof."""
        return np.array(
            list(self.difftop.is_inward)
            + list(self.diffside.is_inward) * 2,
            bool,
        )

    def dir_axis(self) -> np.ndarray:
        return np.array(
            [0] * self.dirtop.dof + [1] * self.dirside.dof + [2] * self.dirside.dof,
            np.int32,
        )

    def dir_switch_perm(self, switch_x: bool, switch_y: bool) -> np.ndarray:
        """Direct-dof permutation unfolding the LUT's canonical sun octant
        for schemes with sub-face direct streams (reference
        `dir2dir8_coeff_symmetry`, `src/optprop.F90`: east switch swaps
        top-quadrants 0<->1, 2<->3; north switch swaps 0<->2, 1<->3;
        side dofs unchanged).  Identity for single-top-dof schemes."""
        perm = np.arange(self.ndir)
        if self.dirtop.dof == 4:
            if switch_x:
                perm[:4] = perm[[1, 0, 3, 2]]
            if switch_y:
                perm[:4] = perm[[2, 3, 0, 1]]
        return perm

    # ---- mirror / sun-octant permutations -------------------------------
    def _swap_side_pairs(self, perm: np.ndarray, axis: int) -> None:
        nt, ns = self.difftop.dof, self.diffside.dof
        lo = nt + (axis - 1) * ns
        blk = perm[lo : lo + ns].reshape(-1, 2)[:, ::-1].ravel()
        perm[lo : lo + ns] = blk

    def diff_switch_perm(self, switch_x: bool, switch_y: bool) -> np.ndarray:
        """Diffuse-dst permutation unfolding the LUT sun octant
        (reference `dir3_to_diff10/16_coeff_symmetry`,
        `src/optprop.F90:1009+`): side pairs swap on the switched axis;
        sectored tops swap the corresponding azimuth sectors."""
        perm = np.arange(self.ndiff)
        if self.sectored_top:
            if switch_x:  # sectors -x <-> +x: dof pairs (2,3)<->(6,7)
                perm[[2, 3, 6, 7]] = perm[[6, 7, 2, 3]]
            if switch_y:  # sectors +y <-> -y: (0,1)<->(4,5)
                perm[[0, 1, 4, 5]] = perm[[4, 5, 0, 1]]
        if self.diffside.dof:
            if switch_x:
                self._swap_side_pairs(perm, 1)
            if switch_y:
                self._swap_side_pairs(perm, 2)
        return perm

    def diff_mirror_perms(self) -> Dict[str, list]:
        """Cube-symmetry dof permutations for LUT symmetrization
        (x-mirror, y-mirror, z-mirror, x<->y exchange).  Supports plain
        up/dn difftop pairs, sectored tops, and [out,in]-paired sides
        with optional dn/up halves."""
        nt, ns = self.difftop.dof, self.diffside.dof
        n = self.ndiff
        mx = np.arange(n)
        my = np.arange(n)
        mz = np.arange(n)
        mxy = np.arange(n)

        if self.sectored_top:
            mx[[2, 3, 6, 7]] = [6, 7, 2, 3]
            my[[0, 1, 4, 5]] = [4, 5, 0, 1]
            mxy[[0, 1, 6, 7]] = [6, 7, 0, 1]
            mxy[[2, 3, 4, 5]] = [4, 5, 2, 3]
        # z-mirror swaps each (up,dn) top pair
        for p in range(nt // 2):
            mz[[2 * p, 2 * p + 1]] = [2 * p + 1, 2 * p]

        if ns:
            xlo, ylo = nt, nt + ns
            # mirrors along an axis swap that axis' (out,in) pairs
            self._swap_side_pairs(mx, 1)
            self._swap_side_pairs(my, 2)
            # z-mirror swaps the dn/up halves of each side group
            if ns >= 4 and ns % 4 == 0:
                h = ns // 2
                for lo in (xlo, ylo):
                    mz[lo : lo + ns] = np.concatenate(
                        [mz[lo + h : lo + ns], mz[lo : lo + h]]
                    )
            # x<->y exchange swaps the side groups
            mxy[xlo : xlo + ns], mxy[ylo : ylo + ns] = (
                mxy[ylo : ylo + ns].copy(),
                mxy[xlo : xlo + ns].copy(),
            )
        return dict(mx=list(mx), my=list(my), mz=list(mz), mxy=list(mxy))

    def dir_mirror_perm_xy(self) -> list:
        """Direct-dof permutation under the x<->y exchange (pairs with
        the LUT's phi -> 90-phi mirror)."""
        perm = np.arange(self.ndir)
        if self.dirtop.dof == 4:
            perm[[1, 2]] = [2, 1]  # quadrants (x>,y<=) <-> (x<=,y>)
        if self.dirside.dof:
            nt, ns = self.dirtop.dof, self.dirside.dof
            perm[nt : nt + ns], perm[nt + ns : nt + 2 * ns] = (
                perm[nt + ns : nt + 2 * ns].copy(),
                perm[nt : nt + ns].copy(),
            )
        return list(perm)

    def diff_inv_dof(self) -> np.ndarray:
        """(ndiff,) index of the same stream with opposite direction
        (reference `inv_dof`, `src/pprts_explicit.F90:1001-1014`).
        Streams come in adjacent (out, in) pairs in every scheme."""
        inv = np.arange(self.ndiff)
        axis = self.diff_axis()
        inward = self.diff_inward()
        # pair adjacent dofs with opposite direction within the same group
        i = 0
        while i < self.ndiff - 1:
            if axis[i] == axis[i + 1] and inward[i] != inward[i + 1]:
                inv[i], inv[i + 1] = i + 1, i
                i += 2
            else:
                i += 1
        return inv


def _grp(mask, divider=1) -> DofGroup:
    return DofGroup(tuple(mask), divider)


# Scheme registry, masks verbatim from reference `src/pprts.F90:256-450`.
F, T = False, True
SCHEMES: Dict[str, StreamScheme] = {
    "1_2": StreamScheme("1_2", _grp([T]), _grp([]), _grp([F, T]), _grp([])),
    "2str": StreamScheme("2str", _grp([T]), _grp([]), _grp([F, T]), _grp([])),
    "disort": StreamScheme("disort", _grp([T]), _grp([]), _grp([F, T]), _grp([])),
    "3_6": StreamScheme("3_6", _grp([T]), _grp([T]), _grp([F, T]), _grp([F, T])),
    "3_10": StreamScheme("3_10", _grp([T]), _grp([T]), _grp([F, T]), _grp([F, T, F, T])),
    "3_16": StreamScheme(
        "3_16", _grp([T]), _grp([T]), _grp([F, T] * 4), _grp([F, T, F, T]),
        sectored_top=True,
    ),
    "3_24": StreamScheme(
        "3_24", _grp([T]), _grp([T]), _grp([F, T] * 4), _grp([T, F] * 4)
    ),
    "3_30": StreamScheme(
        "3_30", _grp([T]), _grp([T]), _grp([F, T] * 5), _grp([T, F] * 5)
    ),
    "8_10": StreamScheme(
        "8_10", _grp([T] * 4, 4), _grp([T] * 2, 2), _grp([F, T]), _grp([F, T, F, T])
    ),
    "8_16": StreamScheme(
        "8_16", _grp([T] * 4, 4), _grp([T] * 2, 2), _grp([F, T] * 4), _grp([F, T, F, T]),
        sectored_top=True,
    ),
    "8_18": StreamScheme(
        "8_18", _grp([T] * 4, 4), _grp([T] * 2, 2), _grp([F, T] * 5), _grp([F, T, F, T])
    ),
}


def get_scheme(name: str) -> StreamScheme:
    if name not in SCHEMES:
        raise KeyError(f"unknown scheme {name!r}; known: {sorted(SCHEMES)}")
    return SCHEMES[name]
