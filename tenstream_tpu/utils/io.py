"""Scene dump / replay and visualization export.

Parity:
  * input dump/replay — reference specint can dump all solver inputs to
    netCDF and re-solve from the dump (`specint/specint_pprts.F90:213+`,
    `dump_input`/`load_input_dump`, example
    `ex_pprts_specint_lw_sw_from_dump.F90`).  Here scenes are npz
    archives with a format tag.
  * XDMF export — reference `src/xdmf_export.F90` writes
    XDMF/HDF5-backed visualization output of surface fluxes and building
    meshes.  Here fields are written as XDMF XML referencing raw binary
    heavy data (ParaView/VisIt-readable) without an HDF5 dependency.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_FORMAT = "tenstream_tpu_scene_v1"


def dump_scene(path: str, **arrays) -> None:
    """Write named arrays (+ scalars) as a replayable scene archive."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __format__=_FORMAT, **{
        k: np.asarray(v) for k, v in arrays.items() if v is not None
    })


def load_scene(path: str) -> Dict[str, np.ndarray]:
    z = np.load(path, allow_pickle=False)
    if str(z.get("__format__")) != _FORMAT:
        raise ValueError(f"{path} is not a {_FORMAT} archive")
    return {k: z[k] for k in z.files if k != "__format__"}


def write_xdmf_grid(
    basename: str,
    fields: Dict[str, np.ndarray],
    dx: float = 1.0,
    dy: float = 1.0,
    dz: float = 1.0,
) -> str:
    """Write 2-D/3-D fields on a regular grid as XDMF + raw binaries.

    fields: name -> array of shape (Nx, Ny) or (Nz, Nx, Ny).
    Returns the path of the .xmf file.
    """
    base = os.path.abspath(basename)
    os.makedirs(os.path.dirname(base), exist_ok=True)
    grids = []
    for name, arr in fields.items():
        arr = np.ascontiguousarray(np.asarray(arr, np.float32))
        binpath = f"{base}_{name}.bin"
        arr.tofile(binpath)
        if arr.ndim == 2:
            nxd, nyd = arr.shape
            dims = f"{nxd} {nyd}"
            topo = f'<Topology TopologyType="2DCoRectMesh" Dimensions="{dims}"/>'
            geom = (
                '<Geometry GeometryType="Origin_DxDy">'
                f'<DataItem Dimensions="2">0 0</DataItem>'
                f'<DataItem Dimensions="2">{dx} {dy}</DataItem>'
                "</Geometry>"
            )
        else:
            nzd, nxd, nyd = arr.shape
            dims = f"{nzd} {nxd} {nyd}"
            topo = f'<Topology TopologyType="3DCoRectMesh" Dimensions="{dims}"/>'
            geom = (
                '<Geometry GeometryType="Origin_DxDyDz">'
                f'<DataItem Dimensions="3">0 0 0</DataItem>'
                f'<DataItem Dimensions="3">{dz} {dx} {dy}</DataItem>'
                "</Geometry>"
            )
        grids.append(
            f'<Grid Name="{name}" GridType="Uniform">{topo}{geom}'
            f'<Attribute Name="{name}" Center="Node">'
            f'<DataItem Format="Binary" DataType="Float" Precision="4" '
            f'Dimensions="{dims}">{os.path.basename(binpath)}</DataItem>'
            "</Attribute></Grid>"
        )
    xml = (
        '<?xml version="1.0" ?>\n<Xdmf Version="3.0"><Domain>'
        + "".join(grids)
        + "</Domain></Xdmf>\n"
    )
    xmf = base + ".xmf"
    with open(xmf, "w") as f:
        f.write(xml)
    return xmf
