"""Scalable snapshot output for distributed runs.

Successor of the reference's parallel I/O (reference:
HydroRunBaseMpi.cpp:4206-4227 per-rank VTK pieces + rank-0 ``.pvti``
master; :4835-5557 collective PHDF5 hyperslabs).  In the single-controller
JAX model every device shard of the global array is addressable, so
"parallel I/O" becomes: stream one shard at a time from device to host and
write it into its own piece file (VTI) or its hyperslab of a global
dataset (HDF5) — the full global array is never materialized on the host,
which is what caps gathered I/O at host-RAM size (the reference's 2000³
z-slab capability, ChangeLog:34-38).
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..config.params import RunParams
from ..core.constants import var_names
from .hdf5 import dataset_names, write_xdmf_wrapper
from .vtk import write_vti


def iter_shards(U_sharded):
    """Yield (index, host_array) for each unique addressable shard of a
    sharded jax.Array, one host copy at a time (deduplicates replicas)."""
    seen = set()
    for shard in U_sharded.addressable_shards:
        key = tuple(
            (s.start, s.stop) for s in shard.index if isinstance(s, slice)
        )
        if key in seen:
            continue
        seen.add(key)
        yield shard.index, np.asarray(shard.data)


def _piece_offsets(params: RunParams, index) -> tuple[int, int, int]:
    """(ox, oy, oz) cell offsets of a shard's global position.

    ``index`` is the shard's tuple of slices into the interior-only global
    array laid out [nvar, (z,) y, x]."""
    spatial = [s for s in index[1:]]
    starts = [0 if s.start is None else int(s.start) for s in spatial]
    if params.dim == 2:
        oy, ox = starts
        oz = 0
    else:
        oz, oy, ox = starts
    return ox, oy, oz


def output_vtk_pieces(
    params: RunParams,
    U_sharded,
    n_step: int,
    output_dir: str = ".",
    prefix: str = "output",
    binary: bool = True,
) -> Path:
    """Write one ``.vti`` piece per device shard plus a ``.pvti`` master.

    Pieces are named ``<prefix>_<step:07d>_p<k:04d>.vti`` next to the
    master ``<prefix>_<step:07d>.pvti`` (the reference's per-rank naming,
    HydroRunBaseMpi.cpp:4206-4227)."""
    os.makedirs(output_dir, exist_ok=True)
    names = var_names(params.nb_var)
    origin = (params.xmin, params.ymin, params.zmin)
    spacing = (params.dx, params.dy, params.dz if params.dim == 3 else 1.0)

    pieces = []  # (extent string, filename)
    dtype = None
    for k, (index, data) in enumerate(iter_shards(U_sharded)):
        ox, oy, oz = _piece_offsets(params, index)
        if data.ndim == 3:  # [nvar, ny, nx]
            nz, (ny, nx) = 1, data.shape[1:]
        else:
            nz, ny, nx = data.shape[1:]
        dtype = data.dtype
        piece_name = f"{prefix}_{n_step:07d}_p{k:04d}.vti"
        write_vti(
            Path(output_dir) / piece_name,
            {name: data[i] for i, name in enumerate(names)},
            origin=origin,
            spacing=spacing,
            binary=binary,
            extent_offset=(ox, oy, oz),
        )
        pieces.append(
            (f"{ox} {ox+nx} {oy} {oy+ny} {oz} {oz+nz}", piece_name)
        )

    vtk_type = {"float32": "Float32", "float64": "Float64"}[np.dtype(dtype).name]
    nx, ny = params.nx, params.ny
    nz = params.nz if params.dim == 3 else 1
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="PImageData" version="0.1" byte_order="LittleEndian">',
        f'  <PImageData WholeExtent="0 {nx} 0 {ny} 0 {nz}" GhostLevel="0" '
        f'Origin="{origin[0]} {origin[1]} {origin[2]}" '
        f'Spacing="{spacing[0]} {spacing[1]} {spacing[2]}">',
        "    <PCellData>",
    ]
    for name in names:
        lines.append(f'      <PDataArray type="{vtk_type}" Name="{name}"/>')
    lines.append("    </PCellData>")
    for extent, piece_name in pieces:
        lines.append(f'    <Piece Extent="{extent}" Source="{piece_name}"/>')
    lines += ["  </PImageData>", "</VTKFile>", ""]
    master = Path(output_dir) / f"{prefix}_{n_step:07d}.pvti"
    master.write_text("\n".join(lines))
    return master


def output_hdf5_sharded(
    params: RunParams,
    U_sharded,
    n_step: int,
    total_time: float = 0.0,
    output_dir: str = ".",
    prefix: str = "output",
    compression_level: int = 0,
    write_xdmf: bool = True,
) -> Path:
    """Stream shard hyperslabs into a single global-shape HDF5 snapshot.

    The on-disk layout is byte-identical in meaning to the serial
    ``output_hdf5`` (interior-only datasets + the same attributes), so the
    file doubles as a restart input (``input_hdf5``) — the successor of the
    reference's collective PHDF5 restart round trip
    (HydroRunBaseMpi.cpp:4835-5557, 7505-7862)."""
    import datetime

    import h5py

    os.makedirs(output_dir, exist_ok=True)
    path = Path(output_dir) / f"{prefix}_{n_step:07d}.h5"
    shape = (params.nz, params.ny, params.nx)[-params.dim:]
    dtype = np.float64 if params.dtype == "float64" else np.float32
    kwargs = {}
    if compression_level > 0:
        kwargs = dict(
            compression="gzip", compression_opts=compression_level,
            shuffle=True, chunks=True,
        )

    names = dataset_names(params)
    with h5py.File(path, "w") as f:
        dsets = [f.create_dataset(n, shape=shape, dtype=dtype, **kwargs)
                 for n in names]
        for index, data in iter_shards(U_sharded):
            spatial = tuple(index[1:])
            for i, d in enumerate(dsets):
                d[spatial] = data[i]
        f.attrs["time step"] = np.int32(n_step)
        f.attrs["total time"] = np.float64(total_time)
        f.attrs["nx"] = np.int32(params.nx)
        f.attrs["ny"] = np.int32(params.ny)
        f.attrs["nz"] = np.int32(params.nz)
        f.attrs["ghost included"] = np.int32(0)
        f.attrs["ghost width"] = np.int32(params.ghost_width)
        f.attrs["creation date"] = datetime.datetime.now().isoformat()

    if write_xdmf:
        write_xdmf_wrapper(params, path, ghost_included=False)
    return path
