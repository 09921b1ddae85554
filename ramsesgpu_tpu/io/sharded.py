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


def global_piece_table(U_sharded):
    """Deterministic global piece table ``[(k, device, index)]``.

    Built from the sharding's device->index map (NOT from addressable
    shards), so every process of a multi-host run derives the identical
    numbering and the rank-0 master can reference pieces written by other
    processes (the reference's per-rank piece naming,
    HydroRunBaseMpi.cpp:4206-4227).  Replicated shards collapse to the
    lowest device id."""
    imap = U_sharded.sharding.devices_indices_map(U_sharded.shape)
    seen = set()
    table = []
    for dev in sorted(imap.keys(), key=lambda d: d.id):
        index = imap[dev]
        key = tuple(
            (s.start, s.stop) for s in index if isinstance(s, slice)
        )
        if key in seen:
            continue
        seen.add(key)
        table.append((len(table), dev, index))
    return table


def _local_shard_data(U_sharded):
    """{device id -> host array} for this process's addressable shards."""
    return {
        shard.device.id: np.asarray(shard.data)
        for shard in U_sharded.addressable_shards
    }


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
    import jax

    os.makedirs(output_dir, exist_ok=True)
    names = var_names(params.nb_var)
    origin = (params.xmin, params.ymin, params.zmin)
    spacing = (params.dx, params.dy, params.dz if params.dim == 3 else 1.0)

    my_process = jax.process_index()
    local = _local_shard_data(U_sharded)

    pieces = []  # (extent string, filename) — the FULL global table
    for k, dev, index in global_piece_table(U_sharded):
        ox, oy, oz = _piece_offsets(params, index)
        spatial = [s for s in index[1:]]
        dims = [int(s.stop) - int(s.start) if s.start is not None
                else U_sharded.shape[1 + i]
                for i, s in enumerate(spatial)]
        if params.dim == 2:
            (ny, nx), nz = dims, 1
        else:
            nz, ny, nx = dims
        piece_name = f"{prefix}_{n_step:07d}_p{k:04d}.vti"
        pieces.append(
            (f"{ox} {ox+nx} {oy} {oy+ny} {oz} {oz+nz}", piece_name)
        )
        if dev.process_index != my_process:
            continue  # another host writes this piece
        data = local[dev.id]
        write_vti(
            Path(output_dir) / piece_name,
            {name: data[i] for i, name in enumerate(names)},
            origin=origin,
            spacing=spacing,
            binary=binary,
            extent_offset=(ox, oy, oz),
        )

    master = Path(output_dir) / f"{prefix}_{n_step:07d}.pvti"
    if my_process != 0:
        return master

    dtype = np.float64 if params.dtype == "float64" else np.float32
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
    import jax

    if jax.process_count() > 1:
        # one process cannot own a global h5py file: write per-process
        # piece files + a rank-0 manifest instead (the multi-host
        # equivalent of the reference's collective PHDF5 write,
        # HydroRunBaseMpi.cpp:4835-5557, without an MPI-IO dependency)
        return _output_hdf5_pieces(
            params, U_sharded, n_step, total_time=total_time,
            output_dir=output_dir, prefix=prefix,
            compression_level=compression_level,
        )

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

# --------------------------------------------------------------------- #
# Multi-host HDF5: per-process piece files + rank-0 JSON manifest.


def _output_hdf5_pieces(
    params: RunParams,
    U_sharded,
    n_step: int,
    total_time: float = 0.0,
    output_dir: str = ".",
    prefix: str = "output",
    compression_level: int = 0,
) -> Path:
    """Each process writes its addressable shards into its own
    ``<prefix>_<step>_r<pid>.h5`` (one group per piece, offset attrs);
    process 0 writes ``<prefix>_<step>.pieces.json`` describing the full
    set, which doubles as a restart input (``input_hdf5_pieces``)."""
    import json

    import h5py
    import jax

    os.makedirs(output_dir, exist_ok=True)
    my_process = jax.process_index()
    local = _local_shard_data(U_sharded)
    names = dataset_names(params)
    kwargs = {}
    if compression_level > 0:
        kwargs = dict(
            compression="gzip", compression_opts=compression_level,
            shuffle=True, chunks=True,
        )

    table = global_piece_table(U_sharded)
    my_path = Path(output_dir) / f"{prefix}_{n_step:07d}_r{my_process:04d}.h5"
    with h5py.File(my_path, "w") as f:
        f.attrs["time step"] = np.int32(n_step)
        f.attrs["total time"] = np.float64(total_time)
        for k, dev, index in table:
            if dev.process_index != my_process:
                continue
            data = local[dev.id]
            grp = f.create_group(f"piece{k:04d}")
            grp.attrs["offset"] = np.asarray(
                [0 if s.start is None else int(s.start) for s in index[1:]],
                np.int64,
            )
            for i, name in enumerate(names):
                grp.create_dataset(name, data=data[i], **kwargs)

    manifest = Path(output_dir) / f"{prefix}_{n_step:07d}.pieces.json"
    if my_process == 0:
        entries = []
        for k, dev, index in table:
            entries.append({
                "piece": f"piece{k:04d}",
                "file": f"{prefix}_{n_step:07d}_r{dev.process_index:04d}.h5",
                "offset": [
                    0 if s.start is None else int(s.start) for s in index[1:]
                ],
                "shape": [
                    (U_sharded.shape[1 + i] if s.stop is None
                     else int(s.stop))
                    - (0 if s.start is None else int(s.start))
                    for i, s in enumerate(index[1:])
                ],
            })
        manifest.write_text(json.dumps({
            "format": "ramsesgpu_tpu-hdf5-pieces",
            "nx": params.nx, "ny": params.ny, "nz": params.nz,
            "time step": n_step, "total time": total_time,
            "datasets": list(names),
            "pieces": entries,
        }, indent=1))
    return manifest


def input_hdf5_pieces(
    params: RunParams, manifest_path
) -> tuple[np.ndarray, float, int]:
    """Assemble a ghosted global state from a multi-host piece set.

    Every process reads every piece file (shared filesystem, exactly the
    reference's per-rank hyperslab restart read model,
    HydroRunBaseMpi.cpp:7505-7862); ghosts are zero and refilled by the
    first boundary fill.  Returns (U, total_time, time_step)."""
    import json

    import h5py

    manifest_path = Path(manifest_path)
    meta = json.loads(manifest_path.read_text())
    if meta.get("format") != "ramsesgpu_tpu-hdf5-pieces":
        raise ValueError(f"not a pieces manifest: {manifest_path}")

    g = params.ghost_width
    dtype = np.float64 if params.dtype == "float64" else np.float32
    U = np.zeros(params.shape, dtype=dtype)
    names = dataset_names(params)
    if list(meta["datasets"]) != list(names):
        raise ValueError(
            f"piece manifest datasets {meta['datasets']} do not match the "
            f"run's variables {list(names)}"
        )

    by_file: dict = {}
    for entry in meta["pieces"]:
        by_file.setdefault(entry["file"], []).append(entry)
    for fname, entries in by_file.items():
        with h5py.File(manifest_path.parent / fname, "r") as f:
            for entry in entries:
                grp = f[entry["piece"]]
                sl = tuple(
                    slice(g + o, g + o + s)
                    for o, s in zip(entry["offset"], entry["shape"])
                )
                for i, name in enumerate(names):
                    U[(i, *sl)] = np.asarray(grp[name])
    return U, float(meta["total time"]), int(meta["time step"])

# --------------------------------------------------------------------- #
# NetCDF: the successor of the reference's collective PNetCDF output and
# restart (HydroRunBaseMpi.cpp:6046-6503 output, :7505-7862 restart) — its
# production format for the largest runs.  Same two-regime design as HDF5:
# single-process streams shard hyperslabs into ONE global .nc file;
# multi-process writes per-process piece files + a rank-0 JSON manifest
# that doubles as the restart input.


def output_netcdf_sharded(
    params: RunParams,
    U_sharded,
    n_step: int,
    total_time: float = 0.0,
    output_dir: str = ".",
    prefix: str = "output",
) -> Path:
    """NetCDF snapshot of a sharded state without gathering the volume.

    Single-process: one global-shape ``.nc`` written shard-by-shard
    (netCDF4 hyperslab writes when available; the scipy NetCDF-3 fallback
    stages one variable at a time — 1/nvar of the state, never the whole).
    Multi-process: per-process piece files + manifest
    (``_output_netcdf_pieces``)."""
    import jax

    from .hdf5 import dataset_names

    if jax.process_count() > 1:
        return _output_netcdf_pieces(
            params, U_sharded, n_step, total_time=total_time,
            output_dir=output_dir, prefix=prefix,
        )

    from .netcdf import _have_netcdf4

    os.makedirs(output_dir, exist_ok=True)
    path = Path(output_dir) / f"{prefix}_{n_step:07d}.nc"
    shape = (params.nz, params.ny, params.nx)[-params.dim:]
    dims = ("z", "y", "x")[-params.dim:]
    dtype = np.float64 if params.dtype == "float64" else np.float32
    names = dataset_names(params)

    if _have_netcdf4():
        import netCDF4

        ds = netCDF4.Dataset(path, "w")
        try:
            for name, size in zip(dims, shape):
                ds.createDimension(name, size)
            variables = [ds.createVariable(n, dtype, dims) for n in names]
            for index, data in iter_shards(U_sharded):
                spatial = tuple(index[1:])
                for i, var in enumerate(variables):
                    var[spatial] = data[i]
            ds.setncattr("time step", np.int32(n_step))
            ds.setncattr("total time", float(total_time))
            ds.setncattr("ghost included", np.int32(0))
        finally:
            ds.close()
        return path

    # scipy NetCDF-3 fallback: classic format has no partial-write API
    # worth trusting — stage one VARIABLE at a time (so peak host memory
    # is state/nvar, preserving the don't-materialize-the-state contract
    # up to that factor)
    from scipy.io import netcdf_file

    shards = list(iter_shards(U_sharded))
    ds = netcdf_file(str(path), "w", version=2)
    try:
        for name, size in zip(dims, shape):
            ds.createDimension(name, size)
        for i, name in enumerate(names):
            buf = np.zeros(shape, dtype)
            for index, data in shards:
                buf[tuple(index[1:])] = data[i]
            var = ds.createVariable(name, dtype, dims)
            var[...] = buf
        setattr(ds, "time_step", np.int32(n_step))
        setattr(ds, "total_time", np.float64(total_time))
        setattr(ds, "ghost_included", np.int32(0))
    finally:
        ds.close()
    return path


def _output_netcdf_pieces(
    params: RunParams,
    U_sharded,
    n_step: int,
    total_time: float = 0.0,
    output_dir: str = ".",
    prefix: str = "output",
) -> Path:
    """Each process writes its shards into ``<prefix>_<step>_r<pid>.nc``
    (piece-prefixed variables — classic NetCDF has no groups), process 0
    writes ``<prefix>_<step>.nc.pieces.json`` describing the full set."""
    import json

    import jax

    from .hdf5 import dataset_names
    from .netcdf import _have_netcdf4

    os.makedirs(output_dir, exist_ok=True)
    my_process = jax.process_index()
    local = _local_shard_data(U_sharded)
    names = dataset_names(params)
    dims_l = ("z", "y", "x")[-params.dim:]
    dtype = np.float64 if params.dtype == "float64" else np.float32

    table = global_piece_table(U_sharded)
    my_path = (
        Path(output_dir) / f"{prefix}_{n_step:07d}_r{my_process:04d}.nc"
    )

    def write_pieces(create_dim, create_var, set_attr):
        set_attr("time_step", np.int32(n_step))
        set_attr("total_time", np.float64(total_time))
        for k, dev, index in table:
            if dev.process_index != my_process:
                continue
            data = local[dev.id]
            pfx = f"piece{k:04d}"
            for name, size in zip(dims_l, data.shape[1:]):
                create_dim(f"{pfx}_{name}", size)
            for i, name in enumerate(names):
                var = create_var(
                    f"{pfx}_{name}", dtype,
                    tuple(f"{pfx}_{d}" for d in dims_l),
                )
                var[...] = data[i]
            set_attr(
                f"{pfx}_offset",
                np.asarray(
                    [0 if s.start is None else int(s.start)
                     for s in index[1:]],
                    np.int32,
                ),
            )

    if _have_netcdf4():
        import netCDF4

        ds = netCDF4.Dataset(my_path, "w")
        try:
            write_pieces(
                ds.createDimension, ds.createVariable, ds.setncattr
            )
        finally:
            ds.close()
    else:
        from scipy.io import netcdf_file

        ds = netcdf_file(str(my_path), "w", version=2)
        try:
            write_pieces(
                ds.createDimension, ds.createVariable,
                lambda n, v: setattr(ds, n, v),
            )
        finally:
            ds.close()

    manifest = Path(output_dir) / f"{prefix}_{n_step:07d}.nc.pieces.json"
    if my_process == 0:
        entries = []
        for k, dev, index in table:
            entries.append({
                "piece": f"piece{k:04d}",
                "file": f"{prefix}_{n_step:07d}_r{dev.process_index:04d}.nc",
                "offset": [
                    0 if s.start is None else int(s.start)
                    for s in index[1:]
                ],
                "shape": [
                    (U_sharded.shape[1 + i] if s.stop is None
                     else int(s.stop))
                    - (0 if s.start is None else int(s.start))
                    for i, s in enumerate(index[1:])
                ],
            })
        manifest.write_text(json.dumps({
            "format": "ramsesgpu_tpu-netcdf-pieces",
            "nx": params.nx, "ny": params.ny, "nz": params.nz,
            "time step": n_step, "total time": total_time,
            "datasets": list(names),
            "pieces": entries,
        }, indent=1) + "\n")
    return manifest


def input_netcdf_pieces(
    params: RunParams, manifest_path
) -> tuple[np.ndarray, float, int]:
    """Assemble a ghosted global state from a NetCDF piece set (restart
    over the multi-process snapshot — the reference's inputPnetcdf role,
    HydroRunBaseMpi.cpp:7505-7862)."""
    import json

    from .hdf5 import dataset_names
    from .netcdf import _have_netcdf4

    manifest_path = Path(manifest_path)
    meta = json.loads(manifest_path.read_text())
    if meta.get("format") != "ramsesgpu_tpu-netcdf-pieces":
        raise ValueError(f"not a NetCDF pieces manifest: {manifest_path}")

    g = params.ghost_width
    dtype = np.float64 if params.dtype == "float64" else np.float32
    U = np.zeros(params.shape, dtype=dtype)
    names = dataset_names(params)
    if list(meta["datasets"]) != list(names):
        raise ValueError(
            f"piece manifest datasets {meta['datasets']} do not match the "
            f"run's variables {list(names)}"
        )

    by_file: dict = {}
    for entry in meta["pieces"]:
        by_file.setdefault(entry["file"], []).append(entry)
    for fname, entries in by_file.items():
        path = manifest_path.parent / fname
        if _have_netcdf4():
            import netCDF4

            ds = netCDF4.Dataset(path, "r")
            get = lambda n: np.asarray(ds.variables[n][...])  # noqa: E731
        else:
            from scipy.io import netcdf_file

            ds = netcdf_file(str(path), "r", mmap=False)
            get = lambda n: np.asarray(ds.variables[n].data)  # noqa: E731
        try:
            for entry in entries:
                sl = tuple(
                    slice(g + o, g + o + s)
                    for o, s in zip(entry["offset"], entry["shape"])
                )
                for i, name in enumerate(names):
                    U[(i, *sl)] = get(f"{entry['piece']}_{name}")
        finally:
            ds.close()
    return U, float(meta["total time"]), int(meta["time step"])


# --------------------------------------------------------------------- #
# Collective SINGLE-ARTIFACT output: one logical zarr dataset written by
# every process of a multi-host run (the role of the reference's
# collective PHDF5/PNetCDF writers, HydroRunBaseMpi.cpp:4835-5557 and
# :6046-6503, without an MPI-IO dependency). tensorstore chunks are
# aligned to the shard blocks, so each process writes only whole chunks
# of its own addressable shards — no read-modify-write races, no
# gather; downstream tools read ONE store.


def _zarr_spec(path, shape, chunks, dtype, create: bool):
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(path)},
    }
    if create:
        spec["metadata"] = {
            "shape": list(shape),
            "chunks": list(chunks),
            "dtype": "<f8" if dtype == np.float64 else "<f4",
            "compressor": None,
        }
    return spec


def output_zarr_sharded(
    params: RunParams,
    U_sharded,
    n_step: int,
    total_time: float = 0.0,
    output_dir: str = ".",
    prefix: str = "output",
) -> Path:
    """Write ONE zarr store collectively: every process streams its own
    shards into disjoint whole chunks of the shared dataset (shared
    filesystem assumed, exactly like the reference's MPI-IO).  Process 0
    creates the store metadata + the attrs sidecar; the others poll for
    it, then all write concurrently.  Doubles as a restart input
    (``input_zarr`` / run restart_filename=*.zarr)."""
    import json
    import time as _time

    import jax
    import tensorstore as ts

    os.makedirs(output_dir, exist_ok=True)
    path = Path(output_dir) / f"{prefix}_{n_step:07d}.zarr"
    dtype = np.float64 if params.dtype == "float64" else np.float32
    nv = params.nb_var
    spatial = (params.nz, params.ny, params.nx)[-params.dim:]
    shape = (nv,) + spatial

    # chunk = one shard's block (equal decomposition is enforced by
    # validate_decomposition)
    _, _, index0 = global_piece_table(U_sharded)[0]
    chunks = (nv,) + tuple(
        s.stop - s.start for s in index0[1:]
    )

    if jax.process_index() == 0:
        arr = ts.open(
            _zarr_spec(path, shape, chunks, dtype, create=True),
            create=True, delete_existing=True,
        ).result()
        (path / "attrs.json").write_text(json.dumps({
            "format": "ramsesgpu_tpu-zarr",
            "time step": int(n_step),
            "total time": float(total_time),
            "nx": params.nx, "ny": params.ny, "nz": params.nz,
            "ghost width": params.ghost_width,
            "datasets": list(dataset_names(params)),
        }))
    else:
        deadline = _time.monotonic() + 120.0
        while not (path / ".zarray").exists():
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"zarr store {path} not created by process 0"
                )
            _time.sleep(0.05)
        arr = ts.open(
            _zarr_spec(path, shape, chunks, dtype, create=False),
            open=True,
        ).result()

    writes = []
    for index, data in iter_shards(U_sharded):
        sl = (slice(None),) + tuple(index[1:])
        writes.append(arr[sl].write(np.asarray(data, dtype=dtype)))
    for w in writes:
        w.result()
    return path


def input_zarr(params: RunParams, path) -> tuple[np.ndarray, float, int]:
    """Read a collective zarr snapshot back into a ghosted global state
    (zero ghost frame — the run refills boundaries before stepping, the
    piece readers' convention)."""
    import json

    import tensorstore as ts

    path = Path(path)
    meta = json.loads((path / "attrs.json").read_text())
    if meta.get("format") != "ramsesgpu_tpu-zarr":
        raise ValueError(f"not a ramsesgpu_tpu zarr store: {path}")
    arr = ts.open({
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": str(path)},
    }, open=True).result()
    interior = np.asarray(arr.read().result())
    g = params.ghost_width
    dtype = np.float64 if params.dtype == "float64" else np.float32
    U = np.zeros(params.shape, dtype=dtype)
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    U[sl] = interior
    return U, float(meta["total time"]), int(meta["time step"])


# --------------------------------------------------------------------- #
# Streamed long-tail outputs: small slices extracted under SPMD with a
# replicated result — the global volume is never gathered.


def _replicated_slice(U_sharded, fn):
    """jit ``fn(U)`` (which must return a small array) with a replicated
    output sharding; every process can then read the value."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    kwargs = {}
    if isinstance(U_sharded.sharding, NamedSharding):
        kwargs["out_shardings"] = NamedSharding(U_sharded.sharding.mesh, P())
    return np.asarray(jax.jit(fn, **kwargs)(U_sharded))


def output_png_sharded(
    params: RunParams,
    U_sharded,
    n_step: int,
    output_dir: str = ".",
    prefix: str = "output",
    cmap: str = "viridis",
) -> Path:
    """Density-plane PNG from the sharded interior state (2D: the full
    plane; 3D: the mid-z plane) — only the 2D plane ever leaves the mesh."""
    import jax

    from ..core.constants import ID
    from .png import write_png_colormap

    if params.dim == 3:
        fn = lambda U: U[ID, U.shape[1] // 2]  # noqa: E731
    else:
        fn = lambda U: U[ID]  # noqa: E731
    rho = _replicated_slice(U_sharded, fn)
    os.makedirs(output_dir, exist_ok=True)
    path = Path(output_dir) / f"{prefix}_{n_step:07d}.png"
    if jax.process_index() == 0:
        write_png_colormap(path, rho, cmap=cmap)
    return path


def output_faces_sharded(
    params: RunParams,
    U_sharded,
    n_step: int,
    output_dir: str = ".",
    prefix: str = "output",
) -> list:
    """The six domain faces of every variable, each extracted as one
    SPMD slice (the reference's movie output, copyFaces.cuh:46-197)."""
    import jax

    from ..core.constants import var_names

    names = var_names(params.nb_var)
    os.makedirs(output_dir, exist_ok=True)
    face_fns = {
        "xmin": lambda U: U[..., 0],
        "xmax": lambda U: U[..., -1],
        "ymin": lambda U: U[..., 0, :],
        "ymax": lambda U: U[..., -1, :],
    }
    if params.dim == 3:
        face_fns["zmin"] = lambda U: U[:, 0]
        face_fns["zmax"] = lambda U: U[:, -1]
    out = []
    for face, fn in face_fns.items():
        data = _replicated_slice(U_sharded, fn)
        path = Path(output_dir) / f"{prefix}_face_{face}_{n_step:07d}.npz"
        if jax.process_index() == 0:
            np.savez(path, **{n: data[i] for i, n in enumerate(names)})
        out.append(path)
    return out
