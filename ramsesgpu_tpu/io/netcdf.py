"""NetCDF snapshot writer/reader.

Parity with the reference's outputNetcdf4 / outputPnetcdf and restart
inputPnetcdf (reference: HydroRunBase.cpp:4120+,
HydroRunBaseMpi.cpp:6046-6503, 7505-7862).  Uses the netCDF4 package when
available (NetCDF-4/HDF5 container) and falls back to scipy's pure-Python
classic NetCDF-3 implementation otherwise, so the format is exercisable in
dependency-light environments.  Datasets and root attributes follow the
same conventions as the HDF5 writer (io/hdf5.py): variables named
density/energy/..., attributes "time step", "total time", mesh sizes.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config.params import RunParams
from .hdf5 import dataset_names


def _have_netcdf4() -> bool:
    try:
        import netCDF4  # noqa: F401

        return True
    except ImportError:
        return False


def output_netcdf(params: RunParams, U: np.ndarray, n_step: int, path: str,
                  total_time: float = 0.0,
                  ghost_included: bool = False) -> str:
    g = params.ghost_width
    U = np.asarray(U)
    if not ghost_included:
        U = U[(slice(None),) + (slice(g, -g),) * params.dim]
    dims = ("z", "y", "x")[-params.dim:]

    if _have_netcdf4():
        import netCDF4

        ds = netCDF4.Dataset(path, "w")
        try:
            for name, size in zip(dims, U.shape[1:]):
                ds.createDimension(name, size)
            for i, name in enumerate(dataset_names(params)):
                var = ds.createVariable(name, U.dtype, dims)
                var[...] = U[i]
            ds.setncattr("time step", np.int32(n_step))
            ds.setncattr("total time", float(total_time))
            ds.setncattr("ghost included", np.int32(1 if ghost_included else 0))
        finally:
            ds.close()
        return path

    # classic NetCDF-3 (64-bit offset) via scipy — matches what the
    # reference's PNetCDF path writes (CDF-2/CDF-5 classic format)
    from scipy.io import netcdf_file

    ds = netcdf_file(path, "w", version=2)
    try:
        for name, size in zip(dims, U.shape[1:]):
            ds.createDimension(name, size)
        for i, name in enumerate(dataset_names(params)):
            var = ds.createVariable(name, U.dtype, dims)
            var[...] = U[i]
        setattr(ds, "time_step", np.int32(n_step))
        setattr(ds, "total_time", np.float64(total_time))
        setattr(ds, "ghost_included", np.int32(1 if ghost_included else 0))
    finally:
        ds.close()
    return path


def input_netcdf(params: RunParams, filename: str | Path
                 ) -> tuple[np.ndarray, float, int]:
    """Read a NetCDF snapshot into a full ghosted state array.

    Accepts ghost-included and interior-only files, like input_hdf5.
    Returns (U, total_time, time_step) (reference restart path:
    HydroRunBaseMpi.cpp:7505-7862)."""
    g = params.ghost_width
    dtype = np.float64 if params.dtype == "float64" else np.float32
    U = np.zeros(params.shape, dtype=dtype)

    def fill(get_var, get_attr):
        for i, name in enumerate(dataset_names(params)):
            data = np.asarray(get_var(name), dtype=dtype)
            if data.shape == U[i].shape:
                U[i] = data
            else:
                interior = (slice(g, -g),) * params.dim
                if data.shape != U[i][interior].shape:
                    raise ValueError(
                        f"restart dataset {name} has shape {data.shape}, "
                        f"expected {U[i].shape} (ghosted) or "
                        f"{U[i][interior].shape} (interior)"
                    )
                U[i][interior] = data
        total_time = float(get_attr("total time", "total_time", 0.0))
        time_step = int(get_attr("time step", "time_step", 0))
        return total_time, time_step

    if _have_netcdf4():
        import netCDF4

        ds = netCDF4.Dataset(filename, "r")
        try:
            def attr(name, alt, default):
                for n in (name, alt):
                    if n in ds.ncattrs():
                        return ds.getncattr(n)
                return default

            total_time, time_step = fill(lambda n: ds.variables[n][...], attr)
        finally:
            ds.close()
    else:
        from scipy.io import netcdf_file

        ds = netcdf_file(str(filename), "r", mmap=False)
        try:
            def attr(name, alt, default):
                for n in (name, alt):
                    v = getattr(ds, n.replace(" ", "_"), None)
                    if v is not None:
                        return v
                return default

            total_time, time_step = fill(
                lambda n: ds.variables[n].data, attr
            )
        finally:
            ds.close()
    return U, total_time, time_step
