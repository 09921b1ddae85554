"""NetCDF snapshot writer (gated on the optional netCDF4 package).

Parity with the reference's outputNetcdf4 / outputPnetcdf
(reference: HydroRunBase.cpp:4120+ and HydroRunBaseMpi.cpp:6046-6503).
The environment this framework is developed in does not ship netCDF4, so
the writer raises a clear error if the package is missing; all tests for it
are skipped in that case.
"""
from __future__ import annotations

import numpy as np

from ..config.params import RunParams
from .hdf5 import dataset_names


def output_netcdf(params: RunParams, U: np.ndarray, n_step: int, path: str,
                  ghost_included: bool = False) -> str:
    try:
        import netCDF4
    except ImportError as exc:
        raise ImportError(
            "netCDF4 is not available; use HDF5/VTK output or install netCDF4"
        ) from exc

    g = params.ghost_width
    if not ghost_included:
        U = np.asarray(U)[(slice(None),) + (slice(g, -g),) * params.dim]

    ds = netCDF4.Dataset(path, "w")
    try:
        dims = ("z", "y", "x")[-params.dim:]
        for name, size in zip(dims, U.shape[1:]):
            ds.createDimension(name, size)
        for i, name in enumerate(dataset_names(params)):
            var = ds.createVariable(name, U.dtype, dims)
            var[...] = U[i]
        ds.setncattr("time step", n_step)
    finally:
        ds.close()
    return path
