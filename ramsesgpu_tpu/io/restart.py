"""Checkpoint / restart logic.

Mirrors the reference's init_simulation restart branch
(reference: src/hydro/HydroRunBase.cpp:7027-7070): read run/restart_filename
(from the output directory), optionally x2-upscale
(run/restart_upscale), optionally reset time
(run/restart_reset_totaltime, restart_reset_timestep).
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

from ..config.configmap import ConfigMap
from ..config.params import RunParams
from .hdf5 import input_hdf5, upscale


def load_restart(params: RunParams, config: ConfigMap):
    """Returns (U_device, total_time, time_step)."""
    filename = config.get_string("run", "restart_filename", "")
    output_dir = config.get_string("output", "outputDir", "./")
    path = Path(output_dir) / filename
    if not path.exists():
        # also accept an absolute / cwd-relative path
        path = Path(filename)
    if not path.exists():
        raise FileNotFoundError(f"restart file not found: {filename}")

    # dispatch on file suffix: .nc restarts come from the NetCDF writer
    # (reference: inputPnetcdf vs inputHdf5 chosen by format flag inside
    # init_simulation, HydroRunBaseMpi.cpp:10440-10442)
    if path.suffix == ".nc":
        from .netcdf import input_netcdf as _reader
    else:
        _reader = input_hdf5

    if config.get_bool("run", "restart_upscale", False):
        half = params.replace(
            nx=params.nx // 2, ny=params.ny // 2,
            nz=params.nz // 2 if params.dim == 3 else 1,
        )
        coarse, total_time, time_step = _reader(half, path)
        U = upscale(params, coarse)
    else:
        U, total_time, time_step = _reader(params, path)

    if config.get_bool("run", "restart_reset_totaltime", False):
        total_time = 0.0
    if config.get_bool("run", "restart_reset_timestep", False):
        time_step = 0

    return jnp.asarray(U), total_time, time_step
