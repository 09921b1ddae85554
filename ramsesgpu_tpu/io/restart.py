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


# --------------------------------------------------------------------- #
# Problem-specific post-restart fixups.
#
# The reference re-runs problem-specific setup after loading a checkpoint
# (restart_run_extra_work, reference: src/hydro/MHDRunBase.cpp:3215-3228,
# HydroRunBaseMpi.cpp:10374-10386): for MRI runs with gravity enabled it
# re-generates the static gravity field, which is not part of the
# checkpoint.  Here the registry maps a lower-cased problem name to
# fn(params, config, U) -> U; entries may patch the freshly-loaded state
# or re-derive auxiliary fields.
RESTART_EXTRA_WORK: dict = {}


def register_restart_extra_work(problem: str, fn) -> None:
    RESTART_EXTRA_WORK[problem.lower()] = fn


def _mri_restart_fixup(params: RunParams, config: ConfigMap, U):
    """Re-derive the static gravity field for (stratified) MRI restarts.

    In this framework the gravity field is a pure function of
    (params, config) rebuilt at solver-construction time, so — unlike the
    reference, whose h_gravity array lives outside the checkpoint — there
    is no stale state to patch.  Re-deriving it here still validates that
    the restart grid/config can produce a finite field (catching e.g. a
    restart_upscale that desynced the mesh from [gravity] settings).
    """
    import numpy as np

    from ..solvers.step import make_gravity_field

    field = make_gravity_field(params, config)
    if field is not None and not bool(np.isfinite(np.asarray(field)).all()):
        raise ValueError(
            "post-restart gravity field is non-finite; check [gravity] / "
            "mesh settings against the restart file"
        )
    return U


for _name in ("mri",):
    register_restart_extra_work(_name, _mri_restart_fixup)


def run_restart_extra_work(params: RunParams, config: ConfigMap, U):
    """Apply the problem's registered fixup. Returns (U, ran: bool)."""
    fn = RESTART_EXTRA_WORK.get(str(params.problem).lower())
    if fn is None:
        return U, False
    return fn(params, config, U), True


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
    if path.suffix == ".zarr":
        # collective single-store snapshot (io/sharded.output_zarr_sharded)
        from .sharded import input_zarr as _reader
    elif path.suffix == ".nc":
        from .netcdf import input_netcdf as _reader
    elif path.name.endswith(".pieces.json"):
        # multi-host piece-set snapshot (io/sharded.py manifest); the
        # manifest's format field picks the piece reader (HDF5 vs NetCDF)
        import json as _json

        fmt = _json.loads(path.read_text()).get("format", "")
        if fmt == "ramsesgpu_tpu-netcdf-pieces":
            from .sharded import input_netcdf_pieces as _reader
        else:
            from .sharded import input_hdf5_pieces as _reader
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

    U, _ran = run_restart_extra_work(params, config, jnp.asarray(U))
    return U, total_time, time_step
