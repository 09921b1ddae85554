"""Device mesh construction for spatial domain decomposition.

Replaces the reference's MPI Cartesian topology layer
(reference: src/utils/mpiUtils/MpiCommCart.h:23-114,
src/hydro/HydroMpiParameters.cpp:76-124): one JAX ``Mesh`` with axes
('z','y','x') takes the place of MPI_Cart_create + neighbor-rank tables;
neighbor addressing happens implicitly through ``lax.ppermute`` rings in
parallel/halo.py; rank->GPU binding disappears (XLA owns placement).

The same INI keys configure the topology: [mpi] mx, my, mz
(HydroMpiParameters.cpp:59-69).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.configmap import ConfigMap
from ..config.params import RunParams

AXIS_X, AXIS_Y, AXIS_Z = "x", "y", "z"


def topology_from_config(config: ConfigMap) -> tuple[int, int, int]:
    """(mx, my, mz) process-grid sizes from the [mpi] section."""
    return (
        config.get_integer("mpi", "mx", 1),
        config.get_integer("mpi", "my", 1),
        config.get_integer("mpi", "mz", 1),
    )


def make_mesh(mx: int = 1, my: int = 1, mz: int = 1, devices=None) -> Mesh:
    """Build a Mesh with named axes ('z','y','x') over mx*my*mz devices."""
    if devices is None:
        devices = jax.devices()
    n = mx * my * mz
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {mx}x{my}x{mz} mesh, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(mz, my, mx)
    return Mesh(grid, (AXIS_Z, AXIS_Y, AXIS_X))


def state_sharding(params: RunParams, mesh: Mesh) -> NamedSharding:
    """Sharding of the global interior-only state [nvar, (Z,) Y, X]."""
    if params.dim == 2:
        spec = P(None, AXIS_Y, AXIS_X)
    else:
        spec = P(None, AXIS_Z, AXIS_Y, AXIS_X)
    return NamedSharding(mesh, spec)


def validate_decomposition(params: RunParams, mx: int, my: int, mz: int) -> None:
    if params.nx % mx or params.ny % my or (params.dim == 3 and params.nz % mz):
        raise ValueError(
            f"grid {params.nx}x{params.ny}x{params.nz} not divisible by "
            f"topology {mx}x{my}x{mz}"
        )
    g = params.ghost_width
    if params.nx // mx < g or params.ny // my < g or (
        params.dim == 3 and params.nz // mz < g
    ):
        raise ValueError("per-shard block smaller than the ghost width")
