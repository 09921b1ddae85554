"""SPMD time stepping: shard_map over a device mesh.

Replaces the reference's distributed Run classes
(reference: src/hydro/HydroRunGodunovMpi.cpp, MHDRunGodunovMpi.cpp): the
*same* single-device step functions run inside shard_map on interior-only
local blocks; halos come from ppermute rings (parallel/halo.py) and the
global dt from ``lax.pmin``-style reductions (the reference's
allReduce(MIN), HydroRunBaseMpi.cpp:501-518).

State representation: global conserved array WITHOUT ghost cells,
[nvar, NZ, NY, NX], sharded over ('z','y','x'). Ghosts are materialized
per-shard per-step; XLA fuses the concatenation into the stencil pipeline.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config.params import RunParams
from ..solvers.godunov import godunov_unsplit_hydro
from ..solvers.step import make_gravity_field
from ..solvers.timestep import compute_inv_dt_hydro, compute_inv_dt_mhd
from .halo import attach_halos, strip_halos
from .mesh import AXIS_X, AXIS_Y, AXIS_Z


def _axis_names(params: RunParams):
    return (AXIS_Z, AXIS_Y, AXIS_X) if params.dim == 3 else (AXIS_Y, AXIS_X)


def _state_spec(params: RunParams):
    if params.dim == 2:
        return P(None, AXIS_Y, AXIS_X)
    return P(None, AXIS_Z, AXIS_Y, AXIS_X)


def make_local_step(params: RunParams, mesh: Mesh | None = None) -> Callable:
    """Per-shard step on an interior-only block: halo fill, global dt,
    one Godunov update. Returns (new_block, dt)."""
    names = _axis_names(params)
    gravity_full = make_gravity_field(params)

    local_dims = None
    if mesh is not None and params.dim == 3:
        mz, my, mx = (mesh.shape.get(k, 1) for k in ("z", "y", "x"))
        local_dims = (params.nz // mz, params.ny // my, params.nx // mx)

    if params.nu > 0 or params.eta > 0:
        raise NotImplementedError(
            "distributed dissipation (nu/eta) is not wired yet: the "
            "dissipative sub-step needs its own halo exchange; run "
            "single-device or wait for round 2"
        )

    from ..core.constants import BoundaryConditionType as BCT

    shear = (
        params.boundary_xmin == BCT.BC_SHEARINGBOX
        or params.boundary_xmax == BCT.BC_SHEARINGBOX
    )
    if shear:
        if not (params.mhd and params.dim == 3 and local_dims is not None):
            raise NotImplementedError(
                "distributed shearing box covers 3D MHD with an explicit mesh"
            )
        if not all(
            b == BCT.BC_PERIODIC
            for b in (params.boundary_ymin, params.boundary_ymax,
                      params.boundary_zmin, params.boundary_zmax)
        ):
            raise NotImplementedError(
                "distributed shearing box assumes periodic y/z "
                "(stratified-z MRI: run single-device this round)"
            )
        from ..solvers.godunov_mhd import godunov_unsplit_mhd as _mhd_update
        from .shear_dist import ShardedShearComm, attach_halos_shear

        comm = ShardedShearComm(params, local_dims)
        lnz, lny, lnx = local_dims
        local_params = params.replace(
            nx=lnx, ny=lny, nz=lnz,
            xmax=params.xmin + lnx * params.dx,
            ymax=params.ymin + lny * params.dy,
            zmax=params.zmin + lnz * params.dz,
        )
        g = params.ghost_width

        def local_step_shear(U, t):
            # dt from a fresh sheared fill at time t (the reference reads
            # one-step-stale ghosts here; same CFL validity)
            Ug0 = attach_halos_shear(local_params, params, U, t, comm)
            inv = compute_inv_dt_mhd(local_params, Ug0)
            for name in names:
                inv = lax.pmax(inv, name)
            dt = params.cfl / inv
            # boundary data at t+dt (MHDRunGodunov.cpp:3551 semantics)
            Ug = attach_halos_shear(local_params, params, U, t + dt, comm)
            # global cell-center x coordinates for the rotating-frame terms
            i = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, lnx + 2 * g), 2
            ).astype(U.dtype)
            xi = lax.axis_index(AXIS_X).astype(U.dtype)
            xpos = params.xmin + params.dx / 2 + (xi * lnx + i - g) * params.dx
            U_new = _mhd_update(
                local_params, Ug, dt, t=t, shear_comm=comm, xpos=xpos
            )
            return strip_halos(local_params, U_new), dt

        return local_step_shear

    if params.mhd:
        from ..solvers.godunov_mhd import godunov_unsplit_mhd

        use_pallas = False
        local_params = params
        if local_dims is not None and params.kernel in ("auto", "pallas"):
            from ..pallas.fused_mhd3d import pallas_supported

            local_params = params.replace(
                nx=local_dims[2],
                ny=local_dims[1],
                nz=local_dims[0],
                xmax=params.xmin + local_dims[2] * params.dx,
                ymax=params.ymin + local_dims[1] * params.dy,
                zmax=params.zmin + local_dims[0] * params.dz,
            )
            backend_ok = params.kernel == "pallas" or (
                jax.default_backend() == "tpu"
            )
            use_pallas = backend_ok and pallas_supported(local_params)

        if use_pallas:
            from ..pallas.fused_mhd3d import make_fused_mhd_update

            fused = make_fused_mhd_update(local_params, tiles=params.pallas_tiles)

            def update(Ug, dt):
                # the fused kernel returns the interior directly: re-wrap to
                # the ghosted contract by padding (the ghosts of the returned
                # block are never read — strip_halos removes them)
                inner = fused(Ug, dt)
                g = params.ghost_width
                return jnp.pad(inner, ((0, 0),) + ((g, g),) * 3)

        else:

            def update(Ug, dt):
                return godunov_unsplit_mhd(local_params, Ug, dt)

        inv_dt_fn = compute_inv_dt_mhd
    else:
        use_pallas = False

        def update(Ug, dt):
            # NOTE: per-shard gravity slices are not implemented yet for the
            # distributed path; uniform gravity broadcasts correctly.
            return godunov_unsplit_hydro(params, Ug, dt, gravity=None)

        inv_dt_fn = compute_inv_dt_hydro

    # halo-exchange / compute overlap (parallel/overlap.py): dt from a thin
    # dedicated exchange, deep interior from the local block while the bulk
    # ppermutes fly, shells patched from the halo'd block. Bitwise-identical
    # to the synchronous path below. The fused Pallas kernel path takes
    # precedence (it consumes the whole ghosted block; splitting it is a
    # round-2 item).
    if (
        params.halo_overlap
        and not use_pallas
        and local_dims is not None
    ):
        from .overlap import (
            _ext_params,
            local_inv_dt,
            overlap_supported,
            overlapped_interior_update,
        )

        if overlap_supported(params, local_dims):
            if params.mhd:
                from ..solvers.godunov_mhd import mhd_3d_interior_update as _region
            else:
                from ..solvers.godunov import hydro_3d_interior_update as _region
            g = params.ghost_width

            def local_step_overlapped(U, t):
                inv = local_inv_dt(params, U)
                for name in names:
                    inv = lax.pmax(inv, name)
                dt = params.cfl / inv
                Ug = attach_halos(params, U)  # bulk exchange — overlaps deep

                def upd(win, ext):
                    return _region(_ext_params(params, ext), win, dt,
                                   margin=(g, g, g))

                return overlapped_interior_update(params, U, Ug, upd), dt

            return local_step_overlapped

    def local_step(U, t):
        Ug = attach_halos(params, U)
        inv = inv_dt_fn(params, Ug)
        for name in names:
            inv = lax.pmax(inv, name)
        dt = params.cfl / inv
        U_new = update(Ug, dt)
        return strip_halos(params, U_new), dt

    return local_step


def _make_sharded_advance_shear(params: RunParams, mesh: Mesh) -> Callable:
    """Shearing-box advance: the loop carries the GHOSTED local block so the
    dt reduction reads one-fill-stale ghosts — exactly the single-device /
    reference ordering (compute_dt before make_boundaries); the fresh
    sheared fill at t+dt happens inside the step."""
    from ..core.constants import BoundaryConditionType as BCT
    from ..solvers.godunov_mhd import godunov_unsplit_mhd as _mhd_update
    from .shear_dist import ShardedShearComm, attach_halos_shear

    mz, my, mx = (mesh.shape.get(k, 1) for k in ("z", "y", "x"))
    local_dims = (params.nz // mz, params.ny // my, params.nx // mx)
    lnz, lny, lnx = local_dims
    comm = ShardedShearComm(params, local_dims)
    local_params = params.replace(
        nx=lnx, ny=lny, nz=lnz,
        xmax=params.xmin + lnx * params.dx,
        ymax=params.ymin + lny * params.dy,
        zmax=params.zmin + lnz * params.dz,
    )
    g = params.ghost_width
    names = _axis_names(params)
    spec = _state_spec(params)
    t_end = params.t_end

    def local_advance(U, t, n_steps):
        i = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, lnx + 2 * g), 2
        ).astype(U.dtype)
        xi = lax.axis_index(AXIS_X).astype(U.dtype)
        xpos = params.xmin + params.dx / 2 + (xi * lnx + i - g) * params.dx

        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            Ug, t_c, k = carry
            inv = compute_inv_dt_mhd(local_params, Ug)
            for name in names:
                inv = lax.pmax(inv, name)
            dt = params.cfl / inv
            interior = strip_halos(local_params, Ug)
            Ub = attach_halos_shear(local_params, params, interior, t_c + dt,
                                    comm)
            U_new = _mhd_update(
                local_params, Ub, dt, t=t_c, shear_comm=comm, xpos=xpos
            )
            return (U_new, t_c + dt, k + 1)

        Ug0 = attach_halos_shear(local_params, params, U, t, comm)
        Ug_f, t_f, k_f = lax.while_loop(
            cond, body, (Ug0, t, jnp.array(0, jnp.int32))
        )
        return strip_halos(local_params, Ug_f), t_f, k_f

    sharded = shard_map(
        local_advance,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_advance_n(params: RunParams, mesh: Mesh) -> Callable:
    """Jitted ``advance_n(U_global, t, n) -> (U_global, t, steps)`` where
    U_global is the interior-only sharded state. The while_loop lives inside
    shard_map so a whole output interval runs as one SPMD program."""
    from ..core.constants import BoundaryConditionType as BCT

    if (
        params.boundary_xmin == BCT.BC_SHEARINGBOX
        or params.boundary_xmax == BCT.BC_SHEARINGBOX
    ):
        return _make_sharded_advance_shear(params, mesh)

    local_step = make_local_step(params, mesh)
    spec = _state_spec(params)
    t_end = params.t_end

    def local_advance(U, t, n_steps):
        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            U_c, t_c, k = carry
            U_n, dt = local_step(U_c, t_c)
            return (U_n, t_c + dt, k + 1)

        return lax.while_loop(cond, body, (U, t, jnp.array(0, jnp.int32)))

    sharded = shard_map(
        local_advance,
        mesh=mesh,
        in_specs=(spec, P(), P()),
        out_specs=(spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_step(params: RunParams, mesh: Mesh) -> Callable:
    """Jitted single step on the sharded global state: (U) -> (U, dt)."""
    local_step = make_local_step(params, mesh)
    spec = _state_spec(params)
    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_global_state(params: RunParams, mesh: Mesh, U_ghosted) -> jax.Array:
    """Distribute a host-side ghosted global state: strip ghosts, device_put
    with the mesh sharding."""
    from .mesh import state_sharding

    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    return jax.device_put(jnp.asarray(U_ghosted)[sl], state_sharding(params, mesh))
