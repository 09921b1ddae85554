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


def _make_pallas_deep_fn(params: RunParams, local_dims):
    """Fused-kernel deep-region update for the overlapped sharded step, or
    None when the configuration/backend is outside kernel coverage.

    Returns ``deep(U_local, dt) -> [nvar, lnz-2g, lny-2g, lnx-2g]``. The
    deep extents rarely hit the kernel's tile-divisibility constraints, so
    the kernel is built for extents rounded UP to sublane multiples and the
    local block padded with junk rows: an output cell k consumes window rows
    [k, k+2g], so every KEPT cell (k < ln-2g) reads only real local data —
    the junk feeds exactly the rows the slice drops.
    """
    import jax as _jax

    from ..core.constants import BoundaryConditionType as BCT

    backend_ok = params.kernel == "pallas" or (
        params.kernel == "auto" and _jax.default_backend() == "tpu"
    )
    # pallas INTERPRET mode (CPU tests) also counts as a viable backend
    from .. import pallas as _pkg

    if not (backend_ok or getattr(_pkg, "INTERPRET", False)):
        return None
    if params.kernel not in ("auto", "pallas") or params.dim != 3:
        return None

    g = params.ghost_width
    lnz, lny, lnx = local_dims
    dzp = -(-(lnz - 2 * g) // 8) * 8
    dyp = -(-(lny - 2 * g) // 8) * 8
    dxp = lnx - 2 * g
    if dzp <= 0 or dyp <= 0 or dxp <= 0:
        return None
    # BC_COPY markers force the kernel's ghosted-x mode: the local block's
    # in-row wrap is NOT the local boundary condition under sharding
    deep_params = params.replace(
        nz=dzp, ny=dyp, nx=dxp,
        zmax=params.zmin + dzp * params.dz,
        ymax=params.ymin + dyp * params.dy,
        xmax=params.xmin + dxp * params.dx,
        boundary_xmin=BCT.BC_COPY, boundary_xmax=BCT.BC_COPY,
    )
    try:
        if params.mhd:
            from ..pallas.fused_mhd3d import make_fused_mhd_update, pallas_supported

            if not pallas_supported(deep_params.replace(
                boundary_xmin=params.boundary_xmin,
                boundary_xmax=params.boundary_xmax,
            )):
                return None
            fused = make_fused_mhd_update(deep_params)
        else:
            from ..pallas.fused_hydro3d import (
                hydro_pallas_supported,
                make_fused_hydro_update,
            )

            if not hydro_pallas_supported(deep_params):
                return None
            fused = make_fused_hydro_update(deep_params)
    except ValueError:
        return None

    pad_z = dzp + 2 * g - lnz
    pad_y = dyp + 2 * g - lny

    def deep(U_local, dt):
        W = jnp.pad(U_local, ((0, 0), (0, pad_z), (0, pad_y), (0, 0)))
        out = fused(W, dt)
        return out[:, : lnz - 2 * g, : lny - 2 * g, :]

    return deep


def make_local_step(
    params: RunParams, mesh: Mesh | None = None, config=None
) -> tuple[Callable, bool]:
    """Per-shard step on an interior-only block: halo fill, global dt, one
    Godunov update, then (if nu/eta > 0) a dedicated halo exchange + the
    dissipative sub-step. Returns ``(local_step(U, G, t) -> (U', dt),
    wants_gravity)`` — G is the shard's static ghosted gravity window
    (built by _gravity_windows) or None.
    """
    names = _axis_names(params)
    wants_gravity = make_gravity_field(params, config) is not None
    dissip = params.nu > 0 or params.eta > 0

    local_dims = None
    if mesh is not None and params.dim == 3:
        mz, my, mx = (mesh.shape.get(k, 1) for k in ("z", "y", "x"))
        local_dims = (params.nz // mz, params.ny // my, params.nx // mx)

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
        if not (
            params.boundary_ymin == BCT.BC_PERIODIC
            and params.boundary_ymax == BCT.BC_PERIODIC
            and all(
                b in (BCT.BC_PERIODIC, BCT.BC_Z_STRATIFIED)
                for b in (params.boundary_zmin, params.boundary_zmax)
            )
        ):
            raise NotImplementedError(
                "distributed shearing box assumes periodic y and "
                "periodic/stratified z"
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

        def local_step_shear(U, G, t):
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
                local_params, Ug, dt, gravity=G, t=t, shear_comm=comm,
                xpos=xpos, apply_dissipation=False,
            )
            U_int = strip_halos(local_params, U_new)
            if dissip:
                from ..solvers.dissipation import apply_dissipation_mhd

                Ub2 = attach_halos_shear(local_params, params, U_int,
                                         t + dt, comm)
                U_int = strip_halos(
                    local_params, apply_dissipation_mhd(local_params, Ub2, dt)
                )
            return U_int, dt

        return local_step_shear, wants_gravity

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
            from .. import pallas as _pkg

            backend_ok = (
                params.kernel == "pallas"
                or jax.default_backend() == "tpu"
                or getattr(_pkg, "INTERPRET", False)
            )
            # dissipative runs pair the Godunov kernel with the fused
            # dissipation kernel (the per-shard dissipate below)
            use_pallas = (
                backend_ok and not wants_gravity
                and pallas_supported(local_params.replace(nu=0.0, eta=0.0))
            )

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

            def update(Ug, dt, G):
                return godunov_unsplit_mhd(
                    local_params, Ug, dt, gravity=G, apply_dissipation=False
                )

        if use_pallas:
            _u = update

            def update(Ug, dt, G):  # noqa: F811 — pallas path has no gravity
                return _u(Ug, dt)

        inv_dt_fn = compute_inv_dt_mhd

        # dissipative sub-step: fused kernel per shard when covered (the
        # ghosted-block contract matches; the sharded fill rebuilds ghost
        # faces so no kept-face handling is needed here)
        fused_dissip = None
        if dissip and local_dims is not None and use_pallas:
            from ..pallas.fused_dissip3d import (
                dissip_pallas_supported,
                make_fused_mhd_dissipation,
            )

            if dissip_pallas_supported(local_params):
                try:
                    fused_dissip = make_fused_mhd_dissipation(local_params)
                except ValueError:
                    fused_dissip = None

        if fused_dissip is not None:
            gd = params.ghost_width
            _isl = (slice(None),) + (slice(gd, -gd),) * 3

            def dissipate(Ug2, dt):
                return Ug2.at[_isl].set(fused_dissip(Ug2, dt))

        else:

            def dissipate(Ug2, dt):
                from ..solvers.dissipation import apply_dissipation_mhd

                return apply_dissipation_mhd(params, Ug2, dt)

    else:
        use_pallas = False

        def update(Ug, dt, G):
            return godunov_unsplit_hydro(params, Ug, dt, gravity=G)

        inv_dt_fn = compute_inv_dt_hydro

        def dissipate(Ug2, dt):
            from ..solvers.dissipation import apply_viscosity

            return apply_viscosity(params, Ug2, dt)

    # halo-exchange / compute overlap (parallel/overlap.py): dt from a thin
    # dedicated exchange, deep interior from the local block while the bulk
    # ppermutes fly, shells patched from the halo'd block. Bitwise-identical
    # to the synchronous path below. When the fused Pallas kernel covers the
    # configuration, it computes the deep region (the FLOP bulk) while the
    # thin shells stay whole-array — kernel speed AND overlap compose.
    if (
        params.halo_overlap
        and not wants_gravity
        and not dissip
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
            deep_kernel = _make_pallas_deep_fn(params, local_dims)

            def local_step_overlapped(U, G, t):
                inv = local_inv_dt(params, U)
                for name in names:
                    inv = lax.pmax(inv, name)
                dt = params.cfl / inv
                Ug = attach_halos(params, U)  # bulk exchange — overlaps deep

                def upd(win, ext):
                    return _region(_ext_params(params, ext), win, dt,
                                   margin=(g, g, g))

                dfn = (
                    (lambda ul: deep_kernel(ul, dt))
                    if deep_kernel is not None else None
                )
                return (
                    overlapped_interior_update(params, U, Ug, upd, deep_fn=dfn),
                    dt,
                )

            return local_step_overlapped, False

    # z-slab pipelining under distribution: bound the per-shard scratch by
    # running the (unchanged) local update on z-windows of the halo'd block
    # — the composition the reference implements as the Zslab+Mpi class
    # quartet (MHDRunGodunovZslabMpi.cpp:479-805: halo exchange outside,
    # slab loop inside).  The fused Pallas kernel already streams VMEM-sized
    # windows, so zSlabNb only drives the whole-array path.
    use_zslab = (
        params.dim == 3 and params.z_slab_nb > 1 and not use_pallas
    )
    if use_zslab and local_dims is not None:
        lnz = local_dims[0]
        if lnz % params.z_slab_nb:
            raise ValueError(
                f"local nz={lnz} (nz={params.nz} over mz shards) not "
                f"divisible by zSlabNb={params.z_slab_nb}"
            )

    def local_step(U, G, t):
        Ug = attach_halos(params, U)
        inv = inv_dt_fn(params, Ug)
        for name in names:
            inv = lax.pmax(inv, name)
        dt = params.cfl / inv
        if use_zslab:
            from ..solvers.zslab import zslab_apply

            if G is None:
                U_new = zslab_apply(
                    params, Ug, lambda w: update(w, dt, None),
                    params.z_slab_nb,
                )
            else:
                U_new = zslab_apply(
                    params, Ug, lambda w, gw: update(w, dt, gw),
                    params.z_slab_nb, aux=(G,),
                )
        else:
            U_new = update(Ug, dt, G)
        U_int = strip_halos(params, U_new)
        if dissip:
            # dedicated exchange for the dissipative sub-step (the reference
            # refills boundaries before it, HydroRunGodunov.cpp dissipative
            # phase); single-device boundary fills would be wrong here
            Ug2 = attach_halos(params, U_int)
            U_int = strip_halos(params, dissipate(Ug2, dt))
        return U_int, dt

    return local_step, wants_gravity


def _make_sharded_advance_shear(
    params: RunParams, mesh: Mesh, config=None
) -> Callable:
    """Shearing-box advance: the loop carries the GHOSTED local block so the
    dt reduction reads one-fill-stale ghosts — exactly the single-device /
    reference ordering (compute_dt before make_boundaries); the fresh
    sheared fill at t+dt happens inside the step. Stratified MRI (static
    vertical gravity + BC_Z_STRATIFIED) is covered: gravity arrives as the
    per-shard ghosted windows of _gravity_windows, the stratified z fill
    rides inside attach_halos_shear."""
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
    wants_gravity = make_gravity_field(params, config) is not None
    Gdev, gspec = (
        _gravity_windows(params, config, mesh) if wants_gravity
        else (None, None)
    )

    # fused shear kernel per shard when covered (pallas/fused_mhd3d): the
    # rotating-frame pipeline runs in the kernel with this shard's global
    # x offset; the conservative flux/emfY remap at the DOMAIN x-faces is
    # applied as a post-correction through the comm collectives (identity
    # deltas on interior shards)
    fused_shear = None
    fused_dissip = None
    if params.kernel in ("auto", "pallas"):
        from .. import pallas as _pkg
        from ..pallas.fused_mhd3d import (
            make_fused_mhd_shear,
            pallas_shear_supported,
        )

        backend_ok = (
            params.kernel == "pallas"
            or jax.default_backend() == "tpu"
            or getattr(_pkg, "INTERPRET", False)
        )
        gz_profile = None
        if wants_gravity:
            # stratified MRI: the analytic vertical profile runs in-kernel
            # when the registry field provably matches it (solvers/step.py)
            from ..solvers.step import _mri_gz_profile

            gz_profile = _mri_gz_profile(
                params, config, make_gravity_field(params, config)
            )
        if (
            backend_ok
            and pallas_shear_supported(
                local_params, stratified=wants_gravity
            )
            and (not wants_gravity or gz_profile is not None)
        ):
            try:
                fused_shear = make_fused_mhd_shear(
                    local_params, gravity_z=gz_profile
                )
            except ValueError:
                fused_shear = None
        if backend_ok and (params.nu > 0 or params.eta > 0):
            from ..pallas.fused_dissip3d import (
                dissip_pallas_supported,
                make_fused_mhd_dissipation,
            )

            if dissip_pallas_supported(local_params):
                try:
                    fused_dissip = make_fused_mhd_dissipation(local_params)
                except ValueError:
                    fused_dissip = None

    def local_advance(U, G, t, n_steps):
        i = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, lnx + 2 * g), 2
        ).astype(U.dtype)
        xi = lax.axis_index(AXIS_X).astype(U.dtype)
        xpos = params.xmin + params.dx / 2 + (xi * lnx + i - g) * params.dx
        x0_shard = params.xmin + xi * lnx * params.dx
        zi_ax = lax.axis_index(AXIS_Z).astype(U.dtype)
        z0_shard = params.zmin + zi_ax * lnz * params.dz

        def kernel_update(Ub, dt, t_c):
            from ..core.constants import IA, IC, ID
            from .halo import _ring_shift

            new_int, fpl, eypl, ezpl = fused_shear(Ub, dt, x0_shard,
                                                   z0_shard)
            fmin_r, fmax_r = comm.remap_pair(
                local_params, fpl[0], fpl[1], t_c, dt
            )
            emin_r, emax_r = comm.remap_pair(
                local_params, eypl[0], eypl[1], t_c, dt
            )
            d_emin = emin_r - eypl[0]
            d_emax = emax_r - eypl[1]
            dtdx, dtdz = dt / params.dx, dt / params.dz
            xi_i = lax.axis_index(AXIS_X)
            mxs = lax.axis_size(AXIS_X)

            col_lo = new_int[:, :, :, 0]
            col_hi = new_int[:, :, :, lnx - 1]
            rho_lo = col_lo[ID] + dtdx * (fmin_r - fpl[0])
            rho_hi = col_hi[ID] - dtdx * (fmax_r - fpl[1])
            # density floor only on the domain-edge columns (the remap
            # deltas vanish on interior shards, the floor must not apply)
            col_lo = col_lo.at[ID].set(jnp.where(
                xi_i == 0, jnp.maximum(rho_lo, params.smallr), rho_lo))
            col_hi = col_hi.at[ID].set(jnp.where(
                xi_i == mxs - 1, jnp.maximum(rho_hi, params.smallr), rho_hi))
            # dbx = -dtdz*(d_emf_y(z+1) - d_emf_y) at the xmin face; the
            # z+1 row at the local top comes over the z ring
            nxt = _ring_shift(d_emin[0:1, :], AXIS_Z, up=False)
            d_emin_zp1 = jnp.concatenate([d_emin[1:], nxt], axis=0)
            col_lo = col_lo.at[IA].add(-dtdz * (d_emin_zp1 - d_emin))
            # dbz = +dtdx*(d_emf_y(x+1) - d_emf_y) at the two border cells
            col_lo = col_lo.at[IC].add(-dtdx * d_emin)
            col_hi = col_hi.at[IC].add(dtdx * d_emax)

            inner = jnp.concatenate(
                [col_lo[..., None], new_int[:, :, :, 1 : lnx - 1],
                 col_hi[..., None]],
                axis=-1,
            )
            sl = (slice(None),) + (slice(g, -g),) * 3
            return Ub.at[sl].set(inner)

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
            if fused_shear is not None:
                U_new = kernel_update(Ub, dt, t_c)
            else:
                U_new = _mhd_update(
                    local_params, Ub, dt, gravity=G, t=t_c, shear_comm=comm,
                    xpos=xpos, apply_dissipation=False,
                )
            if params.nu > 0 or params.eta > 0:
                U_new = attach_halos_shear(
                    local_params, params,
                    strip_halos(local_params, U_new), t_c + dt, comm,
                )
                if fused_dissip is not None:
                    isl = (slice(None),) + (slice(g, -g),) * 3
                    U_new = U_new.at[isl].set(fused_dissip(U_new, dt))
                else:
                    from ..solvers.dissipation import apply_dissipation_mhd

                    U_new = apply_dissipation_mhd(local_params, U_new, dt)
            return (U_new, t_c + dt, k + 1)

        Ug0 = attach_halos_shear(local_params, params, U, t, comm)
        Ug_f, t_f, k_f = lax.while_loop(
            cond, body, (Ug0, t, jnp.array(0, jnp.int32))
        )
        return strip_halos(local_params, Ug_f), t_f, k_f

    if Gdev is None:
        sharded = shard_map(
            lambda U, t, n: local_advance(U, None, t, n),
            mesh=mesh,
            in_specs=(spec, P(), P()),
            out_specs=(spec, P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    sharded = jax.jit(shard_map(
        local_advance,
        mesh=mesh,
        in_specs=(spec, gspec, P(), P()),
        out_specs=(spec, P(), P()),
        check_vma=False,
    ))

    def advance(U, t, n_steps):
        return sharded(U, Gdev, t, n_steps)

    return advance


def _gravity_windows(params: RunParams, config, mesh: Mesh):
    """Per-shard GHOSTED gravity windows, packed into one shardable array:
    block (iz, iy, ix) of shape [dim, ln+2g per axis] holds that shard's
    ghosted slice of the global static field (gravity is a coordinate
    function — its ghost values come from ghost coordinates, NOT from
    periodic wraps, so no runtime exchange is needed or wanted).

    Returns (device_array, PartitionSpec) or (None, None)."""
    gf = make_gravity_field(params, config)
    if gf is None:
        return None, None
    import itertools

    import numpy as np
    from jax.sharding import NamedSharding

    g = params.ghost_width
    gf = np.asarray(gf)
    names = ("z", "y", "x")[3 - params.dim :]
    mcounts = [mesh.shape.get(k, 1) for k in names]
    sizes = ([params.nz] if params.dim == 3 else []) + [params.ny, params.nx]
    locs = [n // m for n, m in zip(sizes, mcounts)]
    out = np.zeros(
        [gf.shape[0]] + [m * (ln + 2 * g) for m, ln in zip(mcounts, locs)],
        gf.dtype,
    )
    for idx in itertools.product(*[range(m) for m in mcounts]):
        src = tuple(slice(i * ln, i * ln + ln + 2 * g)
                    for i, ln in zip(idx, locs))
        dst = tuple(slice(i * (ln + 2 * g), (i + 1) * (ln + 2 * g))
                    for i, ln in zip(idx, locs))
        out[(slice(None),) + dst] = gf[(slice(None),) + src]
    spec = P(None, *names)
    arr = jax.device_put(jnp.asarray(out), NamedSharding(mesh, spec))
    return arr, spec


def make_sharded_advance_n(
    params: RunParams, mesh: Mesh, config=None
) -> Callable:
    """Jitted ``advance_n(U_global, t, n) -> (U_global, t, steps)`` where
    U_global is the interior-only sharded state. The while_loop lives inside
    shard_map so a whole output interval runs as one SPMD program."""
    from ..core.constants import BoundaryConditionType as BCT

    if (
        params.boundary_xmin == BCT.BC_SHEARINGBOX
        or params.boundary_xmax == BCT.BC_SHEARINGBOX
    ):
        return _make_sharded_advance_shear(params, mesh, config)

    local_step, wants_gravity = make_local_step(params, mesh, config)
    spec = _state_spec(params)
    t_end = params.t_end
    Gdev, gspec = (
        _gravity_windows(params, config, mesh) if wants_gravity
        else (None, None)
    )

    def local_advance(U, G, t, n_steps):
        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            U_c, t_c, k = carry
            U_n, dt = local_step(U_c, G, t_c)
            return (U_n, t_c + dt, k + 1)

        return lax.while_loop(cond, body, (U, t, jnp.array(0, jnp.int32)))

    if Gdev is None:
        sharded = shard_map(
            lambda U, t, n: local_advance(U, None, t, n),
            mesh=mesh,
            in_specs=(spec, P(), P()),
            out_specs=(spec, P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    sharded = jax.jit(shard_map(
        local_advance,
        mesh=mesh,
        in_specs=(spec, gspec, P(), P()),
        out_specs=(spec, P(), P()),
        check_vma=False,
    ))

    def advance(U, t, n_steps):
        return sharded(U, Gdev, t, n_steps)

    return advance


def make_sharded_forced_advance_n(params: RunParams, mesh: Mesh, config):
    """Turbulence-forced sharded advance: ``(U, fstate, t, n) -> (U, fstate,
    t, k)`` like solvers.step.make_forced_advance_n, distributed.

    Both forcing flavors map naturally onto the mesh (replacing the
    reference's MPI forcing plumbing, HydroRunBaseMpi/Forcing_OU MPI paths):
    - static-spectrum field and the OU per-mode cosine basis are coordinate
      functions — their per-shard interior slices shard like the state;
    - the energy-injection normalization's two sums become lax.psum;
    - the OU mode update is tiny replicated math: every shard carries the
      same PRNG key and evolves identical mode amplitudes.
    Returns (advance, fstate0)."""
    import numpy as np
    from jax.sharding import NamedSharding

    from ..ops import forcing as fz
    from ..core.constants import ID, IP, IU, IV, IW

    g = params.ghost_width
    names = _axis_names(params)
    spec = _state_spec(params)
    t_end = params.t_end
    local_step, wants_gravity = make_local_step(params, mesh, config)
    # forcing + static gravity compose exactly like the reference's MPI
    # classes (forcing/gravity wrappers on HydroRunBase.h:80-359 inherited
    # by the Mpi hierarchy): gravity rides in the step, forcing after it
    Gdev, gspec = (
        _gravity_windows(params, config, mesh) if wants_gravity
        else (None, None)
    )
    isl = (slice(g, -g),) * 3

    if params.problem == "turbulence":
        mach = config.get_float("turbulence", "machNumber", 0.0)
        edot = fz.default_edot(params, config)
        F_int = jnp.asarray(fz.turbulence_init_field(params, mach))[
            (slice(None),) + isl
        ]
        F_dev = jax.device_put(F_int, NamedSharding(mesh, spec))
        fstate0 = {}

        def force(U, F, fstate, dt):
            rho = U[ID]
            u, v, w = U[IU] / rho, U[IV] / rho, U[IW] / rho
            fu, fv, fw = F[0], F[1], F[2]
            s0 = lax.psum(jnp.sum(rho * (u * fu + v * fv + w * fw)), names)
            s1 = lax.psum(jnp.sum(rho * (fu * fu + fv * fv + fw * fw)), names)
            n_cells = params.nx * params.ny * params.nz
            if edot == 0:
                norm = jnp.zeros_like(s0)
            else:
                norm = (
                    jnp.sqrt(s0 * s0 + s1 * dt * edot * 2 * n_cells) - s0
                ) / s1
            dE = (
                u * fu * norm + 0.5 * (fu * norm) ** 2
                + v * fv * norm + 0.5 * (fv * norm) ** 2
                + w * fw * norm + 0.5 * (fw * norm) ** 2
            )
            U = U.at[IP].add(dE)
            U = U.at[IU].add(rho * fu * norm)
            U = U.at[IV].add(rho * fv * norm)
            U = U.at[IW].add(rho * fw * norm)
            return U, fstate

    elif params.problem == "turbulence-Ornstein-Uhlenbeck":
        fp = fz.OUForcingParams.from_config(config)
        fstate0 = fz.init_ou_forcing(fp)
        # per-shard interior slice of the global mode-phase basis
        basis_g = np.asarray(
            fz.ou_phase_basis(params, fstate0, np.float32)
        )[(slice(None),) + isl]
        F_dev = jax.device_put(
            jnp.asarray(basis_g),
            NamedSharding(mesh, P(None, *(("z",) if params.dim == 3 else ()),
                                  "y", "x")),
        )

        def force(U, F, fstate, dt):
            fstate = fz.update_forcing_field_mode(params, fp, fstate, dt)
            rho = U[ID]
            A = jnp.einsum(
                "dm,m...->d...", fstate["forcingField"].astype(U.dtype), F
            )
            eint = U[IP] - 0.5 * (U[IU] ** 2 + U[IV] ** 2 + U[IW] ** 2) / rho
            mu = U[IU] + A[0] * dt * rho
            mv = U[IV] + A[1] * dt * rho
            mw = U[IW] + A[2] * dt * rho
            e_new = eint + 0.5 * (mu * mu + mv * mv + mw * mw) / rho
            return (
                U.at[IU].set(mu).at[IV].set(mv).at[IW].set(mw).at[IP].set(e_new),
                fstate,
            )

    else:
        raise ValueError(f"not a forced problem: {params.problem!r}")

    def local_advance(U, G, F, fstate, t, n_steps):
        def cond(carry):
            _, _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            U_c, f_c, t_c, k = carry
            U_n, dt = local_step(U_c, G, t_c)
            U_n, f_n = force(U_n, F, f_c, dt)
            return (U_n, f_n, t_c + dt, k + 1)

        U_f, f_f, t_f, k_f = lax.while_loop(
            cond, body, (U, fstate, t, jnp.array(0, jnp.int32))
        )
        return U_f, f_f, t_f, k_f

    fspec = jax.tree.map(lambda _: P(), fstate0)
    Fspec = P(None, *(("z",) if params.dim == 3 else ()), "y", "x")
    if Gdev is None:
        sharded = jax.jit(shard_map(
            lambda U, F, fstate, t, n: local_advance(U, None, F, fstate,
                                                     t, n),
            mesh=mesh,
            in_specs=(spec, Fspec, fspec, P(), P()),
            out_specs=(spec, fspec, P(), P()),
            check_vma=False,
        ))

        def advance(U, fstate, t, n_steps):
            return sharded(U, F_dev, fstate, t, n_steps)
    else:
        sharded = jax.jit(shard_map(
            local_advance,
            mesh=mesh,
            in_specs=(spec, gspec, Fspec, fspec, P(), P()),
            out_specs=(spec, fspec, P(), P()),
            check_vma=False,
        ))

        def advance(U, fstate, t, n_steps):
            return sharded(U, Gdev, F_dev, fstate, t, n_steps)

    return advance, fstate0


def make_sharded_step(params: RunParams, mesh: Mesh, config=None) -> Callable:
    """Jitted single step on the sharded global state: (U, t) -> (U, dt)."""
    local_step, wants_gravity = make_local_step(params, mesh, config)
    spec = _state_spec(params)
    Gdev, gspec = (
        _gravity_windows(params, config, mesh) if wants_gravity
        else (None, None)
    )
    if Gdev is None:
        sharded = jax.jit(shard_map(
            lambda U, t: local_step(U, None, t),
            mesh=mesh,
            in_specs=(spec, P()),
            out_specs=(spec, P()),
            check_vma=False,
        ))
        return sharded

    sharded = jax.jit(shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, gspec, P()),
        out_specs=(spec, P()),
        check_vma=False,
    ))

    def step(U, t):
        return sharded(U, Gdev, t)

    return step


def shard_global_state(params: RunParams, mesh: Mesh, U_ghosted) -> jax.Array:
    """Distribute a host-side ghosted global state: strip ghosts, lay it
    over the mesh sharding.

    Multi-process safe: under ``jax.distributed`` each process holds the
    same host-side global state (problem inits are deterministic; restart
    readers load the same file — the reference's per-rank hyperslab read,
    HydroRunBaseMpi.cpp:7505-7862) and contributes only its addressable
    shards via ``make_array_from_callback``."""
    import numpy as np

    from .mesh import state_sharding

    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    sharding = state_sharding(params, mesh)
    if jax.process_count() > 1:
        interior = np.asarray(U_ghosted)[sl]
        return jax.make_array_from_callback(
            interior.shape, sharding, lambda idx: interior[idx]
        )
    return jax.device_put(jnp.asarray(U_ghosted)[sl], sharding)
