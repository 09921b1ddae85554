"""Packed-layout shearing-box (MRI) step: x-ghost-free main kernel + strips.

The round-1 fused shear kernel (fused_mhd3d.make_fused_mhd_shear) DMAs
x-ghosted windows: nx + 2*ghost rows pad up to the next lane multiple, so at
the flagship nx=128 every vector op runs at ~half lane utilization (134 of
256 lanes live). Here the MRI step instead runs on the SAME x-ghost-free
packed layout as the periodic advance loop (packed_io.py):

  P [nvar, nz+2g, ny+2YB, nx]   z/y wrap-ghosted (periodic), x ghost-free

- The MAIN kernel is the periodic packed-IO kernel with the rotating-frame
  trace/EMF terms (xpos from a static in-kernel iota): in-row rolls wrap x
  periodically, which is WRONG only within ghost_width columns of the two
  x borders (stencil reach), and exactly right everywhere else.
- A thin STRIP pass (plain XLA — 18 of nx columns, bandwidth-bound, no
  Mosaic involvement) recomputes the 2*g border columns from properly
  sheared ghost slabs, and extracts the x-face flux/EMF planes the
  conservative shear remap needs.
- The remap corrections, the density floor, and the CT update of the KEPT
  Bx face (the interior's own face at x=nx, preserved by the sheared fill —
  solvers/shear.py:87-95) are applied to the strip columns, and the
  corrected columns replace the main kernel's contaminated border columns
  (one concat along lanes).

Reference behavior mirrored: MHDRunGodunov.cpp:3445-3560 (sheared fill),
shearingBox_utils.cuh:47-170+428-492 (flux/emfY remap + density floor),
mhd_ct_update.cuh:124-213 via the extended CT range that also updates the
kept Bx face (solvers/godunov_mhd._godunov_unsplit_mhd_3d `ct`).

The packed carry is (P, kept_bx [nz, ny]); dt is the same slice-based
reduction as the ghosted step (bit-identical: the only ghost data dt reads
are the periodic y/z wraps, present in P, and the kept Bx face).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from .packed_io import YB, make_packed_io_step

_X, _Y, _Z = -1, -2, -3


def shear_packed_supported(
    params: RunParams, stratified: bool = False
) -> bool:
    """MRI on the packed layout (ideal, viscous/resistive, or — with
    ``stratified=True`` — BC_Z_STRATIFIED + in-kernel analytic gravity):
    shear-periodic x, periodic y, float32, lane-exact nx, tile-divisible
    ny/nz. Non-matching gravity fields keep the round-1 ghosted-window
    path (fused_mhd3d.make_pallas_shear_step_fn)."""
    from ..core.constants import BoundaryConditionType as BCT

    bz, by = params.pallas_tiles or (8, 32)
    z_ok = (
        params.boundary_zmin == BCT.BC_PERIODIC
        and params.boundary_zmax == BCT.BC_PERIODIC
    ) or (
        stratified
        and params.boundary_zmin == BCT.BC_Z_STRATIFIED
        and params.boundary_zmax == BCT.BC_Z_STRATIFIED
    )
    return (
        params.dim == 3
        and params.mhd
        and params.omega0 > 0
        and params.boundary_xmin == BCT.BC_SHEARINGBOX
        and params.boundary_xmax == BCT.BC_SHEARINGBOX
        and params.boundary_ymin == BCT.BC_PERIODIC
        and params.boundary_ymax == BCT.BC_PERIODIC
        and z_ok
        and params.dtype == "float32"
        and params.nx % 128 == 0
        and params.nz % bz == 0
        and params.ny % by == 0
        and by >= YB
        and bz >= params.ghost_width
        and params.nx >= 4 * params.ghost_width
    )


def _make_main_kernel(
    params: RunParams, tiles, interpret: bool, gravity_z=None
) -> Callable:
    """Periodic packed-IO kernel with the rotating-frame terms: the x
    coordinate enters the trace/EMF source terms as a static per-column
    iota (x is ghost-free and lane-exact, so window column == global
    column). With params.compensated the window carries 2*nvar channels
    (state + Kahan carry — see godunov_mhd.mhd_apply_update).
    ``gravity_z``: stratified-MRI analytic vertical gravity (godunov_mhd
    gravity hooks). The profile is evaluated ON HOST over the packed z
    rows and DMA'd in as a per-window aux input plane — in-kernel
    construction (3D broadcasted_iota + exp) is what SIGABRTed the remote
    Mosaic compiler in round 4 ("Check failed: limits[i] <= dim(i)",
    ZCARRY_VALIDATION.json stage strat_small)."""
    from ..ops.backend import BOX, BoxField
    from ..solvers.godunov_mhd import (
        mhd_3d_interior_update,
        mhd_3d_interior_update_staged,
    )

    dx = params.dx
    xmin = params.xmin
    nx = params.nx
    nv = params.nb_var
    g = params.ghost_width
    bz, by = tiles
    wz = bz + 2 * g

    aux = None
    if gravity_z is not None:
        # packed z row r <-> global plane r - g; full packed-shaped field so
        # the kernel's window slice is a plain load (no in-kernel broadcast)
        import numpy as np

        dtype = np.float64 if params.dtype == "float64" else np.float32
        zc1 = params.zmin + params.dz / 2 + (
            np.arange(params.nz + 2 * g, dtype=dtype) - g
        ) * np.asarray(params.dz, dtype)
        gz1 = np.asarray(gravity_z(jnp.asarray(zc1)), dtype)
        aux = jnp.asarray(np.broadcast_to(
            gz1[None, :, None, None],
            (1, params.nz + 2 * g, params.ny + 2 * YB, nx),
        ))

    def update(tile_params, W, dt, margin, aux=None):
        i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2).astype(
            W.value.dtype
        )
        xpos = xmin + dx / 2 + i * dx
        gravity = None
        if aux is not None:
            gz_w = aux[0, :, YB - g : YB + by + g, :]
            gravity = (None, None, BoxField(gz_w, 0, YB - g))
        # staged demand-driven extents (round 4; xpos is pointwise so the
        # staged schedule stays exact). The GRAVITY variant keeps the
        # non-staged body: staged+gravity aborted the Mosaic AOT compiler
        # in round 4 with the in-kernel iota construction, and the staged
        # flop win measured ~1% here anyway (10.3 vs 10.4 ms at the
        # flagship MRI grid).
        body = (mhd_3d_interior_update if gravity is not None
                else mhd_3d_interior_update_staged)
        if params.compensated:
            return body(
                tile_params, W[:nv], dt, margin=margin, xp=BOX, xpos=xpos,
                comp=W[nv:], gravity=gravity,
            )
        return body(
            tile_params, W, dt, margin=margin, xp=BOX, xpos=xpos,
            gravity=gravity,
        )

    return make_packed_io_step(
        params, tiles, update, interpret=interpret,
        nvar=2 * nv if params.compensated else None,
        aux=aux,
    )


def _shear_slabs_from_interior(params: RunParams, interior, kept_bx, t):
    """Sheared x-ghost slabs [nvar, nz, ny, g] from the interior-only state
    (same math as solvers/shear._shear_ghost_slabs, which slices a ghosted
    array; here the packed interior is already ghost-free)."""
    from ..ops.slopes import slope_1d

    g = params.ghost_width
    nx = params.nx
    dy = params.dy
    Lx = params.dx * nx
    Ly = dy * params.ny

    deltay = jnp.mod(1.5 * params.omega0 * Lx * t, Ly)
    jplus = jnp.floor(deltay / dy).astype(jnp.int32)
    epsi = jnp.mod(deltay, dy)

    bmin = interior[..., 0:g]
    bmax = interior[..., nx - g : nx]

    # batched slopes + ONE dynamic roll per side (the +-(jplus+1) variants
    # are a static roll of the jplus roll — permutations compose exactly,
    # so the values are bit-identical to rolling each field separately;
    # dynamic rolls are the dispatch-dominant ops of this thin-slab pass)
    pair = jnp.stack([bmax, bmin])
    padded = jnp.pad(
        pair, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap"
    )
    sl = slope_1d(params, padded, _Y)[..., 1:-1, :]

    eps_min = 1.0 - epsi / dy
    lam_min = 0.5 * eps_min * (eps_min - 1.0)
    st_max = jnp.stack([bmax, sl[0]])          # [2, nv, nz, ny, g]
    r0 = jnp.roll(st_max, jplus, axis=_Y)      # b/s at roll jplus
    r1 = jnp.roll(r0, 1, axis=_Y)              # b/s at roll jplus+1
    gmin = (
        (1.0 - eps_min) * r1[0] + eps_min * r0[0]
        + lam_min * (r1[1] - r0[1])
    )
    gmin = gmin.at[IB].set(r1[0][IB] + eps_min * r1[1][IB])

    eps_max = epsi / dy
    lam_max = 0.5 * eps_max * (eps_max - 1.0)
    st_min = jnp.stack([bmin, sl[1]])
    q0 = jnp.roll(st_min, -jplus, axis=_Y)     # b/s at roll -jplus
    q1 = jnp.roll(q0, -1, axis=_Y)             # b/s at roll -(jplus+1)
    gmax = (
        (1.0 - eps_max) * q0[0] + eps_max * q1[0]
        - lam_max * (q0[1] - q1[1])
    )
    gmax = gmax.at[IB].set(q0[0][IB] + eps_max * q0[1][IB])
    # kept Bx face: the first XMAX ghost column of Bx is the interior's own
    # face (make_boundary_shear.h:276-288)
    gmax = gmax.at[IA, :, :, 0].set(kept_bx)
    return gmin, gmax


def _strip_geometry(params: RunParams) -> tuple[int, int]:
    """(gy, wy) of the border strip's lane dim. y is PERIODIC in the
    shearing box (the packed state's y bands and the sheared slabs' y
    ghosts are all pure wraps), so when ny is lane-aligned the strip
    carries exactly ny samples and the in-kernel roll wrap IS the y BC
    (gy=0 — the fused strip's layout, 33% less lane work at ny=256 than
    the ghosted 384-lane pad). Otherwise: ghosted rows padded up to the
    128-lane DMA alignment."""
    ny, g = params.ny, params.ghost_width
    if ny % 128 == 0:
        return 0, ny
    return g, -(-(ny + 2 * g) // 128) * 128


def _make_strip_kernel(
    params: RunParams, bz: int, interpret: bool, mode: str = "godunov",
    gravity_z=None,
):
    """Pallas kernel running the full pipeline over the 18-column border
    strip in TRANSPOSED [nvar, z, x, y] layout: x (24 sublanes, 18 live)
    and y (full lane rows) stay entirely in VMEM, z is tiled with stencil
    margins. One launch replaces the ~11 ms XLA strip pass (hundreds of
    small padded kernels) with ~1 ms of VPU work.

    In-kernel stencils are plain rolls (xp=JNP_T): roll wrap at the strip's
    x ends and at the R|L junction corrupts only values the 3-column ghost
    margins never let reach the extracted outputs (same margin discipline
    as the whole-array path).

    strip_k(St [nvar, nz+2g, 24, wy], dt) -> out [nvar+1, nz, 24, wy]:
      out[:nvar, :, 3:6]    updated cells, global x = nx-3..nx-1
      out[:nvar, :, 12:15]  updated cells, global x = 0..2
      out[nvar, :, 15..19]  planes: mode="godunov" -> fpl_min, fpl_max,
                            eypl_min, eypl_max, ezpl_max (remap inputs);
                            mode="dissip" -> resistive eypl, ezpl at the
                            xmax face (kept-Bx resistive CT), rest zero
    y carries its ghost frame; only g:g+ny is meaningful."""
    from ..ops.backend import JNP_T
    from ..solvers.godunov_mhd import _mhd_3d_fluxes_emfs, mhd_apply_update

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    dx = params.dx
    _gy, wy = _strip_geometry(params)    # lane-exact when ny % 128 == 0
    wz = bz + 2 * g
    nzb = nz // bz
    xw = 4 * g * 2                       # 24 sublanes: 18 live + 6 dead
    nv = params.nb_var
    comp = params.compensated
    nvc = 2 * nv if comp else nv         # channels: [U | Kahan carries]

    # tile/window-shaped params for the crops; dx/dy/dz are derived from
    # (max-min)/n so every replace keeps the extents consistent
    p_win = params.replace(
        nz=bz, zmax=params.zmin + bz * params.dz,
        ny=wy, ymax=params.ymin + wy * params.dy,
        nx=g, xmax=params.xmin + g * dx,
    )

    gz3d = None
    if gravity_z is not None:
        # gravity rides along as ONE extra input channel in the strip's
        # transposed [z, x, y] frame: evaluated on host over the ghosted z
        # rows and broadcast — no in-kernel iota (Mosaic SIGABRT, round 4)
        import numpy as np

        npdt = np.float64 if params.dtype == "float64" else np.float32
        zc1 = params.zmin + params.dz / 2 + (
            np.arange(nz + 2 * g, dtype=npdt) - g
        ) * np.asarray(params.dz, npdt)
        gz1 = np.asarray(gravity_z(jnp.asarray(zc1)), npdt)
        gz3d = jnp.asarray(np.broadcast_to(
            gz1[None, :, None, None], (1, nz + 2 * g, xw, wy)
        ))

    n_in = nvc + (1 if gz3d is not None else 0)

    def kernel(dt_ref, s_hbm, out_ref, win, sem):
        zi = pl.program_id(0)
        copy = pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(zi * bz, wz), :, :], win, sem
        )
        copy.start()
        copy.wait()
        W = win[...]
        dt = dt_ref[0, 0]
        zi_s = slice(g, g + bz)
        # y stays uncropped (margin my=0 with ny=wy): the out block keeps
        # the full lane rows and the XLA side slices the interior
        if mode == "godunov":
            # global column of each sublane: [nx-6..nx+2 | -3..5 | dead]
            s = jax.lax.broadcasted_iota(jnp.int32, (1, xw, 1), 1)
            c = jnp.where(s < 3 * g, nx - 2 * g + s,
                          jnp.where(s < 6 * g, s - 4 * g, 0)).astype(W.dtype)
            xpos = params.xmin + dx / 2 + c * dx
            gravity = None
            if gz3d is not None:
                # the DMA'd gravity channel (see gz3d above)
                gravity = (None, None, W[nvc])
            Wc = W[nv:nvc] if comp else None
            fluxes, emfs = _mhd_3d_fluxes_emfs(p_win, W[:nv], dt, xp=JNP_T,
                                               xpos=xpos, gravity=gravity)
            (flux_x, _fy, _fz), (emf_z, emf_y, _ex) = fluxes, emfs
            right = mhd_apply_update(p_win, W[:nv], fluxes, emfs, dt,
                                     margin=(g, 0, g), xp=JNP_T, comp=Wc,
                                     gravity=gravity)
            left = mhd_apply_update(p_win, W[:nv], fluxes, emfs, dt,
                                    margin=(g, 0, 4 * g), xp=JNP_T, comp=Wc,
                                    gravity=gravity)
            planes = jnp.stack([
                flux_x[ID, zi_s, 4 * g, :],     # x-face global 0
                flux_x[ID, zi_s, 2 * g, :],     # x-face global nx
                emf_y[zi_s, 4 * g, :],
                emf_y[zi_s, 2 * g, :],
                emf_z[zi_s, 2 * g, :],
            ], axis=1)                           # [bz, 5, wy]
        else:
            from ..solvers.dissipation import (
                compute_resistivity_emf,
                mhd_dissipation_interior_update,
            )

            Wc = W[nv:] if comp else None
            right = mhd_dissipation_interior_update(
                p_win, W[:nv], dt, margin=(g, 0, g), xp=JNP_T, comp=Wc)
            left = mhd_dissipation_interior_update(
                p_win, W[:nv], dt, margin=(g, 0, 4 * g), xp=JNP_T, comp=Wc)
            zero_pl = jnp.zeros((bz, 1, wy), W.dtype)
            if params.eta > 0:
                # resistive emfY/emfZ at the xmax face for the kept-Bx CT
                # (Mosaic/XLA dedups the recompute against the update above)
                emf_z, emf_y, _ex = compute_resistivity_emf(
                    p_win, W, xp=JNP_T)
                planes = jnp.concatenate([
                    emf_y[zi_s, 2 * g, :][:, None],
                    emf_z[zi_s, 2 * g, :][:, None],
                    jnp.concatenate([zero_pl] * 3, axis=1),
                ], axis=1)
            else:
                planes = jnp.concatenate([zero_pl] * 5, axis=1)

        def z(nvar, xs):
            return jnp.zeros((nvar, bz, xs, wy), W.dtype)

        out_main = jnp.concatenate(
            [z(nvc, g), right, z(nvc, 2 * g), left, z(nvc, xw - 5 * g)],
            axis=2,
        )                                    # [nvc, bz, 24, wy]
        extra = jnp.concatenate(
            [z(1, 5 * g)[0], planes, z(1, xw - 5 * g - 5)[0]], axis=1
        )[None]                              # [1, bz, 24, wy]
        out_ref[...] = jnp.concatenate([out_main, extra], axis=0)

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    out_shape = jax.ShapeDtypeStruct((nvc + 1, nz, xw, wy), dtype)
    fused = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nvc + 1, bz, xw, wy), lambda zi: (0, zi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n_in, wz, xw, wy), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interp(),
    )

    def strip_k(St, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(St.dtype)
        if gz3d is not None:
            St = jnp.concatenate([St, gz3d.astype(St.dtype)], axis=0)
        St, dt_arr = jax.lax.optimization_barrier((St, dt_arr))
        return jax.lax.optimization_barrier(fused(dt_arr, St))

    return strip_k


def _interp() -> bool:
    from .. import pallas as _pkg

    return bool(getattr(_pkg, "INTERPRET", False))


def strip_fused_supported(params: RunParams) -> bool:
    """The fused-borders strip kernel folds the sheared-slab build, the
    flux/emfY remap (Mosaic DYNAMIC lane rolls — the lanes carry exactly
    ny samples, so a roll wraps at ny: the shear-periodic geometry
    itself), the border-column corrections and the kept-Bx CT into the
    one strip launch, leaving ~8 thin XLA ops per step instead of ~60.
    Needs lane-exact ny, 8-aligned z tiles, and periodic z (stratified
    keeps the v1 strip + XLA glue)."""
    bz, _by = params.pallas_tiles or (8, 32)
    return (
        params.ny % 128 == 0
        and params.nz % bz == 0
        and bz % 8 == 0
    )


def _make_strip_kernel_fused(params: RunParams, bz: int, interpret: bool,
                             mode: str = "godunov"):
    """Fused-borders strip kernel (see strip_fused_supported).

    strip_k(scalars [t, dt], St [nvc, nz+2g, 16, ny], kpad [nz+16, ny])
      -> out [nvc+1, nz, 16, ny]:
        out[:nvc, :, 0:g]   corrected right columns, global x = nx-3..nx-1
                            (remap corrections + density floor at nx-1)
        out[:nvc, :, g:2g]  corrected left columns, global x = 0..2
        out[nvc, :, 0]      d_kept: the CT delta of the kept Bx face
                            (remapped emfY, shearingBox_utils.cuh:428-492;
                            mode="dissip": the resistive-CT delta, or 0)

    St sublanes: [interior nx-2g..nx-1 | interior 0..2g | pad] — the
    sheared ghost slabs are built IN-KERNEL from the border columns and
    kpad (the wrap-padded kept Bx face), per z tile over the full window
    extent (recompute replaces cross-tile materialization).
    Remap z+1 couplings (d_emin, emax_r) use a bz+1-plane extent per
    tile; the window's z wrap ghosts make the last tile's +1 plane the
    global wrap, matching the whole-array jnp.roll over nz.

    ``mode="dissip"``: the viscous/resistive sub-step instead of the
    Godunov pipeline — same in-kernel slabs and output contract, no
    remap corrections (the reference has none for dissipation)."""
    from ..ops.backend import JNP, JNP_T
    from ..ops.slopes import slope_1d
    from ..solvers.godunov_mhd import _mhd_3d_fluxes_emfs, mhd_apply_update

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    dx, dy, dz = params.dx, params.dy, params.dz
    Lx, Ly = dx * nx, dy * ny
    omega0 = params.omega0
    wz = bz + 2 * g
    nzb = nz // bz
    xw = 8 * g                           # 24 sublanes: 18 live + 6 dead
    nv = params.nb_var
    comp = params.compensated
    nvc = 2 * nv if comp else nv
    smallr = params.smallr

    p_win = params.replace(
        nz=bz, zmax=params.zmin + bz * params.dz,
        nx=g, xmax=params.xmin + g * dx,
    )

    def kernel(sc_ref, s_hbm, kpad, out_ref, win, w24, sem):
        zi = pl.program_id(0)
        copy = pltpu.make_async_copy(
            s_hbm.at[:, pl.ds(zi * bz, wz), :, :], win, sem
        )
        copy.start()
        copy.wait()
        Sw = win[...]                    # [nvc, wz, 16, ny]
        t = sc_ref[0, 0]
        dt = sc_ref[0, 1]
        dtdx, dtdy, dtdz = dt / dx, dt / dy, dt / dz
        lanes_last = Sw.ndim - 1

        def deltay_of(tt):
            return jnp.mod(1.5 * omega0 * Lx * tt, Ly)

        # ---- sheared x-ghost slabs in-kernel (ghosts for time t+dt,
        # MHDRunGodunov.cpp:3551); lanes carry exactly ny samples so the
        # dynamic roll wraps at ny — the shear-periodic geometry ----
        d_fill = deltay_of(t + dt)
        jp = jnp.floor(d_fill / dy).astype(jnp.int32)
        epsi = jnp.mod(d_fill, dy)
        bmax = Sw[:nv, :, g : 2 * g, :]      # global cols nx-g..nx-1
        bmin = Sw[:nv, :, 2 * g : 3 * g, :]  # global cols 0..g-1
        sl_max = slope_1d(params, bmax, -1, xp=JNP)
        sl_min = slope_1d(params, bmin, -1, xp=JNP)

        eps_min = 1.0 - epsi / dy
        lam_min = 0.5 * eps_min * (eps_min - 1.0)
        st_max = jnp.stack([bmax, sl_max])
        r0 = pltpu.roll(st_max, jp, st_max.ndim - 1)
        r1 = jnp.roll(r0, 1, axis=-1)
        gmin = (
            (1.0 - eps_min) * r1[0] + eps_min * r0[0]
            + lam_min * (r1[1] - r0[1])
        )
        gmin = JNP.set_component(
            gmin, IB, r1[0][IB] + eps_min * r1[1][IB]
        )

        eps_max = epsi / dy
        lam_max = 0.5 * eps_max * (eps_max - 1.0)
        st_min = jnp.stack([bmin, sl_min])
        q0 = pltpu.roll(st_min, ny - jp, st_min.ndim - 1)  # == roll -jp
        q1 = jnp.roll(q0, -1, axis=-1)
        gmax = (
            (1.0 - eps_max) * q0[0] + eps_max * q1[0]
            - lam_max * (q0[1] - q1[1])
        )
        gmax = JNP.set_component(
            gmax, IB, q0[0][IB] + eps_max * q0[1][IB]
        )
        # kept Bx face: first XMAX ghost column of Bx is the interior's
        # own face (make_boundary_shear.h:276-288); sublane-0 select
        kw = kpad[pl.ds(zi * bz, 16), :][:wz]          # [wz, ny]
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, g, 1), 1)
        gmax = JNP.set_component(
            gmax, IA,
            jnp.where(sub == 0, kw[:, None, :], gmax[IA]),
        )

        # ---- assemble the 24-sublane window (v1 strip layout) ----
        w24[:, :, 0 : 2 * g] = Sw[:, :, 0 : 2 * g]
        w24[0:nv, :, 2 * g : 3 * g] = gmax
        w24[0:nv, :, 3 * g : 4 * g] = gmin
        if comp:
            w24[nv:, :, 2 * g : 4 * g] = jnp.zeros(
                (nv, wz, 2 * g, ny), Sw.dtype
            )
        w24[:, :, 4 * g : 6 * g] = Sw[:, :, 2 * g : 4 * g]
        w24[:, :, 6 * g :] = jnp.zeros((nvc, wz, xw - 6 * g, ny), Sw.dtype)
        W = w24[...]
        zs = slice(g, g + bz)
        zs1 = slice(g, g + bz + 1)
        Wc = W[nv:] if comp else None

        if mode == "dissip":
            from ..solvers.dissipation import (
                compute_resistivity_emf,
                mhd_dissipation_interior_update,
            )

            right = mhd_dissipation_interior_update(
                p_win, W[:nv], dt, margin=(g, 0, g), xp=JNP_T, comp=Wc)
            left = mhd_dissipation_interior_update(
                p_win, W[:nv], dt, margin=(g, 0, 4 * g), xp=JNP_T,
                comp=Wc)
            if params.eta > 0:
                # resistive CT delta of the kept Bx face, z+1 in-tile
                # via the bz+1 extent (fused_mhd3d shear path analogue)
                emf_z_r, emf_y_r, _ex = compute_resistivity_emf(
                    p_win, W, xp=JNP_T)
                eypl2 = emf_y_r[zs1, 2 * g, :]
                ezpl2 = emf_z_r[zs, 2 * g, :]
                d_kept = dtdy * (
                    jnp.roll(ezpl2, -1, axis=-1) - ezpl2
                ) - dtdz * (eypl2[1 : bz + 1] - eypl2[:bz])
            else:
                d_kept = jnp.zeros((bz, ny), W.dtype)

            # no remap corrections in dissip mode (the reference has none)
            def z(ch, xs):
                return jnp.zeros((ch, bz, xs, ny), W.dtype)

            out_main = jnp.concatenate(
                [right, left, z(nvc, 16 - 2 * g)], axis=2
            )
            extra = jnp.concatenate(
                [d_kept[:, None, :], z(1, 15)[0]], axis=1
            )[None]
            out_ref[...] = jnp.concatenate([out_main, extra], axis=0)
            return

        # ---- the border pipeline (identical to the v1 strip kernel) ----
        s = jax.lax.broadcasted_iota(jnp.int32, (1, xw, 1), 1)
        c = jnp.where(s < 3 * g, nx - 2 * g + s,
                      jnp.where(s < 6 * g, s - 4 * g, 0)).astype(W.dtype)
        xpos = params.xmin + dx / 2 + c * dx
        fluxes, emfs = _mhd_3d_fluxes_emfs(p_win, W[:nv], dt, xp=JNP_T,
                                           xpos=xpos)
        (flux_x, _fy, _fz), (emf_z, emf_y, _ex) = fluxes, emfs
        right = mhd_apply_update(p_win, W[:nv], fluxes, emfs, dt,
                                 margin=(g, 0, g), xp=JNP_T, comp=Wc)
        left = mhd_apply_update(p_win, W[:nv], fluxes, emfs, dt,
                                margin=(g, 0, 4 * g), xp=JNP_T, comp=Wc)

        # ---- remap + corrections in-kernel (bz+1 planes: the z+1
        # couplings stay in-tile; the last tile's +1 plane is the global
        # wrap via the window's z ghosts) ----
        fpl_min = flux_x[ID, zs1, 4 * g, :]        # x-face global 0
        fpl_max = flux_x[ID, zs1, 2 * g, :]        # x-face global nx
        eypl_min = emf_y[zs1, 4 * g, :]
        eypl_max = emf_y[zs1, 2 * g, :]
        ezpl_max = emf_z[zs, 2 * g, :]

        d_rm = deltay_of(t + 0.5 * dt)
        jr = jnp.floor(d_rm / dy).astype(jnp.int32)
        w = jnp.mod(d_rm, dy) / dy
        fmin_st = jnp.stack([fpl_min, eypl_min])
        fmax_st = jnp.stack([fpl_max, eypl_max])
        rmax0 = pltpu.roll(fmax_st, jr, fmax_st.ndim - 1)
        rmax1 = jnp.roll(rmax0, 1, axis=-1)
        rmin0 = pltpu.roll(fmin_st, ny - jr, fmin_st.ndim - 1)
        rmin1 = jnp.roll(rmin0, -1, axis=-1)
        min_r = 0.5 * (fmin_st + (w * rmax1 + (1.0 - w) * rmax0))
        max_r = 0.5 * (fmax_st + ((1.0 - w) * rmin0 + w * rmin1))
        fmin_r, emin_r = min_r[0], min_r[1]
        fmax_r, emax_r = max_r[0], max_r[1]
        d_emin = emin_r - eypl_min
        d_emax = emax_r - eypl_max

        col_lo = left[:, :, 0, :]                  # global x = 0
        col_hi = right[:, :, g - 1, :]             # global x = nx-1
        d_lo = {ID: dtdx * (fmin_r[:bz] - fpl_min[:bz]),
                IA: -dtdz * (d_emin[1 : bz + 1] - d_emin[:bz]),
                IC: -dtdx * d_emin[:bz]}
        d_hi = {ID: -dtdx * (fmax_r[:bz] - fpl_max[:bz]),
                IC: dtdx * d_emax[:bz]}

        def kadd(val, carry, delta):
            y = delta - carry
            t_ = val + y
            return t_, (t_ - val) - y

        def apply(col, deltas):
            for slot, delta in deltas.items():
                if comp:
                    v, cc = kadd(col[slot], col[nv + slot], delta)
                    if slot == ID:
                        fl = jnp.maximum(v, smallr)
                        cc = jnp.where(fl == v, cc, 0.0)
                        v = fl
                    col = JNP.set_component(col, slot, v)
                    col = JNP.set_component(col, nv + slot, cc)
                else:
                    v = col[slot] + delta
                    if slot == ID:
                        v = jnp.maximum(v, smallr)
                    col = JNP.set_component(col, slot, v)
            return col

        col_lo = apply(col_lo, d_lo)
        col_hi = apply(col_hi, d_hi)

        d_kept = dtdy * (
            jnp.roll(ezpl_max, -1, axis=-1) - ezpl_max
        ) - dtdz * (emax_r[1 : bz + 1] - emax_r[:bz])

        sub_g = jax.lax.broadcasted_iota(jnp.int32, (1, 1, g, 1), 2)
        right3 = jnp.where(sub_g == g - 1, col_hi[:, :, None, :], right)
        left3 = jnp.where(sub_g == 0, col_lo[:, :, None, :], left)

        def z(ch, xs):
            return jnp.zeros((ch, bz, xs, ny), W.dtype)

        out_main = jnp.concatenate(
            [right3, left3, z(nvc, 16 - 2 * g)], axis=2
        )
        extra = jnp.concatenate(
            [d_kept[:, None, :], z(1, 15)[0]], axis=1
        )[None]
        out_ref[...] = jnp.concatenate([out_main, extra], axis=0)

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    out_shape = jax.ShapeDtypeStruct((nvc + 1, nz, 16, ny), dtype)
    fused = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((nz + 16, ny), lambda zi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nvc + 1, bz, 16, ny), lambda zi: (0, zi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nvc, wz, 16, ny), dtype),
            pltpu.VMEM((nvc, wz, xw, ny), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interp(),
    )

    def strip_fused(St, kpad, t, dt):
        sc = jnp.stack([t, dt]).reshape(1, 2).astype(St.dtype)
        St, kpad, sc = jax.lax.optimization_barrier((St, kpad, sc))
        return jax.lax.optimization_barrier(fused(sc, St, kpad))

    return strip_fused


def make_shear_cfl_kernel(params: RunParams, interpret: bool = False):
    """``inv_dt(P, kept_face) -> scalar``: the shearing-box MHD CFL
    reduction as ONE streaming Pallas kernel — the packed_io
    make_packed_cfl_mhd design with the x+1 face-B of the LAST column
    selected from the kept Bx face (a lane-select, exactly the ghosted
    state's value) instead of the periodic roll wrap.  Bit-identical to
    the slice-based reduction (same formulas, max exactly associative).
    Returns None when the z slab can't be 8-aligned (tiny test grids fall
    back to the XLA pass)."""
    from ..solvers.timestep import _inv_dt_mhd_fields

    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    if nz % 8 and nz > 8:
        return None
    wy = ny + 2 * YB
    itemsize = 8 if params.dtype == "float64" else 4
    # largest z-slab whose double-buffered window fits the VMEM share this
    # kernel can claim (40 MiB — see packed_io.make_packed_cfl_mhd for the
    # measured 512^3 OOM arithmetic); None -> XLA slice reduction
    bzc = next(
        (b for b in (8, 4, 2, 1)
         if nz % b == 0
         and 2 * nv * (b + 1) * wy * nx * itemsize <= 40 * 1024 * 1024),
        None,
    )
    if bzc is None:
        return None
    nzb = nz // bzc
    # the kept-Bx face is [nz, ny] with ny in LANES; manual HBM DMA slices
    # must cover whole 128-lane tiles on hardware (sub-width slices of the
    # padded memref are rejected by Mosaic — ladder stage shear_small,
    # round 4), so the wrapper pads kept to nyp lanes and the kernel reads
    # back the leading ny lanes (static offset-0 vector slice)
    nyp = -(-ny // 128) * 128
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32

    def kernel(p_hbm, k_hbm, out_ref, win, kwin, sem, ksem):
        zi = pl.program_id(0)
        slot = jax.lax.rem(zi, jnp.int32(2))

        def in_dma(z, s):
            return pltpu.make_async_copy(
                p_hbm.at[pl.ds(0, nv), pl.ds(g + z * bzc, bzc + 1), :, :],
                win.at[s],
                sem.at[s],
            )

        def k_dma(z, s):
            return pltpu.make_async_copy(
                k_hbm.at[pl.ds(z * bzc, bzc), :],
                kwin.at[s],
                ksem.at[s],
            )

        @pl.when(zi == 0)
        def _():
            in_dma(zi, slot).start()
            k_dma(zi, slot).start()

        @pl.when(zi + 1 < nzb)
        def _():
            in_dma(zi + 1, 1 - slot).start()
            k_dma(zi + 1, 1 - slot).start()

        in_dma(zi, slot).wait()
        k_dma(zi, slot).wait()
        W = win[slot]
        zs, ys = slice(0, bzc), slice(YB, YB + ny)
        rho = jnp.maximum(W[ID, zs, ys, :], params.smallr)
        ia = W[IA, zs, ys, :]
        last = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2) == nx - 1
        )
        kw = kwin[slot] if nyp == ny else kwin[slot][:, :ny]
        ia_p = jnp.where(last, kw[..., None], jnp.roll(ia, -1, -1))
        inv = _inv_dt_mhd_fields(
            params,
            W[ID, zs, ys, :],
            W[IP, zs, ys, :],
            W[IU, zs, ys, :] / rho,
            W[IV, zs, ys, :] / rho,
            W[IW, zs, ys, :] / rho,
            0.5 * (ia + ia_p),
            0.5 * (W[IB, zs, ys, :] + W[IB, zs, YB + 1 : YB + ny + 1, :]),
            0.5 * (W[IC, zs, ys, :] + W[IC, 1 : bzc + 1, ys, :]),
        )
        prev = jnp.where(zi == 0, jnp.zeros_like(inv), out_ref[0, 0])
        out_ref[0, 0] = jnp.maximum(prev, inv)

    fused = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nv, bzc + 1, wy, nx), dtype),
            pltpu.VMEM((2, bzc, nyp), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interp(),
    )

    def inv_dt(P, kept_face):
        if nyp != ny:
            kept_face = jnp.pad(kept_face, ((0, 0), (0, nyp - ny)))
        P, kept_face = jax.lax.optimization_barrier((P, kept_face))
        return jax.lax.optimization_barrier(fused(P, kept_face))[0, 0]

    return inv_dt


def make_shear_packed_step(
    params: RunParams, tiles=None, interpret: bool = False,
    gravity_z=None,
) -> Callable:
    """Build ``step(P, kept_bx, t) -> (P', kept_bx', dt)`` on the packed
    carry. ``gravity_z``: stratified-MRI analytic vertical gravity — the
    main and strip kernels apply it in-kernel, and the packed z bands are
    refilled with the hydrostatic BC_Z_STRATIFIED slabs after each phase
    (solvers/shear._stratified_ghost_slabs)."""
    from .fused_mhd3d import _pick_tiles
    from ..solvers.godunov_mhd import (
        _mhd_3d_fluxes_emfs,
        _shear_remap_pair_stacked,
        mhd_apply_update,
    )
    from ..solvers.timestep import _inv_dt_mhd_fields

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    dx, dy, dz = params.dx, params.dy, params.dz
    from ..solvers.shear import _stratified_ghost_slabs

    stratified = gravity_z is not None
    tiles = tiles or _pick_tiles(params)
    # stripFused=auto (None): ON for dissipative runs — those pay the XLA
    # strip glue twice per step (Godunov + dissipation sub-step) and the
    # fused strip measured 26.1 vs 40.9 ms/step for viscous-resistive MRI
    # at 128x256x128 (round 5, v5e); OFF for ideal MRI (16.8 vs 16.4,
    # round 4: one strip pass doesn't amortize the fused launch).
    use_strip_fused = params.strip_fused
    if use_strip_fused is None:
        use_strip_fused = params.nu > 0 or params.eta > 0
    fused_strip = fused_strip_d = None
    if (
        use_strip_fused
        and not stratified
        and strip_fused_supported(params.replace(pallas_tiles=tiles))
    ):
        fused_strip = _make_strip_kernel_fused(params, tiles[0], interpret)
        if params.nu > 0 or params.eta > 0:
            fused_strip_d = _make_strip_kernel_fused(
                params, tiles[0], interpret, mode="dissip"
            )
    from .zcarry_mhd3d import (
        make_zcarry_mhd_packed_io,
        zcarry_shear_supported,
    )

    if params.kernel == "zcarry" and zcarry_shear_supported(
        params.replace(pallas_tiles=tiles)
    ):
        # opt-in z-block-streaming MAIN kernel ([implementation]
        # kernel=zcarry): same packed in/out contract, ~1.37x less z
        # recompute per stage (pallas/zcarry_mhd3d.py)
        main = make_zcarry_mhd_packed_io(
            params, tiles=tiles, interpret=interpret, gravity_z=gravity_z
        )
    else:
        main = _make_main_kernel(params, tiles, interpret,
                                 gravity_z=gravity_z)
    strip_k = _make_strip_kernel(params, tiles[0], interpret,
                                 gravity_z=gravity_z)
    nv = params.nb_var
    comp = params.compensated
    nvc = 2 * nv if comp else nv
    dissip = params.nu > 0 or params.eta > 0
    if dissip:
        from ..ops.backend import BOX
        from ..solvers.dissipation import mhd_dissipation_interior_update

        def _dissip_update(tile_params, W, dtv, margin):
            if comp:
                return mhd_dissipation_interior_update(
                    tile_params, W[:nv], dtv, margin=margin, xp=BOX,
                    comp=W[nv:],
                )
            return mhd_dissipation_interior_update(
                tile_params, W, dtv, margin=margin, xp=BOX
            )

        main_d = make_packed_io_step(params, tiles, _dissip_update,
                                     interpret=interpret,
                                     nvar=2 * nv if comp else None)
        strip_d = _make_strip_kernel(params, tiles[0], interpret,
                                     mode="dissip")

    def kadd(val, carry, delta):
        """Kahan-compensated val += delta with running carry."""
        y = delta - carry
        t_ = val + y
        return t_, (t_ - val) - y

    def inv_dt_of(P, kept_face):
        """Slice-based CFL reduction; bit-identical to
        compute_inv_dt_mhd(params, U_ghosted) — the x+1 face-B shift at the
        last column reads the kept Bx face, exactly as the ghosted state
        holds it (timestep.compute_inv_dt_mhd_ghosted)."""
        zi, yi = slice(g, g + nz), slice(YB, YB + ny)
        rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
        ia = P[IA, zi, yi, :]
        ia_p = jnp.concatenate([ia[..., 1:], kept_face[..., None]], axis=-1)
        return _inv_dt_mhd_fields(
            params,
            P[ID, zi, yi, :],
            P[IP, zi, yi, :],
            P[IU, zi, yi, :] / rho,
            P[IV, zi, yi, :] / rho,
            P[IW, zi, yi, :] / rho,
            0.5 * (ia + ia_p),
            0.5 * (P[IB, zi, yi, :] + P[IB, zi, YB + 1 : YB + ny + 1, :]),
            0.5 * (P[IC, zi, yi, :] + P[IC, g + 1 : g + nz + 1, yi, :]),
        )

    gy, wy_strip = _strip_geometry(params)

    def strip_pass(P, kept_bx, t_fill, dt, kernel):
        """Border-column recompute with true sheared ghosts + planes: build
        the 18-column strip [interior nx-6..nx-1 | gmax | gmin | interior
        0..5] (each side carrying its own x ghosts), transpose it to
        [nvar, z, x, y], and run the one-launch Pallas strip kernel.
        With gy=0 (ny lane-aligned) the rows carry exactly ny samples and
        the kernel's roll wrap is the periodic y BC — bitwise-identical
        to the wrap-ghosted rows, at 2/3 the lane work for ny=256."""
        interior = P[:nv, g : g + nz, YB : YB + ny, :]
        gmin, gmax = _shear_slabs_from_interior(params, interior, kept_bx,
                                                t_fill)

        def pad_slab(slab):
            # x-ghost columns' z ghosts: stratified extension of the slab
            # itself (the reference's Z-after-X fill ordering), else wrap
            if stratified:
                zlo, zhi = _stratified_ghost_slabs(params, slab)
                slab = jnp.concatenate([zlo, slab, zhi], axis=1)
                return jnp.pad(
                    slab, ((0, 0), (0, 0), (gy, gy), (0, 0)), mode="wrap"
                )
            return jnp.pad(
                slab, ((0, 0), (g, g), (gy, gy), (0, 0)), mode="wrap"
            )

        gmin, gmax = pad_slab(gmin), pad_slab(gmax)
        if comp:
            # carries exist only for interior cells; ghost-column carries
            # are never consumed (comp is cropped to the updated interior)
            gmin = jnp.concatenate([gmin, jnp.zeros_like(gmin)], axis=0)
            gmax = jnp.concatenate([gmax, jnp.zeros_like(gmax)], axis=0)
        yg = slice(YB - gy, YB + ny + gy)
        S = jnp.concatenate(
            [
                P[:, :, yg, nx - 2 * g :],
                gmax,
                gmin,
                P[:, :, yg, : 2 * g],
            ],
            axis=-1,
        )
        wy_pad = wy_strip - (ny + 2 * gy)
        St = jnp.pad(
            jnp.swapaxes(S, -1, -2),
            ((0, 0), (0, 0), (0, 2 * g), (0, wy_pad)),
        )                                      # [nvar, z, 24, wy(128-aligned)]
        out = kernel(St, dt)

        yi = slice(gy, gy + ny)
        right = jnp.swapaxes(out[:nvc, :, g : 2 * g, yi], -1, -2)
        left = jnp.swapaxes(out[:nvc, :, 4 * g : 5 * g, yi], -1, -2)
        planes = tuple(out[nvc, :, 5 * g + k, yi] for k in range(5))
        return left, right, planes

    def refill_z(Pn):
        """Rebuild the packed z ghost bands with the hydrostatic
        BC_Z_STRATIFIED slabs (the in-kernel band writes are wraps). Kahan
        carry channels get zero bands (carries are never consumed on
        window margins)."""
        interior = Pn[:nv, g : g + nz, YB : YB + ny, :]
        zlo, zhi = _stratified_ghost_slabs(params, interior)
        if comp:
            zlo = jnp.concatenate([zlo, jnp.zeros_like(zlo)], axis=0)
            zhi = jnp.concatenate([zhi, jnp.zeros_like(zhi)], axis=0)
        pady = ((0, 0), (0, 0), (YB, YB), (0, 0))
        return jnp.concatenate(
            [
                jnp.pad(zlo, pady, mode="wrap"),
                Pn[:, g : g + nz],
                jnp.pad(zhi, pady, mode="wrap"),
            ],
            axis=1,
        )

    def assemble(P_main, left3, right3):
        """Corrected border columns replace the main kernel's wrap-
        contaminated ones — ONE lane concat, which also rebuilds the y/z
        wrap-ghost bands at those columns. (A dynamic-update-slice form
        was tried in round 4 and measured SLOWER inside the advance
        while_loop — XLA does not alias the carry buffer there, so the
        two .at[].set() become two full copies vs the concat's one:
        flagship loop 17.9 vs 16.4 ms/step.)"""
        padP = ((0, 0), (g, g), (YB, YB), (0, 0))
        return jnp.concatenate(
            [
                jnp.pad(left3, padP, mode="wrap"),
                P_main[:, :, :, g : nx - g],
                jnp.pad(right3, padP, mode="wrap"),
            ],
            axis=-1,
        )

    cfl_kernel = make_shear_cfl_kernel(params, interpret=interpret)

    def step(P, kept_bx, t):
        # kept carry layout: [nz, ny] plain, [2, nz, ny] compensated
        kept_face = kept_bx[0] if comp else kept_bx
        if cfl_kernel is not None:
            # streaming Pallas reduction (bit-identical to inv_dt_of)
            dt = params.cfl / cfl_kernel(P, kept_face)
        else:
            dt = params.cfl / inv_dt_of(P, kept_face)
        dtdx, dtdy, dtdz = dt / dx, dt / dy, dt / dz

        P_main = main(P, dt)
        if fused_strip is not None:
            # fused-borders strip: sheared slabs, remap, corrections and
            # the kept-Bx CT all happen in ONE kernel launch; XLA only
            # builds the thin border input and applies the outputs
            def fused_inputs(Pf, kface):
                yg = slice(YB, YB + ny)
                S = jnp.concatenate(
                    [Pf[:, :, yg, nx - 2 * g :], Pf[:, :, yg, : 2 * g]],
                    axis=-1,
                )
                St = jnp.pad(
                    jnp.swapaxes(S, -1, -2),
                    ((0, 0), (0, 0), (0, 16 - 4 * g), (0, 0)),
                )
                kpad = jnp.pad(
                    jnp.pad(kface, ((g, g), (0, 0)), mode="wrap"),
                    ((0, 16 - 2 * g), (0, 0)),
                )
                return St, kpad

            def fused_outputs(out):
                right3 = jnp.swapaxes(out[:nvc, :, 0:g, :], -1, -2)
                left3 = jnp.swapaxes(out[:nvc, :, g : 2 * g, :], -1, -2)
                return left3, right3, out[nvc, :, 0, :]

            def kept_add(kept_in, delta):
                if comp:
                    kf, kc = kadd(kept_in[0], kept_in[1], delta)
                    return jnp.stack([kf, kc])
                return kept_in + delta

            t_arr = jnp.asarray(t, P.dtype)
            St, kpad = fused_inputs(P, kept_face)
            left3, right3, d_kept = fused_outputs(
                fused_strip(St, kpad, t_arr, dt)
            )
            kept_new = kept_add(kept_bx, d_kept)
            P_new = assemble(P_main, left3, right3)
            if dissip:
                kept_face2 = kept_new[0] if comp else kept_new
                St_d, kpad_d = fused_inputs(P_new, kept_face2)
                left_d, right_d, d_kept2 = fused_outputs(
                    fused_strip_d(St_d, kpad_d, t_arr, dt)
                )
                P_d = main_d(P_new, dt)
                P_new = assemble(P_d, left_d, right_d)
                if params.eta > 0:
                    kept_new = kept_add(kept_new, d_kept2)
            return P_new, kept_new, dt
        # the reference fills shear ghosts for time totalTime+dt
        # (MHDRunGodunov.cpp:3551)
        left, right, planes = strip_pass(P, kept_face, t + dt, dt, strip_k)
        fpl_min, fpl_max, eypl_min, eypl_max, ezpl_max = planes

        # conservative density-flux + emfY remap at the domain x-faces
        # (shearingBox_utils.cuh:47-170, incl. the :484-485 density floor);
        # the update is linear in the face flux/EMF, so correcting the
        # border columns after equals remapping before — the whole-array
        # ordering (_godunov_unsplit_mhd_3d); both pairs remap in one
        # stacked call (bit-identical per channel)
        min_r, max_r = _shear_remap_pair_stacked(
            params,
            jnp.stack([fpl_min, eypl_min]),
            jnp.stack([fpl_max, eypl_max]),
            t, dt,
        )
        fmin_r, emin_r = min_r[0], min_r[1]
        fmax_r, emax_r = max_r[0], max_r[1]
        d_emin = emin_r - eypl_min
        d_emax = emax_r - eypl_max

        col_lo = left[..., 0]
        col_hi = right[..., g - 1]
        # border-column deltas: density remap, dbx at the xmin face
        # (-dtdz*(d_emfY(z+1)-d_emfY), periodic z), dbz (+-dtdx*d_emfY)
        d_lo = {ID: dtdx * (fmin_r - fpl_min),
                IA: -dtdz * (jnp.roll(d_emin, -1, axis=0) - d_emin),
                IC: -dtdx * d_emin}
        d_hi = {ID: -dtdx * (fmax_r - fpl_max),
                IC: dtdx * d_emax}
        for col_name, col, deltas in (("lo", col_lo, d_lo),
                                      ("hi", col_hi, d_hi)):
            for slot, delta in deltas.items():
                if comp:
                    v, c = kadd(col[slot], col[nv + slot], delta)
                    if slot == ID:
                        # density floor invalidates the carry where it fires
                        # (shearingBox_utils.cuh:484-485)
                        fl = jnp.maximum(v, params.smallr)
                        c = jnp.where(fl == v, c, 0.0)
                        v = fl
                    col = col.at[slot].set(v).at[nv + slot].set(c)
                else:
                    v = col[slot] + delta
                    if slot == ID:
                        v = jnp.maximum(v, params.smallr)
                    col = col.at[slot].set(v)
            if col_name == "lo":
                col_lo = col
            else:
                col_hi = col

        # CT update of the KEPT Bx face from the strip's emf planes with the
        # REMAPPED emfY (the whole-array path's extended `ct` range)
        d_kept = dtdy * (
            jnp.roll(ezpl_max, -1, axis=1) - ezpl_max
        ) - dtdz * (jnp.roll(emax_r, -1, axis=0) - emax_r)
        if comp:
            kf, kc = kadd(kept_bx[0], kept_bx[1], d_kept)
            kept_new = jnp.stack([kf, kc])
        else:
            kept_new = kept_bx + d_kept

        left3 = jnp.concatenate([col_lo[..., None], left[..., 1:]], axis=-1)
        right3 = jnp.concatenate(
            [right[..., : g - 1], col_hi[..., None]], axis=-1
        )
        P_new = assemble(P_main, left3, right3)
        if stratified:
            P_new = refill_z(P_new)

        if dissip:
            # dissipative sub-step: the reference refills with the SHEARED
            # remap before it (MHDRunGodunov.cpp:1968-1976) — here that is
            # the fresh strip slabs at t+dt from the post-Godunov state; no
            # flux remap applies (the reference has none for dissipation)
            kept_face2 = kept_new[0] if comp else kept_new
            left_d, right_d, planes_d = strip_pass(
                P_new, kept_face2, t + dt, dt, strip_d
            )
            P_d = main_d(P_new, dt)
            P_new = assemble(P_d, left_d, right_d)
            if stratified:
                P_new = refill_z(P_new)
            if params.eta > 0:
                # resistive CT on the kept Bx face
                # (apply_resistivity_ct's curl reaches the first xmax ghost
                # face; fused path: fused_mhd3d.make_pallas_shear_step_fn)
                eypl2, ezpl2 = planes_d[0], planes_d[1]
                d_kept2 = dtdy * (
                    jnp.roll(ezpl2, -1, axis=1) - ezpl2
                ) - dtdz * (jnp.roll(eypl2, -1, axis=0) - eypl2)
                if comp:
                    kf, kc = kadd(kept_new[0], kept_new[1], d_kept2)
                    kept_new = jnp.stack([kf, kc])
                else:
                    kept_new = kept_new + d_kept2

        return P_new, kept_new, dt

    return step


def pack_shear(params: RunParams, U: jnp.ndarray, stratified: bool = False):
    """Ghosted state -> (P, kept_bx) packed carry. With params.compensated
    the P channels double (zero-initialized Kahan carries) and kept_bx
    becomes [2, nz, ny] (face + carry). ``stratified`` keeps U's actual z
    ghost planes (the hydrostatic fill) instead of wrap bands."""
    g = params.ghost_width
    kept_bx = U[IA, g:-g, g:-g, params.nx + g]
    if stratified:
        mid = U[:, :, g:-g, g : g + params.nx]
        if params.compensated:
            mid = jnp.concatenate([mid, jnp.zeros_like(mid)], axis=0)
            kept_bx = jnp.stack([kept_bx, jnp.zeros_like(kept_bx)])
        P = jnp.pad(mid, ((0, 0), (0, 0), (YB, YB), (0, 0)), mode="wrap")
        return P, kept_bx
    interior = U[:, g:-g, g:-g, g : g + params.nx]
    if params.compensated:
        interior = jnp.concatenate(
            [interior, jnp.zeros_like(interior)], axis=0
        )
        kept_bx = jnp.stack([kept_bx, jnp.zeros_like(kept_bx)])
    P = jnp.pad(interior, ((0, 0), (g, g), (YB, YB), (0, 0)), mode="wrap")
    return P, kept_bx


def unpack_shear(params: RunParams, P, kept_bx, t):
    """Packed carry -> ghosted state with a FRESH sheared fill at time t
    (the kept Bx face is written before the fill, which preserves it)."""
    from ..solvers.shear import make_all_boundaries_shear

    g = params.ghost_width
    nv = params.nb_var
    interior = P[:nv, g : g + params.nz, YB : YB + params.ny, :]
    kept_face = kept_bx[0] if params.compensated else kept_bx
    U = jnp.pad(interior, ((0, 0),) + ((g, g),) * 3, mode="wrap")
    U = U.at[IA, g:-g, g:-g, params.nx + g].set(kept_face)
    return make_all_boundaries_shear(params, U, t)


def make_shear_packed_step_fn(
    params: RunParams, interpret: bool = False, gravity_z=None,
) -> Callable:
    """Testing/interop contract ``step(U_ghosted, t) -> (U', dt)`` — packs,
    steps, unpacks every call (the production path is
    make_pallas_shear_advance_n, which keeps the packed carry across a whole
    output interval)."""
    step_p = make_shear_packed_step(
        params, tiles=params.pallas_tiles, interpret=interpret,
        gravity_z=gravity_z,
    )
    strat = gravity_z is not None

    def step(U, t):
        P, kept = pack_shear(params, U, stratified=strat)
        P1, kept1, dt = step_p(P, kept, t)
        return unpack_shear(params, P1, kept1, t + dt), dt

    return step


def make_pallas_shear_advance_n(
    params: RunParams, interpret: bool = False, gravity_z=None,
    packed_form: bool = False,
) -> Callable:
    """Jitted ``advance_n(U, t, n_steps) -> (U, t, k)`` carrying the packed
    shear state across the whole chunk (ghosted in/out, like
    solvers/step.make_advance_n).

    ``packed_form=True`` returns ``(pack, advance_packed, unpack)`` for
    chunk-chained drivers (solvers/step.make_packed_advance_chain). The
    carried state is the ``(P, kept)`` pair; NOTE unpack here takes
    ``(state, t)`` — the sheared ghost reconstruction needs the final
    time."""
    step_p = make_shear_packed_step(
        params, tiles=params.pallas_tiles, interpret=interpret,
        gravity_z=gravity_z,
    )
    strat = gravity_z is not None
    t_end = params.t_end

    def advance_packed(S0, t, n_steps):
        P0, kept0 = S0

        def cond(carry):
            _, _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            P, kept, t_c, k = carry
            P1, kept1, dt = step_p(P, kept, t_c)
            return (P1, kept1, t_c + dt, k + 1)

        P_f, kept_f, t_f, k_f = jax.lax.while_loop(
            cond, body, (P0, kept0, t, jnp.array(0, jnp.int32))
        )
        return (P_f, kept_f), t_f, k_f

    if packed_form:
        pack_j = jax.jit(
            lambda U: pack_shear(params, U, stratified=strat),
            donate_argnums=0,
        )
        adv_j = jax.jit(advance_packed, donate_argnums=0)
        unpack_j = jax.jit(
            lambda S, t: unpack_shear(params, S[0], S[1], t)
        )
        return pack_j, adv_j, unpack_j

    @jax.jit
    def advance_n(U, t, n_steps):
        S_f, t_f, k_f = advance_packed(
            pack_shear(params, U, stratified=strat), t, n_steps
        )
        return unpack_shear(params, S_f[0], S_f[1], t_f), t_f, k_f

    return advance_n
