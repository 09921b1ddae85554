"""Shared packed-IO Pallas step kernel for the fully-periodic 3D advance.

Packed loop state: [nvar, nz+2g, ny+2*YB, nx] — z wrap-ghosted by the
stencil's ghost width g, y wrap-ghosted by YB=8 rows (TPU sublane DMA
offsets/shapes must be 8-aligned; only the inner g rows carry live data),
x ghost-free (the in-row roll wrap IS the periodic BC, and full interior
rows are exactly lane-aligned).

Each grid tile DMAs a halo-extended window in, runs the full box-tracked
finite-volume pipeline (ops/backend.py) on it, and DMAs the result straight
into the packed OUTPUT layout: its interior block plus, for edge tiles, the
opposite-side wrap ghost bands (z bands are g rows — the z dim has no DMA
alignment constraints; y bands are whole YB-row blocks whose outer rows
hold harmless neighbor data). The separate XLA ghost re-pack pass — a full
HBM copy of the state per step — disappears; the reference's d_U/d_U2
ping-pong (reference: src/hydro/HydroRunBase.h:556-566) returns as XLA's
buffer reuse across the while-loop carry.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams

YB = 8  # packed-layout y ghost band width



def _interpret_flag() -> bool:
    from .. import pallas as _pkg

    return bool(getattr(_pkg, "INTERPRET", False))

def pack_state(params: RunParams, interior: jnp.ndarray) -> jnp.ndarray:
    """Interior-only [nvar, nz, ny, nx] -> packed layout (wrap ghosts)."""
    g = params.ghost_width
    return jnp.pad(interior, ((0, 0), (g, g), (YB, YB), (0, 0)), mode="wrap")


def unpack_state(params: RunParams, P: jnp.ndarray) -> jnp.ndarray:
    """Packed layout -> interior-only block."""
    g = params.ghost_width
    return P[:, g : g + params.nz, YB : YB + params.ny, :]


def make_packed_cfl_mhd(params: RunParams, interpret: bool = False):
    """Build ``inv_dt(P) -> scalar``: the MHD CFL reduction over the packed
    state as ONE streaming Pallas kernel (the TPU form of the reference's
    cmpdt block reduction, cmpdt_mhd.cuh:43-230). The XLA version
    (timestep.compute_inv_dt_mhd_packed) reads the full state but costs
    ~2.5 ms at 256^3 (~4x the HBM bound) — layout padding and the lane roll
    keep it off the fused-reduction fast path. Here z-slabs of bzc+1 planes
    stream through VMEM double-buffered, each reduced to a running SMEM max;
    bit-identical to the XLA reduction (same field formulas, max is exactly
    associative)."""
    from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
    from ..solvers.timestep import _inv_dt_mhd_fields

    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    wy = ny + 2 * YB
    itemsize = 8 if params.dtype == "float64" else 4
    # largest z-slab whose double-buffered window fits the VMEM share this
    # kernel can claim. The hard cap is 128 MiB TOTAL per program point,
    # and on 512^3 grids XLA's while-body register spills alone take
    # ~48 MiB (measured: bzc=4's 82.5 MiB window + 47.7 MiB spills =
    # 130.2M > 128M, OOM) — so the window budget is 40 MiB: keeps bzc=8
    # at 256^3 (38.2 MiB, the flagship shape) and drops 512^3 to bzc=1
    # (33 MiB). None -> the caller falls back to the XLA slice reduction.
    bzc = next(
        (b for b in (8, 4, 2, 1)
         if nz % b == 0
         and 2 * nv * (b + 1) * wy * nx * itemsize <= 40 * 1024 * 1024),
        None,
    )
    if bzc is None:
        return None
    nzb = nz // bzc

    def kernel(p_hbm, out_ref, win, sem):
        zi = pl.program_id(0)
        slot = jax.lax.rem(zi, jnp.int32(2))

        def in_dma(z, s):
            return pltpu.make_async_copy(
                p_hbm.at[:nv, pl.ds(g + z * bzc, bzc + 1), :, :],
                win.at[s],
                sem.at[s],
            )

        @pl.when(zi == 0)
        def _():
            in_dma(zi, slot).start()

        @pl.when(zi + 1 < nzb)
        def _():
            in_dma(zi + 1, 1 - slot).start()

        in_dma(zi, slot).wait()
        W = win[slot]
        zs, ys = slice(0, bzc), slice(YB, YB + ny)
        rho = jnp.maximum(W[ID, zs, ys, :], params.smallr)
        ia = W[IA, zs, ys, :]
        inv = _inv_dt_mhd_fields(
            params,
            W[ID, zs, ys, :],
            W[IP, zs, ys, :],
            W[IU, zs, ys, :] / rho,
            W[IV, zs, ys, :] / rho,
            W[IW, zs, ys, :] / rho,
            0.5 * (ia + jnp.roll(ia, -1, -1)),
            0.5 * (W[IB, zs, ys, :] + W[IB, zs, YB + 1 : YB + ny + 1, :]),
            0.5 * (W[IC, zs, ys, :] + W[IC, 1 : bzc + 1, ys, :]),
        )
        prev = jnp.where(zi == 0, jnp.zeros_like(inv), out_ref[0, 0])
        out_ref[0, 0] = jnp.maximum(prev, inv)

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    fused = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nv, bzc + 1, wy, nx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def inv_dt(P):
        P = jax.lax.optimization_barrier(P)
        return jax.lax.optimization_barrier(fused(P))[0, 0]

    return inv_dt


def make_packed_io_step(
    params: RunParams,
    tiles: tuple[int, int],
    interior_update: Callable,
    interpret: bool = False,
    nvar: int | None = None,
    with_inv_dt_mhd: bool = False,
    aux: jnp.ndarray | None = None,
) -> Callable:
    """Build ``step_packed(P, dt) -> P_new`` on the packed loop state.

    ``interior_update(tile_params, U_boxfield, dt, margin)`` must return the
    updated [nvar, bz, by, nx] interior of a window whose BoxField declares
    the stencil-consumed extent (the g-margin frame around the tile).

    ``nvar`` overrides the channel count (default params.nb_var) — the
    Kahan-compensated advance carries 2*nb_var channels (state + carry).

    ``aux``: optional STATIC per-cell input array [naux, nz+2g, ny+2YB, nx]
    in the packed layout (e.g. the stratified-MRI gravity field,
    MHDRunBase.cpp:3163-3245). It is DMA'd window-by-window exactly like
    the state and handed to ``interior_update(..., aux=aux_window)`` as a
    raw [naux, wz, wy, nx] VMEM array. Generating such coordinate fields
    in-kernel (broadcasted_iota) is what SIGABRTed the remote Mosaic
    compiler in round 4 ("Check failed: limits[i] <= dim(i)"); a DMA'd
    real array sidesteps the entire construction.

    ``with_inv_dt_mhd``: additionally reduce the NEXT step's MHD CFL over
    the IN-TILE cells of every output tile (z rows [0, bz), y rows
    [0, by) minus the top plane and last row, whose +1 faces are
    register-resident) and return ``(P_new, inv_partial)``. Tile-seam
    cells are left to a cheap strided XLA pass over the fresh packed
    ghosts (timestep.compute_inv_dt_mhd_packed_seams) — max() is
    idempotent and exactly associative, so
    ``max(inv_partial, seams(P_new))`` is bit-identical to the full
    reduction while this kernel never stashes seam state (the zcarry
    kernel's cross-tile CFL stashes are hardware-proven but cost VMEM
    and bookkeeping; the seam cells are ~15% of the volume and their
    pass is ~HBM-bound on ~1/6 of the state). Requires bz, by >= 2.
    """
    g = params.ghost_width
    nv = nvar if nvar is not None else params.nb_var
    nvs = params.nb_var            # state channels (compensated: first nv)
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles
    if nz % bz or ny % by or by < YB or bz < g:
        raise ValueError(f"tiles {(bz, by)} unsupported for {(nz, ny)}")
    if with_inv_dt_mhd and (bz < 2 or by < 2):
        raise ValueError("with_inv_dt_mhd needs bz, by >= 2")
    wz = bz + 2 * g
    wy = by + 2 * YB
    nzb, nyb = nz // bz, ny // by
    grid = (nzb, nyb)

    tile_params = params.replace(
        ny=by,
        nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    naux = None if aux is None else aux.shape[0]
    if aux is not None and aux.shape != (naux, nz + 2 * g, ny + 2 * YB, nx):
        raise ValueError(f"aux shape {aux.shape} != packed layout")

    def kernel(dt_ref, *refs):
        from ..ops.backend import BoxField

        if aux is not None:
            p_hbm, aux_hbm = refs[0], refs[1]
            rest = refs[2:]
        else:
            p_hbm, aux_hbm = refs[0], None
            rest = refs[1:]
        if with_inv_dt_mhd:
            out_ref, inv_ref, win, res, acc = rest[:5]
            rest = rest[5:]
        else:
            out_ref, win, res = rest[:3]
            rest = rest[3:]
            inv_ref = acc = None
        if aux is not None:
            awin, sem, sem_out, asem = rest
        else:
            (sem, sem_out), awin, asem = rest, None, None

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        i = zi * nyb + yi          # linear grid step
        n_iter = nzb * nyb
        slot = jax.lax.rem(i, jnp.int32(2))

        def in_dma(z, y, s):
            # window: z rows [z*bz, +wz) of the packed layout (interior tile
            # at window z [g, g+bz)), y rows [y*by, +wy) (interior at
            # [YB, YB+by))
            return pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(z * bz, wz), pl.ds(y * by, wy), :],
                win.at[s],
                sem.at[s],
            )

        def aux_dma(z, y, s):
            return pltpu.make_async_copy(
                aux_hbm.at[:, pl.ds(z * bz, wz), pl.ds(y * by, wy), :],
                awin.at[s],
                asem.at[s],
            )

        def start_in(z, y, s):
            in_dma(z, y, s).start()
            if aux is not None:
                aux_dma(z, y, s).start()

        # double-buffered input: this iteration's window was prefetched by
        # the previous one; kick off the next window's fetch before waiting
        @pl.when(i == 0)
        def _():
            start_in(zi, yi, slot)

        @pl.when(i + 1 < n_iter)
        def _():
            yn = yi + 1
            zn = jnp.where(yn == nyb, zi + 1, zi)
            yn = jnp.where(yn == nyb, 0, yn)
            start_in(zn, yn, 1 - slot)

        in_dma(zi, yi, slot).wait()
        if aux is not None:
            aux_dma(zi, yi, slot).wait()

        def out_dmas(z, y, s):
            """The output copies iteration (z, y) issues from res[s]: the
            interior block plus, for edge tiles, the opposite-side wrap
            ghost bands and corners. Build-as-list so starts and the
            deferred waits pair the SAME conditions and byte counts."""
            zmain = pl.ds(g + z * bz, bz)
            ymain = pl.ds(YB + y * by, by)
            zall, yall = pl.ds(0, bz), pl.ds(0, by)
            zlow, zhigh = pl.ds(0, g), pl.ds(nz + g, g)
            ylow, yhigh = pl.ds(0, YB), pl.ds(YB + ny, YB)
            zsrc_hi, ysrc_hi = pl.ds(bz - g, g), pl.ds(by - YB, YB)
            specs = [
                (True, (zall, yall, zmain, ymain)),
                (z == nzb - 1, (zsrc_hi, yall, zlow, ymain)),
                (z == 0, (pl.ds(0, g), yall, zhigh, ymain)),
                (y == nyb - 1, (zall, ysrc_hi, zmain, ylow)),
                (y == 0, (zall, pl.ds(0, YB), zmain, yhigh)),
                (jnp.logical_and(z == nzb - 1, y == nyb - 1),
                 (zsrc_hi, ysrc_hi, zlow, ylow)),
                (jnp.logical_and(z == nzb - 1, y == 0),
                 (zsrc_hi, pl.ds(0, YB), zlow, yhigh)),
                (jnp.logical_and(z == 0, y == nyb - 1),
                 (pl.ds(0, g), ysrc_hi, zhigh, ylow)),
                (jnp.logical_and(z == 0, y == 0),
                 (pl.ds(0, g), pl.ds(0, YB), zhigh, yhigh)),
            ]
            return [
                (cond,
                 pltpu.make_async_copy(
                     res.at[s, :, sz, sy, :],
                     out_ref.at[:, dz, dy, :],
                     sem_out.at[s],
                 ))
                for cond, (sz, sy, dz, dy) in specs
            ]

        # deferred output waits: before overwriting res[slot], drain the
        # DMAs iteration i-2 issued from it
        @pl.when(i >= 2)
        def _():
            ip = i - 2
            zp = jax.lax.div(ip, jnp.int32(nyb))
            yp = jax.lax.rem(ip, jnp.int32(nyb))
            for cond, copy in out_dmas(zp, yp, slot):
                if cond is True:
                    copy.wait()
                else:
                    pl.when(cond)(copy.wait)

        # declare only the stencil-consumed y extent valid so the box-tracked
        # pipeline never computes on the YB-g dead rows of the band
        U = BoxField(win[slot, :, :, YB - g : YB + by + g, :], 0, YB - g)
        if aux is None:
            upd = interior_update(tile_params, U, dt_ref[0, 0], (g, YB, 0))
        else:
            upd = interior_update(
                tile_params, U, dt_ref[0, 0], (g, YB, 0), aux=awin[slot]
            )
        res[slot] = upd

        if with_inv_dt_mhd:
            from ..solvers.timestep import _inv_dt_mhd_fields

            @pl.when(i == 0)
            def _():
                acc[0, 0] = jnp.zeros((), upd.dtype)

            # in-tile cells: +1 faces register-resident (x wraps in-row)
            blk = upd[0:nvs]
            st = blk[:, 0 : bz - 1, 0 : by - 1]
            rho = jnp.maximum(st[0], params.smallr)
            ia = st[5]
            inv = _inv_dt_mhd_fields(
                params, st[0], st[1],
                st[2] / rho, st[3] / rho, st[4] / rho,
                0.5 * (ia + jnp.roll(ia, -1, -1)),
                0.5 * (st[6] + blk[6, 0 : bz - 1, 1:by]),
                0.5 * (st[7] + blk[7, 1:bz, 0 : by - 1]),
            )
            acc[0, 0] = jnp.maximum(acc[0, 0], inv)

            @pl.when(i == n_iter - 1)
            def _():
                inv_ref[0, 0] = acc[0, 0]

        for cond, copy in out_dmas(zi, yi, slot):
            if cond is True:
                copy.start()
            else:
                pl.when(cond)(copy.start)

        # the last two iterations' output DMAs drain before the kernel ends
        @pl.when(i == n_iter - 1)
        def _():
            for cond, copy in out_dmas(zi, yi, slot):
                if cond is True:
                    copy.wait()
                else:
                    pl.when(cond)(copy.wait)

        @pl.when(jnp.logical_and(i == n_iter - 1, n_iter > 1))
        def _():
            ip = i - 1
            zp = jax.lax.div(ip, jnp.int32(nyb))
            yp = jax.lax.rem(ip, jnp.int32(nyb))
            for cond, copy in out_dmas(zp, yp, 1 - slot):
                if cond is True:
                    copy.wait()
                else:
                    pl.when(cond)(copy.wait)

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    p_shape = jax.ShapeDtypeStruct((nv, nz + 2 * g, ny + 2 * YB, nx), dtype)
    if with_inv_dt_mhd:
        out_shape = (p_shape, jax.ShapeDtypeStruct((1, 1), dtype))
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    else:
        out_shape = p_shape
        out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
    scratch = [
        pltpu.VMEM((2, nv, wz, wy, nx), dtype),   # double-buffered windows
        pltpu.VMEM((2, nv, bz, by, nx), dtype),   # double-buffered results
    ]
    if with_inv_dt_mhd:
        scratch.append(pltpu.SMEM((1, 1), dtype))  # running CFL max
    if aux is not None:
        scratch.append(pltpu.VMEM((2, naux, wz, wy, nx), dtype))
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if aux is not None:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # dt (1,1) scalar
        pl.BlockSpec(memory_space=pltpu.ANY),   # P stays in HBM
    ]
    if aux is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))

    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    aux_cast = None if aux is None else jnp.asarray(aux, dtype)

    def step_packed(P, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(P.dtype)
        # keep XLA's fusion passes away from the custom call's operands
        # (address-change fusion around pallas custom-calls crashes the
        # 2026-08 libtpu fusion pass otherwise)
        P, dt_arr = jax.lax.optimization_barrier((P, dt_arr))
        args = (dt_arr, P) if aux is None else (
            dt_arr, P, jax.lax.optimization_barrier(aux_cast)
        )
        if with_inv_dt_mhd:
            P_new, inv = jax.lax.optimization_barrier(fused(*args))
            return P_new, inv[0, 0]
        return jax.lax.optimization_barrier(fused(*args))

    return step_packed
