"""z-BLOCK-streaming Pallas kernel for the fully-periodic 3D hydro step.

The hydro twin of pallas/zcarry_mhd3d.py: the packed-IO hydro kernel
(fused_hydro3d.make_fused_hydro_packed_io) DMAs bz+2g planes per tile and
recomputes every stage on its z margins (~1.4-1.5x at the (8, 32) tile
with g=2).  Here persistent VMEM buffers carry each stage's top planes
across z tiles, so the DMA fetches exactly bz fresh planes and each stage
computes ~bz(+1) fresh planes.

Carry chain per z tile, LOCAL plane coordinates (tile interior [0, bz)):

    buffer  extent        carry slots            fresh        inputs
    U       [-2, bz+2)    [bz, bz+4) -> [0, 4)   [2, bz+2)    DMA
    Q       [-2, bz+2)    [bz, bz+4) -> [0, 4)   [2, bz+2)    U (pointwise)
    dq*3    [-1, bz+1)    [bz, bz+2) -> [0, 2)   [1, bz+1)    Q [0, bz+2)
    qm_z    [-1, bz+1)    [bz] -> [0]            [0, bz+1)    Q,dq [0,bz+1)
    flux/update: in-plane (flux_z faces [0, bz+1) from carried qm_z)

Tile 0 of each y column is a WARMUP populating the carries; its U window
dips below the domain and the deeper slots hold junk, but every plane the
real tiles' demand chain reads is computed from U >= -g (bz >= 4 makes
the warmup's fresh ranges cover all carried slots — see
zcarry_hydro_supported).  Output contract matches the packed-IO kernel
(interior blocks + wrap ghost bands); reference analogue: the CUDA
4-plane shared-memory ring (godunov_unsplit.cuh), as for the MHD twin.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams
from .packed_io import YB


def _interpret_flag() -> bool:
    from .. import pallas as _pkg

    return bool(getattr(_pkg, "INTERPRET", False))


def zcarry_hydro_supported(params: RunParams) -> bool:
    from .fused_hydro3d import _pick_tiles, hydro_packed_supported

    bz, by = params.pallas_tiles or _pick_tiles(params)
    return (
        hydro_packed_supported(params)
        and bz >= 4                       # warmup covers the carried slots
        and params.nz % bz == 0
        and params.ny % by == 0
    )


def make_zcarry_hydro_packed_io(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    with_inv_dt: bool = False,
) -> Callable:
    """Build ``step_packed(P, dt) -> P_new`` on the packed hydro state.

    ``with_inv_dt``: additionally reduce the NEXT step's CFL over the
    updated state in-kernel and return ``(P_new, inv_dt)``.  The hydro
    CFL is per-cell (no face averages — cmpdt.cuh:84-86), the real tiles
    partition the interior exactly, and max is exactly associative — the
    result matches timestep.compute_inv_dt_hydro on the output interior
    to within 1 ULP of FMA-contraction difference (the per-cell
    expression is recomputed in a different fusion context)."""
    from ..ops.backend import BOX, BoxField
    from ..ops.eos import constoprim_hydro
    from ..ops.riemann import riemann_hydro
    from ..ops.slopes import slopes_unsplit
    from ..ops.trace import trace_unsplit_hydro
    from ..solvers.godunov import _AXIS, _rotation
    from .fused_hydro3d import _pick_tiles

    g = params.ghost_width            # 2 for hydro
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by or by < YB or bz < 4:
        raise ValueError(f"tiles {(bz, by)} unsupported for {(nz, ny)}")
    wy = by + 2 * YB
    rows_c = by + 2 * g
    nzb, nyb = nz // bz, ny // by
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    dtdd_div = (params.dx, params.dy, params.dz)

    tile_params = params.replace(
        ny=by, nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    meta: dict[str, tuple[int, int]] = {}

    def kernel(dt_ref, p_hbm, out_ref, *rest):
        rest = list(rest)
        inv_ref = rest.pop(0) if with_inv_dt else None
        (u_b, q_b, dq0, dq1, dq2, qmz_b, res) = rest[:7]
        rest = rest[7:]
        if with_inv_dt:
            acc = rest.pop(0)
        sem_in, sem_out = rest
        dq_bufs = (dq0, dq1, dq2)
        yi = pl.program_id(0)
        zi = pl.program_id(1)          # 0 = warmup tile of this column
        z0 = (zi - 1) * bz
        i = yi * (nzb + 1) + zi        # linear grid step
        dt = dt_ref[0, 0]

        def store(buf, name, field, lo_plane, n, slot_of_plane):
            oy, rows = field.oy, field.value.shape[-2]
            prev = meta.setdefault(name, (oy, rows))
            if prev != (oy, rows):
                raise AssertionError(
                    f"{name}: inconsistent y box {prev} vs {(oy, rows)}"
                )
            k0 = lo_plane - field.oz
            if k0 < 0 or k0 + n > field.value.shape[-3]:
                raise AssertionError(
                    f"{name}: extent [{field.oz}, "
                    f"{field.oz + field.value.shape[-3]}) misses "
                    f"[{lo_plane}, {lo_plane + n})"
                )
            s0 = slot_of_plane(lo_plane)
            buf[..., s0 : s0 + n, 0:rows, :] = field.value[
                ..., k0 : k0 + n, :, :
            ]

        # ---- copy-downs: previous tile's top planes -> buffer bottom ----
        u_b[:, 0:4] = u_b[:, bz : bz + 4]
        q_b[:, 0:4] = q_b[:, bz : bz + 4]
        for b in dq_bufs:
            b[:, 0:2] = b[:, bz : bz + 2]
        qmz_b[:, 0:1] = qmz_b[:, bz : bz + 1]

        # ---- fresh U planes [2, bz+2) by DMA (warmup: valid sub-range
        # [-g, 2) -> slots [bz, bz+4); normal: [z0+2, z0+bz+2)) ----
        @pl.when(zi == 0)
        def _():
            c = pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(0, g + 2), pl.ds(yi * by, wy), :],
                u_b.at[:, pl.ds(bz, g + 2)],
                sem_in,
            )
            c.start()
            c.wait()

        @pl.when(zi > 0)
        def _():
            c = pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(g + z0 + 2, bz), pl.ds(yi * by, wy), :],
                u_b.at[:, pl.ds(4, bz)],
                sem_in,
            )
            c.start()
            c.wait()

        def u_slab(lo, n):
            return BoxField(
                u_b[:, lo + 2 : lo + 2 + n, YB - g : YB + by + g, :],
                lo, YB - g,
            )

        # ---- Q fresh [2, bz+2) <- U (pointwise) ----
        Q_new, _c = constoprim_hydro(tile_params, u_slab(2, bz), xp=BOX)
        store(q_b, "q", Q_new, 2, bz, lambda p: p + 2)

        def q_slab(lo, n):
            oy, rows = meta["q"]
            return BoxField(q_b[:, lo + 2 : lo + 2 + n, 0:rows, :], lo, oy)

        # ---- slopes fresh [1, bz+1) <- Q [0, bz+2) ----
        dq_new = slopes_unsplit(tile_params, q_slab(0, bz + 2), xp=BOX)
        for k, f in enumerate(dq_new):
            store(dq_bufs[k], f"dq{k}", f, 1, bz, lambda p: p + 1)

        def dq_tuple(lo, n):
            out = []
            for k in range(3):
                oy, rows = meta[f"dq{k}"]
                out.append(BoxField(
                    dq_bufs[k][:, lo + 1 : lo + 1 + n, 0:rows, :], lo, oy
                ))
            return tuple(out)

        # ---- trace fresh [0, bz+1) (in-plane); carry qm_z's top ----
        qm, qp = trace_unsplit_hydro(
            tile_params, q_slab(0, bz + 1), dq_tuple(0, bz + 1), dt,
            xp=BOX,
        )
        store(qmz_b, "qmz", qm[2], 0, bz + 1, lambda p: p + 1)

        def qmz_carried():
            oy, rows = meta["qmz"]
            return BoxField(qmz_b[:, 0 : bz + 1, 0:rows, :], -1, oy)

        # ---- directional fluxes (godunov.compute_fluxes, with the z
        # direction reading the ring-carried qm_z slab: its shift_m(_Z)
        # then aligns at the consuming face) ----
        def permute(q, perm):
            return BOX.stack([q[i] for i in perm])

        def flux_dir(d, qm_d, qp_d):
            axis = _AXIS[d]
            perm = tuple(_rotation(params, d))
            ql = permute(BOX.shift_m(qm_d, axis), perm)
            qr = permute(qp_d, perm)
            return permute(
                riemann_hydro(tile_params, ql, qr, xp=BOX), perm
            )

        fluxes = (
            flux_dir(0, qm[0], qp[0]),
            flux_dir(1, qm[1], qp[1]),
            flux_dir(2, qmz_carried(), qp[2]),
        )

        # ---- conservative update of planes [0, bz) ----
        def crop(f):
            return BOX.crop(f, 0, bz, YB, YB + by, 0, nx)

        upd = crop(u_slab(0, bz))
        for d in range(3):
            axis = _AXIS[d]
            flux = fluxes[d]
            upd = upd + (dt / dtdd_div[d]) * crop(
                flux - BOX.shift_p(flux, axis)
            )

        if with_inv_dt:
            # per-cell CFL of the updated block (cmpdt.cuh:84-86);
            # exactly compute_inv_dt_hydro's expression, max-reduced
            Q_upd, c_upd = constoprim_hydro(tile_params, upd)
            inv_blk = (
                (c_upd + jnp.abs(Q_upd[2])) / params.dx
                + (c_upd + jnp.abs(Q_upd[3])) / params.dy
                + (c_upd + jnp.abs(Q_upd[4])) / params.dz
            )

            @pl.when(i == 0)
            def _():
                acc[0, 0] = jnp.zeros((), dtype)

            @pl.when(zi > 0)
            def _():
                acc[0, 0] = jnp.maximum(acc[0, 0], jnp.max(inv_blk))

            @pl.when(
                jnp.logical_and(yi == nyb - 1, zi == nzb)
            )
            def _():
                inv_ref[0, 0] = acc[0, 0]

        # ---- output DMAs (same spec + deferred-drain bookkeeping as the
        # MHD zcarry kernel) ----
        j = yi * nzb + (zi - 1)
        slot = jax.lax.rem(j, jnp.int32(2))

        def out_dmas(z, y, s):
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

        def run(lst, op):
            for cond, copy in lst:
                if cond is True:
                    op(copy)
                else:
                    pl.when(cond)(lambda c=copy: op(c))

        jp2 = j - 2
        zp2 = jax.lax.rem(jp2, jnp.int32(nzb))
        yp2 = jax.lax.div(jp2, jnp.int32(nzb))

        @pl.when(jnp.logical_and(zi > 0, jp2 >= 0))
        def _():
            run(out_dmas(zp2, yp2, slot), lambda c: c.wait())

        @pl.when(zi > 0)
        def _():
            res[slot] = upd
            run(out_dmas(zi - 1, yi, slot), lambda c: c.start())

        last_j = nyb * nzb - 1
        jp1 = j - 1
        zp1 = jax.lax.rem(jp1, jnp.int32(nzb))
        yp1 = jax.lax.div(jp1, jnp.int32(nzb))

        @pl.when(jnp.logical_and(zi > 0, j == last_j))
        def _():
            run(out_dmas(nzb - 1, nyb - 1, slot), lambda c: c.wait())

            @pl.when(jp1 >= 0)
            def _():
                run(out_dmas(zp1, yp1, 1 - slot), lambda c: c.wait())

    p_shape = jax.ShapeDtypeStruct(
        (nv, nz + 2 * g, ny + 2 * YB, nx), dtype
    )
    scratch = [
        pltpu.VMEM((nv, bz + 4, wy, nx), dtype),            # U
        pltpu.VMEM((nv, bz + 4, rows_c, nx), dtype),        # Q
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # dqx
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # dqy
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # dqz
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # qm_z
        pltpu.VMEM((2, nv, bz, by, nx), dtype),             # result
    ]
    if with_inv_dt:
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (p_shape, jax.ShapeDtypeStruct((1, 1), dtype))
        scratch += [pltpu.SMEM((1, 1), dtype)]               # acc
    else:
        out_specs = pl.BlockSpec(memory_space=pltpu.ANY)
        out_shape = p_shape
    scratch += [
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA((2,)),
    ]

    fused = pl.pallas_call(
        kernel,
        grid=(nyb, nzb + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def step_packed(P, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(P.dtype)
        P, dt_arr = jax.lax.optimization_barrier((P, dt_arr))
        if with_inv_dt:
            P_new, inv = jax.lax.optimization_barrier(fused(dt_arr, P))
            return P_new, inv[0, 0]
        return jax.lax.optimization_barrier(fused(dt_arr, P))

    return step_packed
