"""Fused Pallas kernel for the 3D MHD dissipative sub-step.

TPU replacement of the reference's viscosity/resistivity kernel launches
(reference: src/hydro/viscosity.cuh:412+, resistivity.cuh:233-471 +
mhd_ct_update.cuh, sequenced in mhd_godunov_unsplit_cpu_v1.cpp:300-345):
one kernel streams halo-extended windows through VMEM and runs
resistive EMF -> CT -> resistive energy flux (from the CT-updated B) ->
viscous stress fluxes per window (solvers/dissipation.py
mhd_dissipation_interior_update, box-tracked).

Shearing-box runs also need the resistive emfY/emfZ planes at the domain
xmax face (the CT update of the KEPT Bx face): they ride along as two
extra lane-broadcast output channels, same trick as fused_mhd3d's shear
kernel.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams


def _interpret_flag() -> bool:
    from .. import pallas as _pkg

    return bool(getattr(_pkg, "INTERPRET", False))


def _pick_tiles(params: RunParams) -> tuple[int, int]:
    for bz, by in ((8, 32), (8, 16), (8, 8), (4, 8), (2, 8), (1, 8)):
        if params.nz % bz == 0 and params.ny % by == 0:
            return bz, by
    return 1, params.ny


def dissip_pallas_supported(params: RunParams) -> bool:
    return (
        params.dim == 3
        and params.mhd
        and (params.nu > 0 or params.eta > 0)
        and params.ny % 8 == 0
        and params.dtype == "float32"
    )


def make_fused_mhd_dissipation(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    shear_planes: bool = False,
) -> Callable:
    """Build ``update(U_ghosted, dt) -> U_interior_new`` (or, with
    ``shear_planes``, ``-> (U_interior_new, eypl, ezpl)`` where the planes
    are the resistive emfY/emfZ at the domain xmax face, interior extent).
    Input is the boundary-FILLED ghosted state (the reference refills
    between the Godunov and dissipative phases)."""
    if not dissip_pallas_supported(params):
        raise ValueError("configuration outside the fused dissipation kernel")
    from ..solvers.dissipation import mhd_dissipation_interior_update

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by:
        raise ValueError(f"tiles {(bz, by)} must divide {(nz, ny)}")
    m = g
    wz = bz + 2 * m
    wy = -(-(by + 2 * m) // 8) * 8
    wx = -(-(nx + 2 * m) // 128) * 128
    grid = (nz // bz, ny // by)
    nzb, nyb = grid
    pad_y = wy - (by + 2 * m)

    tile_params = params.replace(
        ny=by,
        nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )
    n_extra = 2 if shear_planes else 0
    nv1 = params.nb_var + n_extra

    def kernel(dt_ref, u_hbm, out_ref, win, sem):
        from ..ops.backend import BOX, BoxField

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        i = zi * nyb + yi
        slot = jax.lax.rem(i, jnp.int32(2))

        def in_dma(z, y, s):
            return pltpu.make_async_copy(
                u_hbm.at[:, pl.ds(z * bz, wz), pl.ds(y * by, wy), :],
                win.at[s],
                sem.at[s],
            )

        @pl.when(i == 0)
        def _():
            in_dma(zi, yi, slot).start()

        @pl.when(i + 1 < nzb * nyb)
        def _():
            yn = yi + 1
            zn = jnp.where(yn == nyb, zi + 1, zi)
            yn = jnp.where(yn == nyb, 0, yn)
            in_dma(zn, yn, 1 - slot).start()

        in_dma(zi, yi, slot).wait()
        U = BoxField(win[slot], 0, 0)
        if shear_planes:
            U_new, eypl, ezpl = mhd_dissipation_interior_update(
                tile_params, U, dt_ref[0, 0], margin=(m, m, m), xp=BOX,
                shear_planes=True,
            )
            row = (bz, by, nx)
            chans = [
                jnp.broadcast_to(p[..., None], row)[None]
                for p in (eypl, ezpl)
            ]
            out_ref[...] = jnp.concatenate([U_new] + chans, axis=0)
        else:
            out_ref[...] = mhd_dissipation_interior_update(
                tile_params, U, dt_ref[0, 0], margin=(m, m, m), xp=BOX,
            )

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    out_shape = jax.ShapeDtypeStruct((nv1, nz, ny, nx), dtype)

    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nv1, bz, by, nx), lambda zi, yi: (0, zi, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, params.nb_var, wz, wy, wx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    nb = params.nb_var

    def update(U_ghosted, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(U_ghosted.dtype)
        pad = wx - U_ghosted.shape[-1]
        U_padded = jnp.pad(
            U_ghosted, ((0, 0), (0, 0), (0, pad_y), (0, pad))
        )
        U_padded, dt_arr = jax.lax.optimization_barrier((U_padded, dt_arr))
        out = jax.lax.optimization_barrier(fused(dt_arr, U_padded))
        if not shear_planes:
            return out[:nb]
        return out[:nb], out[nb, :, :, 0], out[nb + 1, :, :, 0]

    return update
