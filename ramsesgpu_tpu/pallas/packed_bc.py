"""Padded-carry Pallas step for NON-periodic (mixed simple-BC) 3D grids.

The all-periodic advance (pallas/packed_io.py) carries an x-ghost-free
packed state whose wrap ghosts are re-written in-kernel.  Non-periodic
runs (implode's six reflecting walls, RT's mixed walls, ...) so far paid
three whole-state XLA passes per step instead: pad the ghosted state to
lane-aligned width, launch, then concat-rebuild the ghost frame
(57.2 ms/step at 256^3 vs a ~42 ms kernel, scripts/hydro_phase_timing).

Here the loop state IS the lane-padded ghosted array and never leaves it:

    S [nvar, nz+2g, ny+2*YB, WX]   WX = 128-ceil(nx+2g)

  - x ghosts live IN the lane row at [0,g) and [g+nx, 2g+nx); lanes
    beyond hold junk that no stencil ever consumes (the update's total
    input reach is exactly g, and the band rewrite below refreshes every
    lane a stencil can see).
  - y ghosts live in YB=8-row bands (TPU sublane DMA alignment); only
    the inner g rows carry live data, as in packed_io.
  - z ghosts are g plain rows.

Each tile's kernel iteration computes the interior update, REBUILDS the
ghost lanes/bands it owns from the freshly updated values (the moral
equivalent of the reference's make_boundary<BC,loc> template set,
reference: src/hydro/make_boundary_base.h:33-40 and :709-1332) and DMAs
interior + bands straight back into the S layout — the separate fill and
merge passes disappear.  Band contents are bitwise-identical to
solvers/boundary.make_boundaries' X-then-Y-then-Z sequencing: x ghost
lanes are rewritten first inside each row, y bands are built from rows
that already carry x ghosts, z bands from planes that carry both, and
corner blocks compose the z rule over the y rule.

BC rules per face (solvers/boundary.ghost_band):
  BC_PERIODIC   wrap copy (written by the OPPOSITE edge tile, like
                packed_io's wrap bands)
  BC_DIRICHLET  mirror with the normal velocity (and face-B for MHD)
                sign-flipped (written by the SAME edge tile)
  BC_NEUMANN    edge copy (same-side tile)
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams
from ..core.constants import (
    IA,
    IB,
    IC,
    ID,
    IP,
    IU,
    IV,
    IW,
    BoundaryConditionType as BCT,
)
from .packed_io import YB, _interpret_flag

_SIMPLE = (BCT.BC_PERIODIC, BCT.BC_DIRICHLET, BCT.BC_NEUMANN)
# normal velocity / face-B channel per axis index (0=x, 1=y, 2=z)
_NVEL = (IU, IV, IW)
_NB = (IA, IB, IC)


def padded_width(params: RunParams) -> int:
    """Lane-aligned row width holding interior + 2g x-ghost lanes."""
    return -(-(params.nx + 2 * params.ghost_width) // 128) * 128


def packed_bc_supported(params: RunParams, tiles=None) -> bool:
    from .fused_hydro3d import _pick_tiles, hydro_pallas_supported

    bz, by = tiles or params.pallas_tiles or _pick_tiles(params)
    return (
        hydro_pallas_supported(params)
        and all(b in _SIMPLE for b in params.boundary_types)
        and not all(b == BCT.BC_PERIODIC for b in params.boundary_types)
        and params.nz % bz == 0
        and params.ny % by == 0
        and by >= YB
        and bz >= params.ghost_width
    )


def _make_flip(params: RunParams, axis: int, nv: int):
    """Per-channel sign application of the DIRICHLET mirror along
    ``axis`` (0=x, 1=y, 2=z) — solvers/boundary.ghost_band's sign vector,
    expressed as channel-slice negation (Pallas kernels cannot capture
    array constants)."""
    flipped = {_NVEL[axis]}
    if params.mhd:
        flipped.add(_NB[axis])

    def flip(arr):
        parts = [
            -arr[ch : ch + 1] if ch in flipped else arr[ch : ch + 1]
            for ch in range(nv)
        ]
        return jnp.concatenate(parts, axis=0)

    return flip


def pack_bc_state(params: RunParams, U_ghosted: jnp.ndarray) -> jnp.ndarray:
    """Ghosted state (valid ghosts) -> padded loop layout."""
    g = params.ghost_width
    wx = padded_width(params)
    pad_x = wx - U_ghosted.shape[-1]
    return jnp.pad(
        U_ghosted,
        ((0, 0), (0, 0), (YB - g, YB - g), (0, pad_x)),
        mode="edge",
    )


def unpack_bc_state(params: RunParams, S: jnp.ndarray) -> jnp.ndarray:
    """Padded loop layout -> interior-only block."""
    g = params.ghost_width
    return S[:, g : g + params.nz, YB : YB + params.ny, g : g + params.nx]


def make_packed_bc_step(
    params: RunParams,
    tiles: tuple[int, int],
    interior_update: Callable,
    interpret: bool = False,
) -> Callable:
    """Build ``step(S, dt) -> S_new`` on the padded loop layout.

    ``interior_update(tile_params, U_boxfield, dt, margin)`` must return
    full-width updated rows [nvar, bz, by, WX] whose lanes [g, g+nx) hold
    the true update (the same contract as packed_io, with x uncropped).
    """
    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles
    if nz % bz or ny % by or by < YB or bz < g:
        raise ValueError(f"tiles {(bz, by)} unsupported for {(nz, ny)}")
    wx = padded_width(params)
    wz = bz + 2 * g
    wy = by + 2 * YB
    nzb, nyb = nz // bz, ny // by
    grid = (nzb, nyb)
    bts = params.boundary_types  # (xmin, xmax, ymin, ymax, zmin, zmax)

    # x uncropped: the update returns full WX rows (junk outside the
    # stencil-valid [g, g+nx) region, rewritten by the band fill below)
    tile_params = params.replace(
        nx=wx, ny=by, nz=bz,
        xmax=params.xmin + wx * params.dx,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    sgn_x = _make_flip(params, 0, nv)
    sgn_y = _make_flip(params, 1, nv)
    sgn_z = _make_flip(params, 2, nv)

    def fill_x_lanes(rows):
        """Rewrite the x ghost lanes of updated rows [nv, ..., WX] from
        their fresh interior — boundary.ghost_band's X fill, in-row."""
        mid = rows[..., g : g + nx]

        def band(bc, is_max):
            if bc == BCT.BC_PERIODIC:
                return (mid[..., :g] if is_max else mid[..., nx - g :])
            if bc == BCT.BC_NEUMANN:
                edge = mid[..., nx - 1 :] if is_max else mid[..., :1]
                return jnp.concatenate([edge] * g, axis=-1)
            # BC_DIRICHLET: band[k] = sgn * mid[g-1-k] (min) /
            #               band[k] = sgn * mid[nx-1-k] (max)
            if is_max:
                cols = [sgn_x(mid[..., nx - 1 - k : nx - k])
                        for k in range(g)]
            else:
                cols = [sgn_x(mid[..., g - 1 - k : g - k])
                        for k in range(g)]
            return jnp.concatenate(cols, axis=-1)

        parts = [band(bts[0], False), mid, band(bts[1], True)]
        if wx > 2 * g + nx:
            parts.append(rows[..., 2 * g + nx :])
        return jnp.concatenate(parts, axis=-1)

    # Band layouts (matching solvers/boundary.ghost_band, whose band[j]
    # in ascending layout order is: MIN side sgn*mid[g-1-j], MAX side
    # sgn*mid[n-1-j]; periodic MIN mid[n-g+j], MAX mid[j]):
    #   y LOW band block = S rows [0, YB): rows [0, YB-g) junk, row
    #     YB-g+j = band[j]; y HIGH block = S rows [YB+ny, +YB): row j =
    #     band[j], rows [g, YB) junk.
    #   z LOW band = S planes [0, g): plane j = band[j]; HIGH symmetric.

    def band_rows_y(rows, side_max, n_rows):
        """The YB-row y band built from this tile's updated rows (which
        already carry x ghosts).  ``n_rows`` is the row count of ``rows``
        along y (by for tiles, g for z-band compositions)."""
        bc = bts[3] if side_max else bts[2]
        n = n_rows
        if bc == BCT.BC_PERIODIC:
            # written by the opposite edge tile: plain neighbor rows
            # (outer YB-g rows carry valid wrap data — harmless)
            return rows[:, :, :YB] if side_max else rows[:, :, n - YB :]
        if bc == BCT.BC_NEUMANN:
            edge = rows[:, :, n - 1 : n] if side_max else rows[:, :, :1]
            live = [edge] * g
        elif side_max:
            live = [sgn_y(rows[:, :, n - 1 - j : n - j]) for j in range(g)]
        else:
            live = [sgn_y(rows[:, :, g - 1 - j : g - j]) for j in range(g)]
        junk = [live[0]] * (YB - g)
        order = live + junk if side_max else junk + live
        return jnp.concatenate(order, axis=2)

    def band_planes_z(rows, side_max, n_planes):
        """The g-plane z band from this tile's updated planes (or from a
        y band, for the corner composition)."""
        bc = bts[5] if side_max else bts[4]
        n = n_planes
        if bc == BCT.BC_PERIODIC:
            return rows[:, :g] if side_max else rows[:, n - g :]
        if bc == BCT.BC_NEUMANN:
            edge = rows[:, n - 1 : n] if side_max else rows[:, :1]
            return jnp.concatenate([edge] * g, axis=1)
        if side_max:
            pls = [sgn_z(rows[:, n - 1 - j : n - j]) for j in range(g)]
        else:
            pls = [sgn_z(rows[:, g - 1 - j : g - j]) for j in range(g)]
        return jnp.concatenate(pls, axis=1)

    # which edge tile writes each band: periodic -> the opposite edge
    # (wrap source), else the same edge (mirror/copy source)
    def writer_z(side_max):
        bc = bts[5] if side_max else bts[4]
        if bc == BCT.BC_PERIODIC:
            return 0 if side_max else nzb - 1
        return nzb - 1 if side_max else 0

    def writer_y(side_max):
        bc = bts[3] if side_max else bts[2]
        if bc == BCT.BC_PERIODIC:
            return 0 if side_max else nyb - 1
        return nyb - 1 if side_max else 0

    def kernel(dt_ref, s_hbm, out_ref, win, res, ybl, ybh, zbl, zbh,
               c00, c01, c10, c11, sem, sem_out):
        from ..ops.backend import BoxField

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        i = zi * nyb + yi
        n_iter = nzb * nyb
        slot = jax.lax.rem(i, jnp.int32(2))

        def in_dma(z, y, s):
            return pltpu.make_async_copy(
                s_hbm.at[:, pl.ds(z * bz, wz), pl.ds(y * by, wy), :],
                win.at[s],
                sem.at[s],
            )

        @pl.when(i == 0)
        def _():
            in_dma(zi, yi, slot).start()

        @pl.when(i + 1 < n_iter)
        def _():
            yn = yi + 1
            zn = jnp.where(yn == nyb, zi + 1, zi)
            yn = jnp.where(yn == nyb, 0, yn)
            in_dma(zn, yn, 1 - slot).start()

        in_dma(zi, yi, slot).wait()

        def out_dmas(z, y, s):
            """Interior block + the ghost bands this tile owns.  Band
            sources are the dedicated VMEM buffers (filled below); the
            interior source is res.  Same build-as-list discipline as
            packed_io.make_packed_io_step."""
            zmain = pl.ds(g + z * bz, bz)
            ymain = pl.ds(YB + y * by, by)
            zlow, zhigh = pl.ds(0, g), pl.ds(nz + g, g)
            ylow, yhigh = pl.ds(0, YB), pl.ds(YB + ny, YB)
            specs = [
                (True, res.at[s], (zmain, ymain)),
                (z == writer_z(False), zbl.at[s], (zlow, ymain)),
                (z == writer_z(True), zbh.at[s], (zhigh, ymain)),
                (y == writer_y(False), ybl.at[s], (zmain, ylow)),
                (y == writer_y(True), ybh.at[s], (zmain, yhigh)),
                (jnp.logical_and(z == writer_z(False),
                                 y == writer_y(False)),
                 c00.at[s], (zlow, ylow)),
                (jnp.logical_and(z == writer_z(False),
                                 y == writer_y(True)),
                 c01.at[s], (zlow, yhigh)),
                (jnp.logical_and(z == writer_z(True),
                                 y == writer_y(False)),
                 c10.at[s], (zhigh, ylow)),
                (jnp.logical_and(z == writer_z(True),
                                 y == writer_y(True)),
                 c11.at[s], (zhigh, yhigh)),
            ]
            return [
                (cond,
                 pltpu.make_async_copy(src, out_ref.at[:, dz, dy, :],
                                       sem_out.at[s]))
                for cond, src, (dz, dy) in specs
            ]

        # drain the DMAs iteration i-2 issued from this slot's buffers
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

        U = BoxField(win[slot, :, :, YB - g : YB + by + g, :], 0, YB - g)
        upd = interior_update(tile_params, U, dt_ref[0, 0], (g, YB, 0))
        rows = fill_x_lanes(upd)
        res[slot] = rows

        # ghost bands from the freshly updated rows (X ghosts already in)
        yb_lo = band_rows_y(rows, False, by)
        yb_hi = band_rows_y(rows, True, by)
        ybl[slot] = yb_lo
        ybh[slot] = yb_hi
        zbl[slot] = band_planes_z(rows, False, bz)
        zbh[slot] = band_planes_z(rows, True, bz)
        # corners: z rule over the y band (X -> Y -> Z fill sequencing)
        c00[slot] = band_planes_z(yb_lo, False, bz)
        c01[slot] = band_planes_z(yb_hi, False, bz)
        c10[slot] = band_planes_z(yb_lo, True, bz)
        c11[slot] = band_planes_z(yb_hi, True, bz)

        for cond, copy in out_dmas(zi, yi, slot):
            if cond is True:
                copy.start()
            else:
                pl.when(cond)(copy.start)

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

    s_shape = jax.ShapeDtypeStruct((nv, nz + 2 * g, ny + 2 * YB, wx), dtype)
    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt (1,1)
            pl.BlockSpec(memory_space=pltpu.ANY),   # S stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=s_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nv, wz, wy, wx), dtype),   # windows
            pltpu.VMEM((2, nv, bz, by, wx), dtype),   # results
            pltpu.VMEM((2, nv, bz, YB, wx), dtype),   # y band low
            pltpu.VMEM((2, nv, bz, YB, wx), dtype),   # y band high
            pltpu.VMEM((2, nv, g, by, wx), dtype),    # z band low
            pltpu.VMEM((2, nv, g, by, wx), dtype),    # z band high
            pltpu.VMEM((2, nv, g, YB, wx), dtype),    # corner z-lo y-lo
            pltpu.VMEM((2, nv, g, YB, wx), dtype),    # corner z-lo y-hi
            pltpu.VMEM((2, nv, g, YB, wx), dtype),    # corner z-hi y-lo
            pltpu.VMEM((2, nv, g, YB, wx), dtype),    # corner z-hi y-hi
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def step_bc(S, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(S.dtype)
        S, dt_arr = jax.lax.optimization_barrier((S, dt_arr))
        return jax.lax.optimization_barrier(fused(dt_arr, S))

    return step_bc


def make_packed_cfl_hydro(
    params: RunParams, x_off: int = 0, wx: int | None = None,
    interpret: bool = False,
):
    """``inv_dt(S) -> scalar``: the hydro CFL reduction as ONE streaming
    Pallas kernel (the hydro twin of packed_io.make_packed_cfl_mhd;
    reference block reduction: src/hydro/cmpdt.cuh:43-230).  Serves both
    loop layouts: the x-ghost-free packed state (x_off=0, wx=nx) and the
    padded BC state (x_off=g, wx=padded_width).  Bit-identical to
    solvers/timestep.compute_inv_dt_hydro on the interior (same per-cell
    formula chain; max is exactly associative)."""
    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    wy = ny + 2 * YB
    wx = wx if wx is not None else nx
    itemsize = 8 if params.dtype == "float64" else 4
    bzc = next(
        (b for b in (8, 4, 2, 1)
         if nz % b == 0
         and 2 * nv * b * wy * wx * itemsize <= 40 * 1024 * 1024),
        None,
    )
    if bzc is None:
        return None
    nzb = nz // bzc

    def kernel(s_hbm, out_ref, win, sem):
        zi = pl.program_id(0)
        slot = jax.lax.rem(zi, jnp.int32(2))

        def in_dma(z, s):
            return pltpu.make_async_copy(
                s_hbm.at[:nv, pl.ds(g + z * bzc, bzc), :, :],
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
        W = win[slot][:, :, YB : YB + ny, x_off : x_off + nx]
        # compute_inv_dt_hydro's fused chain, per cell (identical op
        # order -> identical rounding -> bitwise-equal reduction)
        rho = jnp.maximum(W[ID], params.smallr)
        u = W[IU] / rho
        v = W[IV] / rho
        w = W[IW] / rho
        if params.c_iso > 0:
            c = jnp.full_like(rho, params.c_iso)
        else:
            eken = 0.5 * ((u * u + v * v) + w * w)
            eint = W[IP] / rho - eken
            p = jnp.maximum(
                (params.gamma0 - 1.0) * rho * eint, rho * params.smallp
            )
            c = jnp.sqrt(params.gamma0 * p / rho)
        inv = (
            (c + jnp.abs(u)) / params.dx
            + (c + jnp.abs(v)) / params.dy
            + (c + jnp.abs(w)) / params.dz
        )
        prev = jnp.where(zi == 0, jnp.zeros_like(out_ref[0, 0]),
                         out_ref[0, 0])
        out_ref[0, 0] = jnp.maximum(prev, jnp.max(inv))

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    fused = pl.pallas_call(
        kernel,
        grid=(nzb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nv, bzc, wy, wx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def inv_dt(S):
        S = jax.lax.optimization_barrier(S)
        return jax.lax.optimization_barrier(fused(S))[0, 0]

    return inv_dt
