"""Fused Pallas stencil kernel for the 3D hydro step.

The hydro twin of pallas/fused_mhd3d.py (see that module for the window /
DMA-alignment / margin design, which this shares): one kernel runs
primitives -> slopes -> trace -> Riemann -> flux update per halo-extended
VMEM window. Ghost width is 2 for hydro; the APPROX Riemann solver's
iteration unrolls fine inside the kernel.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import RunParams
from ..core.constants import BoundaryConditionType as BCT



def _interpret_flag() -> bool:
    from .. import pallas as _pkg

    return bool(getattr(_pkg, "INTERPRET", False))

def _pick_tiles(params: RunParams) -> tuple[int, int]:
    for bz, by in ((8, 32), (8, 16), (8, 8), (4, 8), (2, 8), (1, 8)):
        if params.nz % bz == 0 and params.ny % by == 0:
            return bz, by
    return 1, params.ny


def hydro_pallas_supported(params: RunParams) -> bool:
    return (
        params.dim == 3
        and not params.mhd
        and params.nu == 0.0
        and params.ny % 8 == 0
        and params.dtype == "float32"  # TPU Pallas has no f64 vregs
        and params.problem not in ("jet", "Jet")  # jet rewrites ghosts mid-fill
    )


def make_fused_hydro_update(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
) -> Callable:
    """Build ``update(U_ghosted, dt) -> U_interior_new`` (gravity-free).
    The fully-periodic packed advance loop uses
    ``make_fused_hydro_packed_io`` instead."""
    if not hydro_pallas_supported(params):
        raise ValueError("fused hydro kernel does not cover this configuration")

    from ..solvers.godunov import hydro_3d_interior_update

    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by:
        raise ValueError(f"tiles {(bz, by)} must divide {(nz, ny)}")

    m = g
    wz = bz + 2 * m
    wy = -(-(by + 2 * m) // 8) * 8
    periodic_x = (
        params.boundary_xmin == BCT.BC_PERIODIC
        and params.boundary_xmax == BCT.BC_PERIODIC
        and nx % 128 == 0
    )
    if periodic_x:
        wx, mx = nx, 0
    else:
        wx = -(-(nx + 2 * m) // 128) * 128
        mx = m
    grid = (nz // bz, ny // by)
    pad_y = wy - (by + 2 * m)

    tile_params = params.replace(
        ny=by, nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    nzb, nyb = grid

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

        # double-buffered input: overlap the next window's fetch with this
        # window's compute (the blocking per-window copy serialized ~19 ms
        # of margin re-read DMA against ~20 ms of compute at 256^3 —
        # measured 43.4 ms/launch before this, scripts/hydro_phase_timing)
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
        # box-tracked pipeline: intermediates shrink in z/y (ops/backend.py)
        out_ref[...] = hydro_3d_interior_update(
            tile_params, BoxField(win[slot], 0, 0), dt_ref[0, 0],
            margin=(m, m, mx), xp=BOX,
        )

    out_shape = jax.ShapeDtypeStruct(
        (nv, nz, ny, nx),
        jnp.float64 if params.dtype == "float64" else jnp.float32,
    )
    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nv, bz, by, nx), lambda zi, yi: (0, zi, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nv, wz, wy, wx), out_shape.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def update(U_ghosted, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(U_ghosted.dtype)
        if periodic_x:
            U_ghosted = U_ghosted[..., g:-g]
        pad = wx - U_ghosted.shape[-1]
        U_padded = jnp.pad(U_ghosted, ((0, 0), (0, 0), (0, pad_y), (0, pad)))
        U_padded, dt_arr = jax.lax.optimization_barrier((U_padded, dt_arr))
        return jax.lax.optimization_barrier(fused(dt_arr, U_padded))

    return update


def hydro_packed_supported(params: RunParams) -> bool:
    """Packed-state advance loop viability (see fused_mhd3d twin)."""
    from .packed_io import YB

    bz, by = params.pallas_tiles or _pick_tiles(params)
    return (
        hydro_pallas_supported(params)
        and all(b == BCT.BC_PERIODIC for b in params.boundary_types)
        and params.nx % 128 == 0
        # packed-io kernel tile constraints (pallas/packed_io.py)
        and bz >= params.ghost_width
        and by >= YB
        and params.nz % bz == 0
        and params.ny % by == 0
    )


def make_fused_hydro_packed_io(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
) -> Callable:
    """``step_packed(P, dt) -> P_new`` on the packed loop state (see
    pallas/packed_io.py): the whole hydro pipeline plus the ghost re-pack
    in ONE kernel launch per step."""
    from .packed_io import make_packed_io_step
    from ..solvers.godunov import hydro_3d_interior_update
    from ..ops.backend import BOX

    def update(tile_params, U, dt, margin):
        return hydro_3d_interior_update(
            tile_params, U, dt, margin=margin, xp=BOX
        )

    return make_packed_io_step(
        params, tiles or _pick_tiles(params), update, interpret=interpret
    )


def make_pallas_hydro_advance_n(
    params: RunParams, packed_form: bool = False
) -> Callable:
    """Packed-state advance loop for fully-periodic 3D hydro — the hydro
    twin of fused_mhd3d.make_pallas_advance_n (hydro's inv-dt pass reads no
    ghosts at all, so dt comes straight off slices of the packed state).

    ``packed_form=True`` returns ``(pack, advance_packed, unpack)`` so
    chunked drivers can carry the packed state across chunk boundaries
    (see fused_mhd3d.make_pallas_advance_n and step.make_packed_advance_chain)."""
    from .packed_io import YB, pack_state
    from ..solvers.timestep import compute_inv_dt_hydro

    g = params.ghost_width
    ny = params.ny
    bz, by = params.pallas_tiles or _pick_tiles(params)
    zcarry = params.kernel == "zcarry"
    if zcarry:
        # opt-in z-block-streaming hydro kernel ([implementation]
        # kernel=zcarry): carried stage planes, 1.0x DMA per step, and a
        # fully in-kernel CFL reduction (pallas/zcarry_hydro3d.py)
        from .zcarry_hydro3d import (
            make_zcarry_hydro_packed_io,
            zcarry_hydro_supported,
        )

        if not zcarry_hydro_supported(params):
            raise ValueError("configuration outside the hydro zcarry kernel")
        fused = make_zcarry_hydro_packed_io(params, tiles=(bz, by),
                                            with_inv_dt=True)
    else:
        fused = make_fused_hydro_packed_io(params, tiles=(bz, by))
    t_end = params.t_end

    def dt_of(P):
        interior = P[:, g : g + params.nz, YB : YB + ny, :]
        return params.cfl / compute_inv_dt_hydro(params, interior, ghost=0)

    def advance_packed(P0, t, n_steps):
        if zcarry:
            inv0 = compute_inv_dt_hydro(
                params, P0[:, g : g + params.nz, YB : YB + ny, :], ghost=0
            )

            def cond_z(carry):
                _, _, t_c, k = carry
                in_time = (t_c < t_end) if t_end > 0 else True
                return jnp.logical_and(k < n_steps, in_time)

            def body_z(carry):
                P, inv, t_c, k = carry
                dt = params.cfl / inv
                P1, inv1 = fused(P, dt)
                return (P1, inv1, t_c + dt, k + 1)

            P_f, _, t_f, k_f = jax.lax.while_loop(
                cond_z, body_z, (P0, inv0, t, jnp.array(0, jnp.int32))
            )
            return P_f, t_f, k_f

        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            P, t_c, k = carry
            dt = dt_of(P)
            return (fused(P, dt), t_c + dt, k + 1)

        return jax.lax.while_loop(
            cond, body, (P0, t, jnp.array(0, jnp.int32))
        )

    def unpack(P_f):
        return jnp.pad(
            P_f[:, g:-g, YB : YB + ny, :], ((0, 0),) + ((g, g),) * 3,
            mode="wrap",
        )

    if packed_form:
        pack_j = jax.jit(
            lambda U: pack_state(params, U[:, g:-g, g:-g, g:-g]),
            donate_argnums=0,
        )
        adv_j = jax.jit(advance_packed, donate_argnums=0)
        return pack_j, adv_j, jax.jit(unpack)

    @jax.jit
    def advance_n(U, t, n_steps):
        P_f, t_f, k_f = advance_packed(
            pack_state(params, U[:, g:-g, g:-g, g:-g]), t, n_steps
        )
        return unpack(P_f), t_f, k_f

    return advance_n


def make_pallas_hydro_bc_advance_n(
    params: RunParams, packed_form: bool = False
) -> Callable:
    """Padded-carry advance loop for NON-periodic (mixed simple-BC) 3D
    hydro (pallas/packed_bc.py): the loop state stays in the lane-padded
    ghosted layout, ghost lanes/bands are rebuilt IN-KERNEL from the
    fresh update, and dt comes from the streaming CFL kernel — replacing
    the per-step pad + concat-fill + XLA-reduction passes of the ghosted
    step path (57.2 -> see PERF.md "hydro 3D (implode, approx)").
    The reference's equivalent machinery is the make_boundary<BC,loc>
    kernel set (src/hydro/make_boundary_base.h:33-40).

    ``packed_form=True`` returns ``(pack, advance_packed, unpack)`` for
    chunk-chained drivers (solvers/step.make_packed_advance_chain); the
    in-kernel ghost maintenance keeps the carried state's frame valid
    across chunk boundaries, so chaining is exact."""
    from ..solvers.boundary import make_boundaries_concat
    from ..solvers.godunov import hydro_3d_interior_update
    from ..solvers.timestep import compute_inv_dt_hydro
    from ..ops.backend import BOX
    from .packed_bc import (
        make_packed_bc_step,
        make_packed_cfl_hydro,
        pack_bc_state,
        packed_bc_supported,
        padded_width,
        unpack_bc_state,
    )

    g = params.ghost_width
    tiles = params.pallas_tiles or _pick_tiles(params)
    if not packed_bc_supported(params, tiles):
        raise ValueError("configuration outside the packed-BC hydro loop")

    def update(tile_params, U, dt, margin):
        return hydro_3d_interior_update(
            tile_params, U, dt, margin=margin, xp=BOX
        )

    fused = make_packed_bc_step(params, tiles, update)
    cfl = make_packed_cfl_hydro(params, x_off=g, wx=padded_width(params))
    t_end = params.t_end

    def dt_of(S):
        if cfl is not None:
            return params.cfl / cfl(S)
        return params.cfl / compute_inv_dt_hydro(
            params, unpack_bc_state(params, S), ghost=0
        )

    def advance_packed(S0, t, n_steps):
        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            S, t_c, k = carry
            dt = dt_of(S)
            return (fused(S, dt), t_c + dt, k + 1)

        return jax.lax.while_loop(
            cond, body, (S0, t, jnp.array(0, jnp.int32))
        )

    def unpack(S_f):
        return make_boundaries_concat(
            params, unpack_bc_state(params, S_f), interior_only=True
        )

    if packed_form:
        # ghosts must be valid on entry (Run fills them before the first
        # chunk; the kernel keeps them valid from then on)
        pack_j = jax.jit(
            lambda U: pack_bc_state(params, U), donate_argnums=0
        )
        adv_j = jax.jit(advance_packed, donate_argnums=0)
        return pack_j, adv_j, jax.jit(unpack)

    @jax.jit
    def advance_n(U, t, n_steps):
        # ghosts must be valid on entry (the run loop fills them before
        # the first chunk; every chunk returns them freshly filled)
        S_f, t_f, k_f = advance_packed(
            pack_bc_state(params, U), t, n_steps
        )
        return unpack(S_f), t_f, k_f

    return advance_n


def make_pallas_hydro_step_fn(params: RunParams) -> Callable:
    """(U, t) -> (U', dt) on the ghosted state, via the fused hydro kernel.

    All-periodic fast path: wrap-pad of the new interior replaces the
    boundary-fill + merge passes (see fused_mhd3d.make_pallas_step_fn)."""
    from ..solvers.boundary import make_boundaries
    from ..solvers.timestep import compute_dt

    fused = make_fused_hydro_update(params, tiles=params.pallas_tiles)
    g = params.ghost_width
    interior = (slice(None),) + (slice(g, -g),) * 3
    all_periodic = all(
        b == BCT.BC_PERIODIC for b in params.boundary_types
    )

    if all_periodic:

        def step(U, t):
            dt = compute_dt(params, U)
            new_int = fused(U, dt)
            U_new = jnp.pad(new_int, ((0, 0),) + ((g, g),) * 3, mode="wrap")
            return U_new, dt

    else:
        from ..solvers.boundary import (
            concat_fill_supported,
            make_boundaries_concat,
        )

        if concat_fill_supported(params):
            # ghosts are valid on entry (every step returns them freshly
            # filled; make_boundaries is idempotent so this matches the
            # whole-array fill-then-update ordering bitwise): one kernel
            # launch + one concat-based fill around the new interior
            # replaces fill (55.6 ms) + merge (9.9 ms) at 256^3 — the
            # make_boundary<BC,loc> band writes, batched per axis
            # (reference: make_boundary_base.h:33-40)
            def step(U, t):
                dt = compute_dt(params, U)
                new_int = fused(U, dt)
                U_new = make_boundaries_concat(
                    params, new_int, interior_only=True
                )
                return U_new, dt

        else:

            def step(U, t):
                dt = compute_dt(params, U)
                U_b = make_boundaries(params, U)
                new_int = fused(U_b, dt)
                U_new = U_b.at[interior].set(new_int)
                return U_new, dt

    return step
