"""Fused Pallas stencil kernel for the 3D MHD+CT step.

TPU replacement of the reference's CUDA kernel pipeline
(reference: godunov_unsplit_mhd.cuh + mhd_ct_update.cuh launched from
MHDRunGodunov.cpp): instead of materializing trace/edge states and fluxes in
HBM between kernels (which is also what the naive whole-array XLA pipeline
does — ~50 full-array round trips per step), ONE Pallas kernel streams
halo-extended windows of U through VMEM and runs the entire
primitives -> trace -> HLLD fluxes -> EMF -> CT pipeline per window.
HBM traffic drops to (read window overlap) + (write interior).

The kernel body *reuses the exact whole-array update function*
(solvers/godunov_mhd.py) on each VMEM window: the wrap-around rings of its
jnp.roll stencils fall inside the window halo, which is never written out —
the same invariant that makes the ghosted whole-array version correct.

Grid: (nz/BZ, ny/BY, nx/BX) over the interior; input windows carry
ghost_width halos on every side and are fetched by manual async DMA (halo'd
windows overlap, which BlockSpec tiling can't express).
"""
from __future__ import annotations

import functools
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
    """Pick (bz, by) tiles. x is never tiled: lane-dim DMA slices must be
    128-aligned, and full rows keep the stencil's x-halo free. by must be a
    multiple of 8 (output sublane tiling). Preference order measured on
    v5e at 256^3 (8,16) = 2.6e8 cells/s; smaller fallbacks for small grids
    or VMEM pressure.

    VMEM pressure scales with the ghosted window volume (bz+2m)(by+2m)nx
    (m=5, the stencil-chain margin): 256^3 at (8,32) fits the 128 MiB
    program cap, 512^3 at (8,32) measured 189.6M (OOM) while (8,8) fits
    (PERF_CAPABILITY.json round 4) — so larger-nx grids downshift to the
    first tile at or under the 256^3/(8,32) anchor volume."""
    m = 5
    budget = (8 + 2 * m) * (32 + 2 * m) * 256  # the known-good anchor
    for bz, by in ((8, 32), (8, 16), (8, 8), (4, 8), (2, 8), (1, 8)):
        if (
            params.nz % bz == 0
            and params.ny % by == 0
            and (bz + 2 * m) * (by + 2 * m) * params.nx <= budget
        ):
            return bz, by
    for bz, by in ((4, 8), (2, 8), (1, 8)):
        if params.nz % bz == 0 and params.ny % by == 0:
            return bz, by
    return 1, params.ny


def pallas_supported(params: RunParams) -> bool:
    """Whether the fused kernel covers this configuration."""
    return (
        params.dim == 3
        and params.mhd
        and params.omega0 == 0.0
        and params.nu == 0.0
        and params.eta == 0.0
        and params.ny % 8 == 0
        and params.dtype == "float32"  # TPU Pallas has no f64 vregs
    )


def make_fused_mhd_update(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    margin_extra: int = 0,
) -> Callable:
    """Build ``update(U_ghosted, dt) -> U_interior_new``.

    Requires omega0 == 0 (the rotating-frame xpos plumbing is not yet wired
    into the tiled path) and dim == 3. The fully-periodic packed advance
    loop uses ``make_fused_mhd_packed_io`` instead.
    """
    if params.dim != 3 or not params.mhd:
        raise ValueError("fused kernel currently covers the 3D MHD step")
    if params.omega0 > 0:
        raise ValueError("fused kernel does not support the rotating frame yet")

    from ..solvers.godunov_mhd import mhd_3d_interior_update

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by:
        raise ValueError(f"tiles {(bz, by)} must divide {(nz, ny)}")

    # window margin: the stencil chain's roll-wrap corruption reaches up to
    # 5 cells (see mhd_3d_interior_update docstring); windows need that much
    # true halo since their wrap is NOT periodic. z/y margins come from the
    # ghosted array, whose ghost width is only g=3 — so the windows reach
    # into ghost rows by (m - g) beyond: clamp the DMA at the array edge and
    # let interior tiles read neighbours' interiors.
    m = g + margin_extra
    wz = bz + 2 * m
    # sublane (dim -2) DMA slices must be 8-aligned in shape: round the
    # window height up and over-read rows above (never consumed)
    wy = -(-(by + 2 * m) // 8) * 8
    # x handling: for periodic x with nx a lane multiple, drop the x ghosts
    # entirely — full interior rows are exactly lane-aligned and the
    # in-window rolls wrap around the row, which IS the periodic BC. This
    # removes the 262->384 lane-padding waste (~46% of VPU work at 256^3).
    # Otherwise keep ghosted rows right-padded to the alignment.
    from ..core.constants import BoundaryConditionType as BCT

    periodic_x = (
        params.boundary_xmin == BCT.BC_PERIODIC
        and params.boundary_xmax == BCT.BC_PERIODIC
        and nx % 128 == 0
        and margin_extra == 0
    )
    if periodic_x:
        wx = nx
        mx = 0
    else:
        wx = -(-(nx + 2 * m) // 128) * 128
        mx = m
    grid = (nz // bz, ny // by)
    pad_y = wy - (by + 2 * m)  # extra top rows the last tile over-reads

    # a params view with the tile's extents — adjusting the domain bounds so
    # the *derived cell sizes dx/dy/dz stay identical* to the global grid
    tile_params = params.replace(
        ny=by,
        nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    def kernel(dt_ref, u_hbm, out_ref, win, sem):
        from ..ops.backend import BOX, BoxField

        zi = pl.program_id(0)
        yi = pl.program_id(1)
        copy = pltpu.make_async_copy(
            u_hbm.at[:, pl.ds(zi * bz, wz), pl.ds(yi * by, wy), :],
            win,
            sem,
        )
        copy.start()
        copy.wait()
        # box-tracked pipeline: every intermediate shrinks in z/y to exactly
        # the extent later stages consume (no wasted margin recompute; x rows
        # stay full width so in-row rolls keep the periodic-x semantics)
        U = BoxField(win[...], 0, 0)
        dt = dt_ref[0, 0]
        out_ref[...] = mhd_3d_interior_update(
            tile_params, U, dt, margin=(m, m, mx), xp=BOX
        )

    out_shape = jax.ShapeDtypeStruct(
        (params.nb_var, nz, ny, nx),
        jnp.float64 if params.dtype == "float64" else jnp.float32,
    )

    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt (1,) scalar
            pl.BlockSpec(memory_space=pltpu.ANY),   # U stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (params.nb_var, bz, by, nx),
            lambda zi, yi: (0, zi, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((params.nb_var, wz, wy, wx), out_shape.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def update(U_ghosted, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(U_ghosted.dtype)
        # grow the ghost margin from g to m on every axis: z/y/x-left get
        # (m - g) wrap rows (periodic-consistent for the corruption depth;
        # non-periodic BCs only ever consume the inner g of the halo)
        extra = m - g
        if extra:
            U_ghosted = jnp.pad(
                U_ghosted,
                ((0, 0), (extra, extra), (extra, extra), (extra, 0)),
                mode="wrap",
            )
        if periodic_x:
            # drop the x ghosts: the kernel's in-row wrap is the periodic BC
            U_ghosted = U_ghosted[..., g:-g]
        pad = wx - U_ghosted.shape[-1]
        U_padded = jnp.pad(
            U_ghosted, ((0, 0), (0, 0), (0, pad_y), (0, pad))
        )
        # keep XLA's fusion passes away from the custom call's operands
        # (address-change fusion around pallas custom-calls crashes the
        # 2026-08 libtpu fusion pass otherwise)
        U_padded, dt_arr = jax.lax.optimization_barrier((U_padded, dt_arr))
        out = fused(dt_arr, U_padded)
        return jax.lax.optimization_barrier(out)

    return update


from .packed_io import YB, make_packed_io_step, pack_state, unpack_state  # noqa: E402


def make_fused_mhd_packed_io(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    with_inv_dt: bool = False,
) -> Callable:
    """``step_packed(P, dt) -> P_new`` on the packed loop state (see
    pallas/packed_io.py for the layout and the in-kernel ghost-band DMA
    design): the whole MHD+CT pipeline plus the ghost re-pack in ONE kernel
    launch per step. ``with_inv_dt`` folds the in-tile part of the next
    step's CFL reduction into the launch (packed_io with_inv_dt_mhd) and
    returns ``(P_new, inv_partial)`` — complete it with
    timestep.compute_inv_dt_mhd_packed_seams."""
    if params.omega0 > 0:
        raise ValueError("packed-io kernel does not support the rotating frame")
    from ..solvers.godunov_mhd import mhd_3d_interior_update_staged
    from ..ops.backend import BOX

    nv = params.nb_var
    if params.compensated:
        # Kahan-compensated state accumulation: channels [0:nv] = U,
        # [nv:2nv] = the running compensation carry (see
        # godunov_mhd.mhd_apply_update comp docstring)
        def update(tile_params, W, dt, margin):
            return mhd_3d_interior_update_staged(
                tile_params, W[:nv], dt, margin=margin, xp=BOX, comp=W[nv:]
            )

        return make_packed_io_step(
            params, tiles or _pick_tiles(params), update,
            interpret=interpret, nvar=2 * nv, with_inv_dt_mhd=with_inv_dt,
        )

    def update(tile_params, U, dt, margin):
        # demand-driven stage extents: 2.08x -> 1.36x FLOP recompute at the
        # (8, 32) tile (scripts/margin_flops.py), same values bit-for-bit
        return mhd_3d_interior_update_staged(
            tile_params, U, dt, margin=margin, xp=BOX
        )

    return make_packed_io_step(
        params, tiles or _pick_tiles(params), update, interpret=interpret,
        with_inv_dt_mhd=with_inv_dt,
    )


def pallas_packed_supported(params: RunParams) -> bool:
    """Whether the packed-state advance loop applies: fused kernel viable,
    fully periodic (the wrap IS the ghost fill), lane-exact x, no jet dt
    term."""
    from ..core.constants import BoundaryConditionType as BCT

    bz, by = params.pallas_tiles or _pick_tiles(params)
    return (
        # dissipative runs append a second packed-io launch per step
        pallas_supported(params.replace(nu=0.0, eta=0.0))
        and all(b == BCT.BC_PERIODIC for b in params.boundary_types)
        and params.nx % 128 == 0
        and params.problem not in ("jet", "Jet")
        # packed-io kernel tile constraints (pallas/packed_io.py)
        and bz >= params.ghost_width
        and by >= YB
        and params.nz % bz == 0
        and params.ny % by == 0
    )


def make_pallas_advance_n(params: RunParams, packed_form: bool = False):
    """Jitted ``advance_n(U_ghosted, t, n) -> (U_ghosted', t', k)`` that
    carries the state in the kernel's packed form across the whole loop:
    [nvar, nz+2g, ny+2*YB, nx] — x ghost-free (lane-exact rows, the
    in-row roll wrap is the periodic BC), z wrap-ghosted by g, y wrap-ghosted
    by YB=8 rows (inner g live — sublane DMA alignment). The kernel writes
    the packed state directly (interior + wrap ghost bands, see
    make_fused_mhd_packed_io), so the loop body is ONE kernel launch plus a
    slice-based dt reduction; the reference's d_U/d_U2 ping-pong returns as
    XLA's buffer reuse across the while-loop carry.
    External contract unchanged (standard ghosted state in/out).

    ``packed_form=True`` returns ``(pack, advance_packed, unpack)`` instead,
    for capability-scale grids where the ghosted lane-padded external state
    (~5.5 GiB at 512^3) cannot coexist with the loop's packed double buffer:
    ``pack(U_ghosted) -> P`` (donates U), ``advance_packed(P, t, n) ->
    (P', t', k)`` (donates P — chain calls), ``unpack(P) -> U_ghosted``.
    Peak HBM in the loop is then ~2x the packed state instead of ~3.5x."""
    from ..solvers.timestep import compute_inv_dt_mhd_packed
    from .packed_io import make_packed_cfl_mhd

    g = params.ghost_width
    ny = params.ny
    nv = params.nb_var
    bz, by = params.pallas_tiles or _pick_tiles(params)
    dissip = params.nu > 0 or params.eta > 0
    zcarry = params.kernel == "zcarry"
    # fold the in-tile CFL into the LAST launch of the step and finish on
    # the seam cells only (packed_io with_inv_dt_mhd docstring); bz/by < 2
    # tiles have no in-tile +1 faces — those fall back to the CFL kernel.
    # Opt-in ([implementation] foldCfl): measured SLOWER than the separate
    # streaming CFL pass on v5e (see params.fold_cfl).
    fold_inv = params.fold_cfl and not zcarry and bz >= 2 and by >= 2
    if zcarry:
        # opt-in z-block-streaming kernel ([implementation] kernel=zcarry):
        # stage carries across z tiles + fully in-kernel CFL reduction,
        # pallas/zcarry_mhd3d.py. Hardware-validated round 4 (ladder
        # zc_invdt/zc_prefetch: parity exact) but measured ~15% SLOWER
        # than the packed kernel at 256^3 (carry machinery outweighs the
        # recompute it saves) — kept opt-in, see STATUS.md. Dissipative
        # runs keep the generic loop shape (separate CFL pass) because
        # the in-kernel inv-dt reduces the pre-dissipation state.
        from .zcarry_mhd3d import make_zcarry_mhd_packed_io, zcarry_supported

        if not zcarry_supported(params):
            raise ValueError("configuration outside the zcarry kernel")
        fused = make_zcarry_mhd_packed_io(params, tiles=(bz, by),
                                          with_inv_dt=not dissip)
        zcarry_inv_loop = not dissip
    else:
        fused = make_fused_mhd_packed_io(
            params, tiles=(bz, by),
            with_inv_dt=fold_inv and not dissip,
        )
        zcarry_inv_loop = False
    cfl_kernel = make_packed_cfl_mhd(params)  # None when > VMEM (512^3+)
    fused_dissip = None
    if params.nu > 0 or params.eta > 0:
        # dissipative sub-step as a SECOND packed-io launch: the first
        # launch's in-kernel wrap-ghost bands ARE the inter-phase refill
        from .packed_io import make_packed_io_step
        from ..ops.backend import BOX
        from ..solvers.dissipation import mhd_dissipation_interior_update

        def _dissip_update(tile_params, W, dt, margin):
            if params.compensated:
                return mhd_dissipation_interior_update(
                    tile_params, W[:nv], dt, margin=margin, xp=BOX,
                    comp=W[nv:],
                )
            return mhd_dissipation_interior_update(
                tile_params, W, dt, margin=margin, xp=BOX
            )

        fused_dissip = make_packed_io_step(
            params, (bz, by), _dissip_update,
            nvar=2 * nv if params.compensated else None,
            with_inv_dt_mhd=fold_inv,
        )
    t_end = params.t_end

    def pack(interior):
        if params.compensated:
            # zero initial Kahan carries alongside the state channels
            interior = jnp.concatenate(
                [interior, jnp.zeros_like(interior)], axis=0
            )
        return jnp.pad(
            interior, ((0, 0), (g, g), (YB, YB), (0, 0)), mode="wrap"
        )

    def dt_of(P):
        # streaming Pallas CFL reduction (packed_io.make_packed_cfl_mhd):
        # bit-identical to compute_inv_dt_mhd_packed, ~HBM-bound instead of
        # the XLA pass's ~4x-padded read; XLA fallback when the window
        # doesn't fit VMEM (512^3-class grids)
        if cfl_kernel is None:
            return params.cfl / compute_inv_dt_mhd_packed(params, P, y0=YB)
        return params.cfl / cfl_kernel(P)

    def advance_packed(P0, t, n_steps):
        if zcarry_inv_loop:
            # carry the inverse dt: the kernel reduces the ENTIRE updated
            # state in-kernel (bit-identical to the separate pass)
            inv0 = compute_inv_dt_mhd_packed(params, P0, y0=YB)

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

        if fold_inv:
            # in-kernel in-tile CFL on the step's LAST launch + the
            # strided seam pass — bit-identical to the full reduction
            # (max is idempotent), and the 2.4 ms full-state CFL kernel
            # read drops to ~1/6 of the state
            from ..solvers.timestep import compute_inv_dt_mhd_packed_seams

            inv0 = compute_inv_dt_mhd_packed(params, P0, y0=YB)

            def cond_f(carry):
                _, _, t_c, k = carry
                in_time = (t_c < t_end) if t_end > 0 else True
                return jnp.logical_and(k < n_steps, in_time)

            def body_f(carry):
                P, inv, t_c, k = carry
                dt = params.cfl / inv
                if fused_dissip is not None:
                    P1 = fused(P, dt)
                    P1, inv_a = fused_dissip(P1, dt)
                else:
                    P1, inv_a = fused(P, dt)
                inv1 = jnp.maximum(
                    inv_a,
                    compute_inv_dt_mhd_packed_seams(
                        params, P1, (bz, by), y0=YB
                    ),
                )
                return (P1, inv1, t_c + dt, k + 1)

            P_f, _, t_f, k_f = jax.lax.while_loop(
                cond_f, body_f, (P0, inv0, t, jnp.array(0, jnp.int32))
            )
            return P_f, t_f, k_f

        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            P, t_c, k = carry
            dt = dt_of(P)
            P1 = fused(P, dt)
            if fused_dissip is not None:
                P1 = fused_dissip(P1, dt)
            return (P1, t_c + dt, k + 1)

        P_f, t_f, k_f = jax.lax.while_loop(
            cond, body, (P0, t, jnp.array(0, jnp.int32))
        )
        return P_f, t_f, k_f

    def unpack(P_f):
        interior_f = P_f[:nv, g:-g, YB : YB + ny, :]
        return jnp.pad(interior_f, ((0, 0),) + ((g, g),) * 3, mode="wrap")

    if packed_form:
        pack_j = jax.jit(
            lambda U: pack(U[:, g:-g, g:-g, g:-g]), donate_argnums=0
        )
        adv_j = jax.jit(advance_packed, donate_argnums=0)
        return pack_j, adv_j, jax.jit(unpack)

    @jax.jit
    def advance_n(U, t, n_steps):
        P_f, t_f, k_f = advance_packed(
            pack(U[:, g:-g, g:-g, g:-g]), t, n_steps
        )
        return unpack(P_f), t_f, k_f

    return advance_n


def make_pallas_step_fn(params: RunParams) -> Callable:
    """Full step using the fused kernel: dt reduction + ghost fill stay in
    XLA; the Godunov/CT pipeline runs in Pallas. Same (U, t) -> (U', dt)
    contract as solvers/step.make_step_fn, on the ghosted state.

    All-periodic fast path: the returned state is the kernel's new interior
    wrap-padded — the wrap IS the periodic ghost fill, so the separate
    boundary-fill and interior-merge passes (two full-array copies per step)
    disappear. Invariant: the input state's ghosts must be filled (Run and
    make_advance_n callers fill them at init), and the returned state's
    ghosts are FRESH — unlike the merge path, whose ghosts are one fill
    stale (matching the reference's compute_dt-before-make_boundaries
    ordering; the dt difference is a one-layer face-B average, well inside
    the CFL safety factor)."""
    from ..core.constants import BoundaryConditionType as BCT
    from ..solvers.boundary import make_boundaries
    from ..solvers.timestep import compute_dt

    fused = make_fused_mhd_update(params, tiles=params.pallas_tiles)
    g = params.ghost_width
    interior = (slice(None),) + (slice(g, -g),) * 3
    all_periodic = all(
        b == BCT.BC_PERIODIC for b in params.boundary_types
    )
    dissip = params.nu > 0 or params.eta > 0
    fused_dissip = None
    if dissip:
        from .fused_dissip3d import make_fused_mhd_dissipation

        fused_dissip = make_fused_mhd_dissipation(
            params, tiles=params.pallas_tiles
        )

    if all_periodic:

        def step(U, t):
            dt = compute_dt(params, U)
            new_int = fused(U, dt)
            U_new = jnp.pad(new_int, ((0, 0),) + ((g, g),) * 3, mode="wrap")
            if fused_dissip is not None:
                # the wrap pad IS the inter-phase boundary refill
                new2 = fused_dissip(U_new, dt)
                U_new = jnp.pad(
                    new2, ((0, 0),) + ((g, g),) * 3, mode="wrap"
                )
            return U_new, dt

    else:

        def step(U, t):
            dt = compute_dt(params, U)
            U_b = make_boundaries(params, U)
            new_int = fused(U_b, dt)
            U_new = U_b.at[interior].set(new_int)
            if fused_dissip is not None:
                U_b2 = make_boundaries(params, U_new)
                U_new = U_b2.at[interior].set(fused_dissip(U_b2, dt))
            return U_new, dt

    return step


# --------------------------------------------------------------------------- #
# shearing-box / rotating-frame (MRI) fused kernel
# --------------------------------------------------------------------------- #
def pallas_shear_supported(params: RunParams, stratified: bool = False) -> bool:
    """Fused-kernel coverage for the shearing-box step (the reference's
    flagship MRI workload, README.md:5-7): rotating-frame trace/EMF terms run
    inside the kernel; the conservative flux/emfY remap at the domain x-faces
    stays outside (it needs global y interpolation). ``stratified=True``
    additionally allows the BC_Z_STRATIFIED vertical boundary + in-kernel
    analytic gravity (gravity_z of make_fused_mhd_shear)."""
    from ..core.constants import BoundaryConditionType as BCT

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
        and params.ny % 8 == 0
        and params.dtype == "float32"
    )


def make_fused_mhd_shear(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    gravity_z: Callable | None = None,
) -> Callable:
    """Build ``update(U_ghosted, dt) -> (U_int_new, fpl, eypl, ezpl)`` for
    the rotating-frame step: the full primitives -> rotating trace -> HLLD ->
    EMF -> CT pipeline per VMEM window (x stays ghosted + lane-padded — the
    shear BC is not an in-row wrap), plus the interior-extent x-face planes
    the conservative shear remap needs (mhd_3d_interior_update docstring).

    ``gravity_z``: analytic vertical gravity profile gz(z) (stratified MRI,
    reference MHDRunBase.cpp:3163-3245 init_mhd_mri_grav_field) evaluated
    in-kernel on each window's z coordinates and applied as the trace
    half-kick + conservative source (godunov_mhd gravity hooks)."""
    if not pallas_shear_supported(params, stratified=gravity_z is not None):
        raise ValueError("configuration outside the fused shear kernel")
    from ..solvers.godunov_mhd import mhd_3d_interior_update

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by:
        raise ValueError(f"tiles {(bz, by)} must divide {(nz, ny)}")
    m = g
    wz = bz + 2 * m
    wy = -(-(by + 2 * m) // 8) * 8          # sublane-aligned window height
    wx = -(-(nx + 2 * m) // 128) * 128       # lane-aligned ghosted rows
    grid = (nz // bz, ny // by)
    pad_y = wy - (by + 2 * m)

    tile_params = params.replace(
        ny=by,
        nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    nzb, nyb = grid
    nvw = params.nb_var                     # window state channels
    n_in = nvw + (1 if gravity_z is not None else 0)

    def kernel(dt_ref, x0_ref, z0_ref, u_hbm, out_ref, win, sem):
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

        # double-buffered input: prefetch the next window during compute
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
        U = BoxField(win[slot][:nvw], 0, 0)
        # per-shard global cell-center x coordinates: x0 = the ghosted
        # block's xmin (sharded runs pass each shard's offset)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wx), 2).astype(dtype)
        xpos = x0_ref[0, 0] + params.dx / 2 + (ix - g) * params.dx
        gravity = None
        if gravity_z is not None:
            # the gravity field rides along as one extra DMA'd channel of
            # the ghosted input (computed by `update` below, outside the
            # kernel) — in-kernel 3D-iota construction SIGABRTed the remote
            # Mosaic compiler in round 4 ("Check failed: limits[i] <=
            # dim(i)", stratified probe)
            gravity = (None, None, BoxField(win[slot][nvw], 0, 0))
        U_new, fpl, eypl, ezpl = mhd_3d_interior_update(
            tile_params, U, dt_ref[0, 0], margin=(m, m, m), xp=BOX,
            shear_planes=True, xpos=xpos, gravity=gravity,
        )
        # the five remap planes ride along as extra output channels, each
        # lane-broadcast across x (TPU BlockSpec tiling can't express small
        # [bz, by] plane blocks, and Mosaic can't concat lane slices with
        # mismatched offsets — a broadcast-from-slice per plane lowers fine;
        # the extra write is ~5/8 of one variable, trivial)
        row = (bz, by, nx)
        pl_chans = [
            jnp.broadcast_to(p[..., None], row)[None]
            for p in (fpl[0], fpl[1], eypl[0], eypl[1], ezpl)
        ]
        out_ref[...] = jnp.concatenate([U_new] + pl_chans, axis=0)

    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    nv1 = params.nb_var + 5
    out_shape = jax.ShapeDtypeStruct((nv1, nz, ny, nx), dtype)

    fused = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 (shard x offset)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # z0 (shard z offset)
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nv1, bz, by, nx), lambda zi, yi: (0, zi, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, n_in, wz, wy, wx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    nb = params.nb_var

    def update(U_ghosted, dt, x0=None, z0=None):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(U_ghosted.dtype)
        if x0 is None:
            x0 = params.xmin
        if z0 is None:
            z0 = params.zmin
        x0_arr = jnp.reshape(
            jnp.asarray(x0, U_ghosted.dtype), (1, 1)
        )
        z0_arr = jnp.reshape(
            jnp.asarray(z0, U_ghosted.dtype), (1, 1)
        )
        pad = wx - U_ghosted.shape[-1]
        U_padded = jnp.pad(
            U_ghosted, ((0, 0), (0, 0), (0, pad_y), (0, pad))
        )
        if gravity_z is not None:
            # ghosted z row r <-> cell center z0 + dz/2 + (r - g)*dz; z0
            # may be a traced per-shard offset — plain jnp here, the field
            # materializes before the custom call
            zc1 = jnp.asarray(z0, U_ghosted.dtype) + params.dz / 2 + (
                jnp.arange(U_ghosted.shape[1], dtype=U_ghosted.dtype) - g
            ) * params.dz
            gz3 = jnp.broadcast_to(
                gravity_z(zc1)[None, :, None, None],
                (1,) + U_padded.shape[1:],
            ).astype(U_padded.dtype)
            U_padded = jnp.concatenate([U_padded, gz3], axis=0)
        U_padded, dt_arr, x0_arr, z0_arr = jax.lax.optimization_barrier(
            (U_padded, dt_arr, x0_arr, z0_arr)
        )
        out = jax.lax.optimization_barrier(
            fused(dt_arr, x0_arr, z0_arr, U_padded)
        )
        new_int = out[:nb]
        fpl = out[nb : nb + 2, :, :, 0]
        eypl = out[nb + 2 : nb + 4, :, :, 0]
        ezpl = out[nb + 4, :, :, 0]
        return new_int, fpl, eypl, ezpl

    return update


def make_pallas_shear_step_fn(
    params: RunParams, interpret: bool = False,
    gravity_z: Callable | None = None,
) -> Callable:
    """Shearing-box ``step(U, t) -> (U', dt)`` on the ghosted state: dt and
    the sheared boundary fill stay in XLA, the rotating-frame Godunov/CT
    pipeline runs in the fused kernel, then the conservative flux/emfY remap
    at the two domain x-faces is applied as a linear post-correction to the
    border columns (the update is linear in the face flux and EMF, so
    correcting after equals remapping before — the whole-array path's
    ordering, _godunov_unsplit_mhd_3d). The CT update of the KEPT Bx face at
    x = nx+g (which the sheared fill preserves, solvers/shear.py:87-91) is
    recomputed from the kernel's emf planes with the remapped emfY."""
    from ..core.constants import IA, IC, ID
    from ..solvers.godunov_mhd import _shear_remap_pair
    from ..solvers.shear import make_all_boundaries_shear
    from ..solvers.timestep import compute_inv_dt_mhd_ghosted

    fused = make_fused_mhd_shear(
        params, tiles=params.pallas_tiles, interpret=interpret,
        gravity_z=gravity_z,
    )
    g = params.ghost_width
    nx = params.nx
    core = (slice(None), slice(g, -g), slice(g, -g))
    dissip = params.nu > 0 or params.eta > 0
    nb = params.nb_var
    fused_dissip = None
    if dissip:
        from .fused_dissip3d import make_fused_mhd_dissipation

        # eta > 0: the resistive CT also touches the KEPT Bx face — the
        # kernel hands back the resistive emfY/emfZ planes at the xmax face
        fused_dissip = make_fused_mhd_dissipation(
            params, tiles=params.pallas_tiles, interpret=interpret,
            shear_planes=params.eta > 0,
        )

    def step(U, t):
        # slice-based inv-dt (no rolls); MRI configs have no jet dt term
        dt = params.cfl / compute_inv_dt_mhd_ghosted(params, U)
        U_b = make_all_boundaries_shear(params, U, t + dt)
        new_int, fpl, eypl, ezpl = fused(U_b, dt)
        dtdx, dtdy, dtdz = dt / params.dx, dt / params.dy, dt / params.dz

        # conservative density-flux remap at the domain x-faces
        # (shearingBox_utils.cuh:484-485 incl. the density floor)
        fmin_r, fmax_r = _shear_remap_pair(params, fpl[0], fpl[1], t, dt)
        # emfY remap: corrections to the CT curl at the border columns
        emin_r, emax_r = _shear_remap_pair(params, eypl[0], eypl[1], t, dt)
        d_emin = emin_r - eypl[0]
        d_emax = emax_r - eypl[1]

        # corrected border columns, assembled component-wise [8, nz, ny]
        # (the update is linear in the face flux/EMF, so correcting after
        # equals remapping before — the whole-array ordering)
        col_lo = new_int[:, :, :, 0]
        col_hi = new_int[:, :, :, nx - 1]
        col_lo = col_lo.at[ID].set(jnp.maximum(
            col_lo[ID] + dtdx * (fmin_r - fpl[0]), params.smallr))
        col_hi = col_hi.at[ID].set(jnp.maximum(
            col_hi[ID] - dtdx * (fmax_r - fpl[1]), params.smallr))
        # dbx = -dtdz*(d_emf_y(z+1) - d_emf_y) at the xmin face (periodic z)
        col_lo = col_lo.at[IA].add(
            -dtdz * (jnp.roll(d_emin, -1, axis=0) - d_emin))
        # dbz = +dtdx*(d_emf_y(x+1) - d_emf_y): the two border cells
        col_lo = col_lo.at[IC].add(-dtdx * d_emin)
        col_hi = col_hi.at[IC].add(dtdx * d_emax)

        # right x-ghost slab with the KEPT Bx face CT-updated from the
        # kernel's planes using the REMAPPED emfY (the sheared fill
        # preserves this face, solvers/shear.py kept-Bx)
        dbx_keep = dtdy * (jnp.roll(ezpl, -1, axis=1) - ezpl) - dtdz * (
            jnp.roll(emax_r, -1, axis=0) - emax_r
        )
        gR = U_b[core + (slice(nx + g, None),)]
        gR = gR.at[IA, :, :, 0].add(dbx_keep)

        # ONE nested-concat assembly instead of chained full-array
        # .at[].set passes (each of which materializes a copy on TPU)
        mid_x = jnp.concatenate(
            [
                U_b[core + (slice(0, g),)],
                col_lo[..., None],
                new_int[:, :, :, 1 : nx - 1],
                col_hi[..., None],
                gR,
            ],
            axis=-1,
        )
        mid_y = jnp.concatenate(
            [U_b[:, g:-g, :g, :], mid_x, U_b[:, g:-g, params.ny + g :, :]],
            axis=-2,
        )
        U_new = jnp.concatenate(
            [U_b[:, :g], mid_y, U_b[:, params.nz + g :]], axis=-3
        )

        if dissip:
            U_b2 = make_all_boundaries_shear(params, U_new, t + dt)
            interior = (slice(None),) + (slice(g, -g),) * 3
            if params.eta > 0:
                new2, eypl2, ezpl2 = fused_dissip(U_b2, dt)
                U_new = U_b2.at[interior].set(new2)
                # resistive CT on the kept Bx face (apply_resistivity_ct's
                # curl range reaches the first xmax ghost face)
                dbx2 = dtdy * (jnp.roll(ezpl2, -1, axis=1) - ezpl2) - dtdz * (
                    jnp.roll(eypl2, -1, axis=0) - eypl2
                )
                U_new = U_new.at[IA, g:-g, g:-g, nx + g].add(dbx2)
            else:
                U_new = U_b2.at[interior].set(fused_dissip(U_b2, dt))
        return U_new, dt

    return step
