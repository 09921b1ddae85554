"""z-plane-streaming Pallas kernel for the fully-periodic 3D MHD+CT step.

TPU analogue of the reference's 4-plane shared-memory ring
(reference: godunov_unsplit_mhd.cuh:753-800 — the CUDA kernels march in z
keeping a ring of trace planes in shared memory so nothing is recomputed).
The packed-IO kernel (pallas/packed_io.py) tiles (z, y) with halo'd windows;
its stencil margins cost a measured **2.08x FLOP recompute** at the (8, 32)
tile (scripts/margin_flops.py). This kernel instead runs ONE grid iteration
per z plane over full-width y rows and carries every cross-plane
intermediate in persistent VMEM ring buffers, so each plane's primitives /
precursors / trace states / fluxes / EMFs are computed exactly once.

Ring layout: every buffer whose consumers read a WINDOW of consecutive
planes (U, Q, flux_z, emfY, emfX) is stored z-major — (nv, depth+m, wy, nx)
with the slot axis adjacent to y/x — and MIRROR-PADDED: writes to the first
``m`` slots are duplicated at slot+depth, so any m+1-plane window starting
at slot = plane % depth is one contiguous dynamic slice. Consumers read
``ref[:, pl.ds(start, n)]`` directly; there is no jnp.concatenate anywhere
in the body (the concat-based first version materialized ~36 MB of slab
copies per plane — the dominant cost at 256^3).

Pipeline schedule at grid step i (one z plane per step, g = ghost_width):

    DMA in   : packed plane i+1 prefetched; plane i waited
    Q        : plane i-1   = constoprim on the U(i-1..i) slab
    shared   : plane i-2   = trace_mhd3d_shared_precursors (ExC/EyC/s_bz_*)
    trace    : plane i-3   = in-plane state assembly (+ local z-slopes)
    fluxes   : plane i-3   = 1D Riemann faces + 2D corner EMFs, using the
                             ring-carried z-1 trace planes
    update   : plane i-4   = conservative + CT update from the flux rings
    DMA out  : plane i-4   interior + wrap ghost bands (y in-plane, z via
                             duplicate plane writes)
    inv-dt   : plane i-5   = fast-magnetosonic CFL reduction on the UPDATED
                             planes (staged p-1, p), folded into a running
                             SMEM max — the separate whole-state dt pass of
                             the packed advance loop disappears

Same packed loop-state contract as make_packed_io_step: state
[nvar, nz+2g, ny+2*YB, nx], x ghost-free (in-row roll wrap = periodic BC),
z wrap-ghosted by g, y wrap-ghosted by YB. Returns (P_new, inv_dt_new)
where inv_dt_new is the CFL reduction over P_new's interior, bit-matching
solvers.timestep.compute_inv_dt_mhd_packed on the output state.
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


def zstream_vmem_bytes(params: RunParams, pb: int = 1) -> int:
    """Rough persistent-scratch budget of the streaming kernel (ring
    buffers + staging), used to gate applicability."""
    nv = params.nb_var
    wy = params.ny + 2 * YB
    nx = params.nx
    itemsize = 8 if params.dtype == "float64" else 4
    ch = (
        (pb + 7) * nv   # U ring (depth pb+5, mirror 2)
        + 6 * nv        # Q ring (depth 4, mirror 2)
        + 4 * 2         # shared precursor rings
        + 5 * 2 * nv    # trace-state carries
        + 2 * 2 * nv    # flux_x / flux_y rings
        + 3 * nv        # flux_z ring (depth 2, mirror 1)
        + 2 + 2 * 3     # emfZ ring + emfY/emfX rings (depth 2, mirror 1)
        + 2 * nv        # output staging
    )
    return ch * wy * nx * itemsize


def pallas_zstream_supported(params: RunParams) -> bool:
    """Streaming applies wherever the packed-IO loop applies (fully
    periodic, lane-exact x, float32) and the full-row rings fit VMEM."""
    from .fused_mhd3d import pallas_packed_supported

    return (
        pallas_packed_supported(params)
        and params.nz >= 2 * params.ghost_width
        # empirical Mosaic envelope on v5e: ring budget 60 MB compiles
        # (ny=192, nx=256), 78 MB crashes the remote compiler (ny=256)
        and zstream_vmem_bytes(params) <= 64 * 1024 * 1024
    )


def make_zstream_mhd_packed_io(
    params: RunParams, pb: int = 1, interpret: bool = False
) -> Callable:
    """Build ``step_packed(P, dt) -> (P_new, inv_dt_new)`` (packed layout)
    running the whole MHD+CT step + the next-step CFL reduction as a
    z-plane-streaming kernel.

    ``pb`` = planes per grid iteration (the per-plane schedule unrolled
    inside each grid step). pb>=2 crashes the TPU worker at any grid size
    in this environment (the per-plane body is already near the program
    size the runtime tolerates), so the default stays 1; the machinery is
    kept for hardware where larger programs fit."""
    from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
    from ..ops.backend import BOX, BoxField
    from ..ops.eos import constoprim_mhd
    from ..ops.trace_mhd3d import (
        trace_mhd3d_local_precursors,
        trace_mhd3d_shared_precursors,
        trace_mhd3d_state_parts,
    )
    from ..solvers.godunov_mhd import (
        mhd_apply_update,
        mhd_fluxes_emfs_from_parts,
    )
    from ..solvers.timestep import _inv_dt_mhd_fields

    if params.omega0 > 0:
        raise ValueError("z-streaming kernel does not cover the rotating frame")
    g = params.ghost_width
    nv = params.nb_var
    nz, ny, nx = params.nz, params.ny, params.nx
    wy = ny + 2 * YB
    nzp = nz + 2 * g          # packed z extent
    last_load = nzp - 1
    last_plane = nzp + 1      # final pipeline-drain plane index (update+dt)
    n_iter = -(-(last_plane + 1) // pb)
    UD = pb + 5               # U ring depth: update lags 4, prefetch leads pb
    QD = 4
    NSEM = pb + 1             # in-flight input DMAs
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32

    # a params view whose nz=1 keeps dz identical (per-plane update extents)
    plane_params = params.replace(nz=1, zmax=params.zmin + params.dz)

    # ring row metadata (name -> (oy, rows)), discovered while tracing the
    # kernel body: every put records the BoxField's static y box; gets
    # re-wrap the stored rows with it. Population order is guaranteed by the
    # body's program order (each ring is put before the first get that needs
    # its metadata — same-iteration for trace/flux rings, and the
    # cross-iteration reads reuse identical static boxes).
    meta: dict[str, tuple[int, int]] = {}

    def _record(name, field):
        oy, rows = field.oy, field.value.shape[-2]
        prev = meta.setdefault(name, (oy, rows))
        if prev != (oy, rows):
            raise AssertionError(
                f"ring {name}: inconsistent box {prev} vs {(oy, rows)}"
            )
        return rows

    def put(ref, name, slot, field):
        # slot-major ring (slot, ..., wy, nx); single-plane consumers
        rows = _record(name, field)
        ref[slot, ..., 0:rows, :] = field.value

    def get(ref, name, slot, oz):
        oy, rows = meta[name]
        return BoxField(ref[slot, ..., 0:rows, :], oz, oy)

    def putz(ref, name, plane, field, depth, mirror):
        # z-major mirror-padded ring (..., depth+mirror, wy, nx):
        # windowed consumers read contiguous dynamic slices
        rows = _record(name, field)
        s = jax.lax.rem(plane, jnp.int32(depth))
        ref[..., pl.ds(s, 1), 0:rows, :] = field.value

        @pl.when(s < mirror)
        def _():
            ref[..., pl.ds(s + depth, 1), 0:rows, :] = field.value

    def getz(ref, name, plane, n, depth, oz):
        oy, rows = meta[name]
        s = jax.lax.rem(plane, jnp.int32(depth))
        return BoxField(ref[..., pl.ds(s, n), 0:rows, :], oz, oy)

    def zslice(field, z):
        """Restrict a BoxField to the single plane at local z coordinate
        ``z`` (purely in-plane intermediates keep their slab's full z
        extent — the box only shrinks through z-shifted meets)."""
        k = z - field.oz
        return BoxField(field.value[..., k : k + 1, :, :], z, field.oy)

    def kernel(
        dt_ref, p_hbm, out_ref, invdt_ref,
        u_ring, q_ring,
        exc_ring, eyc_ring, sbzx_ring, sbzy_ring,
        qmz_ring, qrty_ring, qlty_ring, qrtx_ring, qltx_ring,
        fx_ring, fy_ring, fz_ring,
        emfz_ring, emfy_ring, emfx_ring,
        stage, first_upd, acc,
        sem_in, sem_mir, sem_out,
    ):
        grid_i = pl.program_id(0)
        dt = dt_ref[0, 0]

        def in_dma(plane, sem_slot):
            s = jax.lax.rem(plane, jnp.int32(UD))
            return pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(plane, 1), :, :],
                u_ring.at[:, pl.ds(s, 1), :, :],
                sem_in.at[sem_slot],
            )

        def mir_dma(plane, sem_slot):
            s = jax.lax.rem(plane, jnp.int32(UD))
            return pltpu.make_async_copy(
                p_hbm.at[:, pl.ds(plane, 1), :, :],
                u_ring.at[:, pl.ds(s + UD, 1), :, :],
                sem_mir.at[sem_slot],
            )

        def start_in(plane, sem_slot):
            in_dma(plane, sem_slot).start()

            @pl.when(jax.lax.rem(plane, jnp.int32(UD)) < 2)
            def _():
                mir_dma(plane, sem_slot).start()

        def wait_in(plane, sem_slot):
            in_dma(plane, sem_slot).wait()

            @pl.when(jax.lax.rem(plane, jnp.int32(UD)) < 2)
            def _():
                mir_dma(plane, sem_slot).wait()

        def u_slab(lo, n, oz):
            # planes lo..lo+n-1 from the U ring as one contiguous slice
            s = jax.lax.rem(lo, jnp.int32(UD))
            return BoxField(u_ring[:, pl.ds(s, n), :, :], oz, 0)

        def q_slab(lo, n, oz):
            oy, rows = meta["q"]
            s = jax.lax.rem(lo, jnp.int32(QD))
            return BoxField(q_ring[:, pl.ds(s, n), 0:rows, :], oz, oy)

        def plane_body(i):
            # input DMAs: first batch at plane 0, then prefetch pb ahead
            @pl.when(i == 0)
            def _():
                for q in range(pb):
                    start_in(q, q % NSEM)

            @pl.when(i + pb <= last_load)
            def _():
                start_in(i + pb, jax.lax.rem(i + pb, jnp.int32(NSEM)))

            @pl.when(i <= last_load)
            def _():
                wait_in(i, jax.lax.rem(i, jnp.int32(NSEM)))

            # ---- Q at plane i-1 (constoprim needs U at z and z+1) ----
            @pl.when(jnp.logical_and(i >= 1, i <= last_load))
            def _():
                U2 = u_slab(i - 1, 2, 0)
                Q, _c = constoprim_mhd(params, U2, dt, xp=BOX)
                putz(q_ring, "q", i - 1, Q, QD, 2)

            # ---- shared precursors at plane i-2 (reach: z-1..z) ----
            @pl.when(jnp.logical_and(i >= 3, i <= last_load + 1))
            def _():
                Q2 = q_slab(i - 3, 2, 0)
                bf = u_slab(i - 3, 2, 0)
                ExC, EyC, s_bz_x, s_bz_y = trace_mhd3d_shared_precursors(
                    params, Q2, bf[IA], bf[IB], bf[IC], None, xp=BOX
                )
                s2 = jax.lax.rem(i - 2, jnp.int32(2))
                put(exc_ring, "exc", s2, ExC)
                put(eyc_ring, "eyc", s2, EyC)
                put(sbzx_ring, "sbzx", s2, zslice(s_bz_x, 1))
                put(sbzy_ring, "sbzy", s2, zslice(s_bz_y, 1))

            # ---- trace states at zt = i-3; fluxes/EMFs at the same plane
            #      from the ring-carried zt-1 states; update at p = i-4 ----
            @pl.when(jnp.logical_and(i >= g + 2, i <= last_load + 1))
            def _():
                zt = i - 3
                Q3 = q_slab(i - 4, 3, 0)       # planes zt-1..zt+1, local z 0..2
                bf3 = u_slab(i - 4, 3, 0)
                local = trace_mhd3d_local_precursors(
                    params, Q3, bf3[IA], bf3[IB], xp=BOX
                )
                sz = jax.lax.rem(zt, jnp.int32(2))
                shared = (
                    get(exc_ring, "exc", sz, 1),
                    get(eyc_ring, "eyc", sz, 1),
                    get(sbzx_ring, "sbzx", sz, 1),
                    get(sbzy_ring, "sbzy", sz, 1),
                )
                sz1 = jax.lax.rem(zt + 1, jnp.int32(2))
                # z+1 planes enter *declared at the consuming plane's box*
                # (the whole-array path shifts them down with shift_p(_Z))
                shared_p = (
                    get(exc_ring, "exc", sz1, 1),
                    get(eyc_ring, "eyc", sz1, 1),
                    get(sbzx_ring, "sbzx", sz1, 1),
                    get(sbzy_ring, "sbzy", sz1, 1),
                )
                bfz_p = BoxField(
                    u_ring[IC, pl.ds(jax.lax.rem(zt + 1, jnp.int32(UD)), 1), :, :], 1, 0
                )
                # the state assembly is purely in-plane: hand it 1-plane
                # slices (3-plane slabs would triple-compute in-plane ops)
                Q1 = q_slab(i - 3, 1, 1)
                bf1 = u_slab(zt, 1, 1)
                P = trace_mhd3d_state_parts(
                    params, Q1, bf1[IA], bf1[IB], bf1[IC], bfz_p,
                    shared, shared_p, local, dt, None, xp=BOX,
                )
                put(qmz_ring, "qmz", sz, P["qm_z"]())
                put(qrty_ring, "qrty", sz, P["qRT_y"]())
                put(qlty_ring, "qlty", sz, P["qLT_y"]())
                put(qrtx_ring, "qrtx", sz, P["qRT_x"]())
                put(qltx_ring, "qltx", sz, P["qLT_x"]())

                @pl.when(i >= g + 3)
                def _():
                    szm = jax.lax.rem(zt - 1, jnp.int32(2))
                    P2 = dict(P)
                    P2["qm_z"] = lambda: get(qmz_ring, "qmz", szm, 0)
                    P2["qRT_y"] = lambda: get(qrty_ring, "qrty", szm, 0)
                    P2["qLT_y"] = lambda: get(qlty_ring, "qlty", szm, 0)
                    P2["qRT_x"] = lambda: get(qrtx_ring, "qrtx", szm, 0)
                    P2["qLT_x"] = lambda: get(qltx_ring, "qltx", szm, 0)
                    (fx, fy, fz), (ez, ey, ex) = mhd_fluxes_emfs_from_parts(
                        params, P2, None, xp=BOX
                    )
                    put(fx_ring, "fx", sz, fx)
                    put(fy_ring, "fy", sz, fy)
                    putz(fz_ring, "fz", zt, fz, 2, 1)
                    put(emfz_ring, "emfz", sz, ez)
                    putz(emfy_ring, "emfy", zt, ey, 2, 1)
                    putz(emfx_ring, "emfx", zt, ex, 2, 1)

                    @pl.when(i >= g + 4)
                    def _():
                        p = i - 4
                        sp = jax.lax.rem(p, jnp.int32(2))
                        fluxes = (
                            get(fx_ring, "fx", sp, 0),
                            get(fy_ring, "fy", sp, 0),
                            getz(fz_ring, "fz", p, 2, 2, 0),
                        )
                        emfs = (
                            get(emfz_ring, "emfz", sp, 0),
                            getz(emfy_ring, "emfy", p, 2, 2, 0),
                            getz(emfx_ring, "emfx", p, 2, 2, 0),
                        )
                        Up = u_slab(p, 1, 0)
                        upd = mhd_apply_update(
                            plane_params, Up, fluxes, emfs, dt,
                            margin=(0, YB, 0), xp=BOX,
                        )
                        so = jax.lax.rem(p, jnp.int32(2))

                        def out_dmas(pp, slot):
                            dups = [
                                (True, pp),
                                (pp >= nz, jnp.maximum(pp - nz, 0)),
                                (pp < 2 * g, jnp.minimum(pp + nz, nzp - 1)),
                            ]
                            return [
                                (cond,
                                 pltpu.make_async_copy(
                                     stage.at[slot],
                                     out_ref.at[:, pl.ds(dst, 1), :, :],
                                     sem_out.at[slot],
                                 ))
                                for cond, dst in dups
                            ]

                        def run(lst, op):
                            for cond, copy in lst:
                                if cond is True:
                                    op(copy)
                                else:
                                    pl.when(cond)(lambda c=copy: op(c))

                        # drain the DMAs issued two updates ago on this slot
                        @pl.when(p >= g + 2)
                        def _():
                            run(out_dmas(p - 2, so), lambda c: c.wait())

                        # staged output plane: interior rows + y wrap bands
                        stage[so, :, :, YB : YB + ny, :] = upd
                        stage[so, :, :, 0:YB, :] = upd[:, :, ny - YB : ny, :]
                        stage[so, :, :, YB + ny : wy, :] = upd[:, :, 0:YB, :]
                        run(out_dmas(p, so), lambda c: c.start())

                        @pl.when(p == g)
                        def _():
                            # first interior updated plane: kept as the z+1
                            # wrap neighbour for the LAST plane's inv-dt
                            first_upd[...] = stage[so]

                        # final drains: the last two planes' writes
                        @pl.when(i == last_load + 1)
                        def _():
                            run(out_dmas(p, so), lambda c: c.wait())

                        @pl.when(
                            jnp.logical_and(i == last_load + 1, nz > 1)
                        )
                        def _():
                            run(
                                out_dmas(p - 1, jax.lax.rem(p - 1, jnp.int32(2))),
                                lambda c: c.wait(),
                            )

            # ---- inv-dt of UPDATED plane pd = i-5 from staged planes ----
            # (pd's z+1 face-B average needs updated plane pd+1 = i-4, just
            # staged above; the final interior plane wraps to first_upd)
            @pl.when(jnp.logical_and(i >= g + 5, i <= last_plane))
            def _():
                pd = i - 5

                @pl.when(i == g + 5)
                def _():
                    acc[0, 0] = jnp.zeros((), dtype)

                cur = stage[jax.lax.rem(pd, jnp.int32(2))]
                icslab = jnp.where(
                    pd == g + nz - 1,
                    first_upd[IC],
                    stage[jax.lax.rem(pd + 1, jnp.int32(2)), IC],
                )
                yi = slice(YB, YB + ny)
                rho = jnp.maximum(cur[ID, :, yi, :], params.smallr)
                ia = cur[IA, :, yi, :]
                inv = _inv_dt_mhd_fields(
                    params,
                    cur[ID, :, yi, :],
                    cur[IP, :, yi, :],
                    cur[IU, :, yi, :] / rho,
                    cur[IV, :, yi, :] / rho,
                    cur[IW, :, yi, :] / rho,
                    0.5 * (ia + jnp.roll(ia, -1, -1)),
                    0.5 * (cur[IB, :, yi, :]
                           + cur[IB, :, YB + 1 : YB + ny + 1, :]),
                    0.5 * (cur[IC, :, yi, :] + icslab[:, yi, :]),
                )
                acc[0, 0] = jnp.maximum(acc[0, 0], jnp.max(inv))

                @pl.when(i == last_plane)
                def _():
                    invdt_ref[0, 0] = acc[0, 0]

        for k in range(pb):
            plane_body(grid_i * pb + k)

    out_shape = (
        jax.ShapeDtypeStruct((nv, nzp, wy, nx), dtype),
        jax.ShapeDtypeStruct((1, 1), dtype),
    )

    def ring4(depth):
        return pltpu.VMEM((depth, nv, 1, wy, nx), dtype)

    def ring3(depth):
        return pltpu.VMEM((depth, 1, wy, nx), dtype)

    fused = pl.pallas_call(
        kernel,
        grid=(n_iter,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt (1,1)
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed state in HBM
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nv, UD + 2, wy, nx), dtype),  # U ring (z-major)
            pltpu.VMEM((nv, QD + 2, wy, nx), dtype),  # Q ring (z-major)
            ring3(2), ring3(2), ring3(2), ring3(2),   # shared precursors
            ring4(2), ring4(2), ring4(2),             # qmz/qrty/qlty
            ring4(2), ring4(2),                       # qrtx/qltx
            ring4(2), ring4(2),                       # flux_x / flux_y
            pltpu.VMEM((nv, 3, wy, nx), dtype),       # flux_z (z-major)
            ring3(2),                                 # emfZ
            pltpu.VMEM((3, wy, nx), dtype),           # emfY (z-major)
            pltpu.VMEM((3, wy, nx), dtype),           # emfX (z-major)
            ring4(2),                                 # output staging
            pltpu.VMEM((nv, 1, wy, nx), dtype),       # first updated plane
            pltpu.SMEM((1, 1), dtype),                # inv-dt accumulator
            pltpu.SemaphoreType.DMA((NSEM,)),
            pltpu.SemaphoreType.DMA((NSEM,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret or _interpret_flag(),
    )

    def step_packed(P, dt):
        dt_arr = jnp.reshape(dt, (1, 1)).astype(P.dtype)
        # keep XLA's fusion passes away from the custom call's operands
        # (address-change fusion around pallas custom-calls crashes the
        # 2026-08 libtpu fusion pass otherwise)
        P, dt_arr = jax.lax.optimization_barrier((P, dt_arr))
        P_new, inv_dt = jax.lax.optimization_barrier(fused(dt_arr, P))
        return P_new, inv_dt[0, 0]

    return step_packed
