"""z-BLOCK-streaming Pallas kernel for the fully-periodic 3D MHD+CT step.

The packed-IO kernel (packed_io.py) recomputes every stage on its z stencil
margins: at the (8, 32) tile the staged demand-driven extents still carry a
~1.37x z recompute factor (each stage runs on bz+3..bz+5 planes for bz=8
output planes). A per-PLANE streaming prototype (deleted in round 4)
computed every plane exactly once but paid a fixed cost per grid iteration
— at one plane per iteration that overhead dominated (20% slower than
tiled overall) and its full-row rings exceeded VMEM above ny=192.

This kernel streams z in BLOCKS of bz planes (the tile size), with y tiled
as in the packed kernel: grid = (ny/by, nz/bz + 1), z innermost. Persistent
VMEM buffers carry each stage's top planes from one z tile to the next, so
every stage computes only ~bz+1 fresh planes per tile (the +1 is the
forward shadow of the in-stage z shifts). The per-iteration work stays as
beefy as the packed kernel's (same tile volume), so the fixed-cost overhead
that sank the per-plane kernel amortizes 8x.

Reference analogue: the CUDA kernels' 4-plane shared-memory ring
(godunov_unsplit_mhd.cuh:753-800), generalized from 1-plane steps to
bz-plane blocks.

Carry chain per z tile, in LOCAL plane coordinates (tile interior =
[0, bz); buffer slot s holds local plane s - 1, except the shared buffers
whose slot s holds plane s):

    buffer    extent        carry slots          fresh        inputs
    U         [-1, bz+3)    [bz,bz+4) -> [0,4)   [3, bz+3)    DMA
    Q         [-1, bz+2)    [bz,bz+3) -> [0,3)   [2, bz+2)    U [2, bz+3)
    shared    [ 0, bz+2)    [bz,bz+2) -> [0,2)   [2, bz+2)    Q,U [1, bz+2)
    states5   [-1, bz+1)    [bz] -> [0]          [0, bz+1)    in-plane
    flux/EMF  [ 0, bz+1)    (none)               all          states
    update    [ 0, bz)      (none)               all          U, fluxes

The z tile index runs 0..nz/bz: tile 0 is a WARMUP that populates each
column's carries (planes -1..2). Its U window dips below the packed array
(global planes < -g): the DMA fetches only the valid [-g, 3) sub-range and
the deeper slots hold junk — every plane the real tiles' demand chain reads
is computed from U >= -g (the same invariant that sizes the ghost width),
so the junk never reaches an output. Warmup tiles write no output.

Output contract matches make_packed_io_step: tile (zi-1, yi) interior
blocks plus the wrap ghost bands, bitwise the whole-array step's values
(identical ops on identical inputs; parity-tested in tests/test_pallas.py).
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


def zcarry_supported(params: RunParams) -> bool:
    """zcarry can serve the packed advance loop's Godunov phase.
    Dissipative runs compose it with the packed dissipation launch and a
    separate streaming CFL pass (the in-kernel inv-dt reduces the
    pre-dissipation state, so the inv-carry loop shape only applies when
    nu == eta == 0 — make_pallas_advance_n picks the right shape)."""
    from .fused_mhd3d import _pick_tiles, pallas_packed_supported

    bz, by = params.pallas_tiles or _pick_tiles(params)
    return (
        pallas_packed_supported(params)
        and bz >= params.ghost_width
        and params.nz % bz == 0
        and params.ny % by == 0
        # non-dissipative advance folds the CFL in-kernel (with_inv_dt),
        # which needs sublane-aligned stash tiles
        and (params.nu > 0 or params.eta > 0 or bz % 8 == 0)
    )


def zcarry_shear_supported(params: RunParams) -> bool:
    """Can the z-block-streaming kernel serve as the MAIN kernel of the
    packed shearing-box step (shear_packed.make_shear_packed_step)?  The
    outer step already gates on shear_packed_supported; this only checks
    the zcarry-specific tile divisibility (dissipation is fine here — the
    viscous/resistive sub-step is a separate packed-io launch)."""
    from .fused_mhd3d import _pick_tiles

    bz, by = params.pallas_tiles or _pick_tiles(params)
    return (
        bz >= params.ghost_width
        and params.nz % bz == 0
        and params.ny % by == 0
        and by >= YB
    )


def make_zcarry_mhd_packed_io(
    params: RunParams,
    tiles: tuple[int, int] | None = None,
    interpret: bool = False,
    with_inv_dt: bool = False,
    gravity_z=None,
) -> Callable:
    """Build ``step_packed(P, dt) -> P_new`` on the packed loop state.

    Rotating-frame runs (params.omega0 > 0, the shearing-box MAIN kernel)
    evaluate xpos from a static in-kernel iota exactly like the packed
    shear kernel (shear_packed._make_main_kernel): x is ghost-free and
    lane-exact, so window column == global column.

    ``gravity_z``: stratified-MRI analytic vertical gravity gz(z); the
    half-dt kick is applied to the trace state parts BEFORE they enter the
    cross-tile carry stacks (gravity is time-static and dt is fixed within
    a step, so carried planes were kicked with the same values a fresh
    computation would use), and the conservative source enters
    mhd_apply_update per output tile.

    With params.compensated the packed state carries 2*nvar channels
    (state + Kahan carry): the stencil buffers hold only the nvar state
    channels, and each real tile additionally DMAs the carry channels of
    its own bz output planes (carries are per-cell — no stencil reach).

    (A landing-buffer input-DMA prefetch variant was hardware-validated in
    round 4 — parity exact, 40.6 ms at 256^3, NO win over the direct DMA
    wait — and deleted in round 5: promote-or-delete.)

    ``with_inv_dt``: additionally fold the NEXT step's CFL reduction over
    the updated state into the kernel and return ``(P_new, inv_dt)``. The
    reduction partitions every interior cell across tiles so each cell's
    +1 face-B shifts are VMEM-resident when reduced: in-block cells read
    their block; z-tile seams read the previous tile's last output plane
    (carried) and the column's stashed first plane (z wrap); y-column
    seams read the previous column's stashed last row (full-z) and, for
    the last column, the first column's stashed first row (y wrap). Pure
    VMEM state — no extra DMA. max() is exactly associative, so the
    result is bit-identical to timestep.compute_inv_dt_mhd_packed on the
    output (tested in tests/test_pallas.py)."""
    from ..core.constants import IA, IB, IC, IU, IV, IW
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
    from .fused_mhd3d import _pick_tiles

    g = params.ghost_width
    nv = params.nb_var
    comp = params.compensated
    nvc = 2 * nv if comp else nv
    nz, ny, nx = params.nz, params.ny, params.nx
    bz, by = tiles or _pick_tiles(params)
    if nz % bz or ny % by or by < YB or bz < g:
        raise ValueError(f"tiles {(bz, by)} unsupported for {(nz, ny)}")
    if with_inv_dt and bz % 8:
        # the CFL stash slices index the (nv, nz, nx) scratch at z0 = k*bz
        # offsets declared 8-aligned via pl.multiple_of — only sound when
        # bz is a sublane-tile multiple (fail fast instead of a Mosaic
        # compile error on the fallback tiles bz in {4, 2, 1})
        raise ValueError(
            f"with_inv_dt needs bz % 8 == 0 (sublane-aligned CFL stash "
            f"slices); got bz={bz}"
        )
    wy = by + 2 * YB
    rows_c = by + 2 * g                # clipped compute row width
    nzb, nyb = nz // bz, ny // by
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32

    tile_params = params.replace(
        ny=by, nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    # carried y-box metadata, discovered at trace time (discovered-box pattern):
    # every store records the BoxField's static y box; loads re-wrap the
    # stored rows with it (the kernel body is traced exactly once, and
    # program order guarantees store-before-first-load per buffer)
    meta: dict[str, tuple[int, int]] = {}

    def kernel(
        dt_ref, p_hbm, out_ref, *rest,
    ):
        rest = list(rest)
        inv_ref = rest.pop(0) if with_inv_dt else None
        (u_b, q_b, sh0, sh1, sh2, sh3, st0, st1, st2, st3, st4,
         res) = rest[:12]
        rest = rest[12:]
        if comp:
            c_buf, sem_comp = rest[:2]
            rest = rest[2:]
        if with_inv_dt:
            prevpl, firstpl, rows0, rows1, firstrow, acc = rest[:6]
            rest = rest[6:]
        sem_in, sem_out = rest
        sh_bufs = (sh0, sh1, sh2, sh3)
        st_bufs = (st0, st1, st2, st3, st4)
        yi = pl.program_id(0)
        zi = pl.program_id(1)          # 0 = warmup tile of this column
        z0 = (zi - 1) * bz             # global plane of the tile start
        i = yi * (nzb + 1) + zi        # linear grid step
        dt = dt_ref[0, 0]

        def store(buf, name, field, lo_plane, n, slot_of_plane):
            """Clip ``field`` to planes [lo_plane, lo_plane+n) and store."""
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
        # (at warmup these move junk the demand chain never reads)
        u_b[:, 0:4] = u_b[:, bz : bz + 4]
        q_b[:, 0:3] = q_b[:, bz : bz + 3]
        for b in sh_bufs:
            b[0:2] = b[bz : bz + 2]
        for b in st_bufs:
            b[:, 0:1] = b[:, bz : bz + 1]

        # ---- fresh U planes [3, bz+3) by DMA (warmup: valid sub-range
        # [-g, 3) -> slots [bz-g+1, bz+4); normal: [z0+3, z0+bz+3)) ----
        # (channel slice [0, nv): compensated carries never enter stencils)
        @pl.when(zi == 0)
        def _():
            c = pltpu.make_async_copy(
                p_hbm.at[pl.ds(0, nv), pl.ds(0, g + 3),
                         pl.ds(yi * by, wy), :],
                u_b.at[:, pl.ds(bz + 1 - g, g + 3)],
                sem_in,
            )
            c.start()
            c.wait()

        if comp:
            # this tile's own output planes' Kahan-carry channels (no
            # stencil reach — per-cell); started here, waited right before
            # the state update consumes them
            def comp_dma():
                return pltpu.make_async_copy(
                    p_hbm.at[pl.ds(nv, nv), pl.ds(g + z0, bz),
                             pl.ds(yi * by + YB, by), :],
                    c_buf,
                    sem_comp,
                )

            @pl.when(zi > 0)
            def _():
                comp_dma().start()

        @pl.when(zi > 0)
        def _():
            c = pltpu.make_async_copy(
                p_hbm.at[pl.ds(0, nv), pl.ds(g + z0 + 3, bz),
                         pl.ds(yi * by, wy), :],
                u_b.at[:, pl.ds(4, bz)],
                sem_in,
            )
            c.start()
            c.wait()

        # local-frame U view, clipped to the stencil-consumed y extent
        def u_slab(lo, n):
            return BoxField(
                u_b[:, lo + 1 : lo + 1 + n, YB - g : YB + by + g, :],
                lo, YB - g,
            )

        # rotating frame: global x from a static iota (x is ghost-free and
        # lane-exact — shear_packed._make_main_kernel's convention)
        xpos = None
        if params.omega0 > 0:
            ii = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nx), 2).astype(
                dtype
            )
            xpos = params.xmin + params.dx / 2 + ii * params.dx

        # stratified-MRI analytic vertical gravity over local planes
        # [-1, bz+2) (covers every part box the half-dt kick touches); the
        # warmup tile evaluates gz at sub-domain planes whose values feed
        # only junk the demand chain never reads
        grav = None
        if gravity_z is not None:
            # full-shape iota, not a broadcast: Mosaic aborts on box-slices
            # of a broadcast dim (see shear_packed._make_main_kernel)
            kz = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (bz + 3, rows_c, nx), 0
                )
                - 1 + z0
            )
            zc = params.zmin + params.dz / 2 + kz.astype(dtype) * params.dz
            grav = (None, None, BoxField(gravity_z(zc), -1, YB - g))

        # ---- Q fresh [2, bz+2) <- U [2, bz+3) ----
        Q_new, _c = constoprim_mhd(
            tile_params, u_slab(2, bz + 1), dt, xp=BOX
        )
        store(q_b, "q", Q_new, 2, bz, lambda p: p + 1)

        def q_slab(lo, n):
            oy, rows = meta["q"]
            return BoxField(q_b[:, lo + 1 : lo + 1 + n, 0:rows, :], lo, oy)

        # ---- shared precursors fresh [2, bz+2) <- Q,U [1, bz+2) ----
        u1 = u_slab(1, bz + 1)
        sh_new = trace_mhd3d_shared_precursors(
            tile_params, q_slab(1, bz + 1),
            u1[IA], u1[IB], u1[IC], xpos, xp=BOX,
        )
        for k, f in enumerate(sh_new):
            store(sh_bufs[k], f"sh{k}", f, 2, bz, lambda p: p)

        def sh_tuple(lo, n, oz):
            out = []
            for k in range(4):
                oy, rows = meta[f"sh{k}"]
                out.append(
                    BoxField(sh_bufs[k][lo : lo + n, 0:rows, :], oz, oy)
                )
            return tuple(out)

        # ---- trace states fresh [0, bz+1) (in-plane assembly) ----
        local = trace_mhd3d_local_precursors(
            tile_params, q_slab(-1, bz + 3),
            u_slab(-1, bz + 3)[IA], u_slab(-1, bz + 3)[IB], xp=BOX,
        )
        shared = sh_tuple(0, bz + 1, 0)
        # z+1 planes declared AT the consuming plane (the whole-array path
        # shifts them down with shift_p(_Z))
        shared_p = sh_tuple(1, bz + 1, 0)
        bfz_p = BoxField(
            u_b[IC, 2 : bz + 3, YB - g : YB + by + g, :], 0, YB - g
        )
        u0 = u_slab(0, bz + 1)
        P = trace_mhd3d_state_parts(
            tile_params, q_slab(0, bz + 1),
            u0[IA], u0[IB], u0[IC], bfz_p,
            shared, shared_p, local, dt, xpos, xp=BOX,
        )
        if grav is not None:
            # half-dt gravity kick on every trace part BEFORE the carry
            # stores (carried planes are then kick-consistent: gravity is
            # time-static and dt fixed within the step) — the same wrap
            # _mhd_3d_fluxes_emfs applies in the whole-array path
            def kick(q):
                for d, slot in enumerate((IU, IV, IW)):
                    if grav[d] is not None:
                        q = BOX.set_component(
                            q, slot, q[slot] + 0.5 * dt * grav[d]
                        )
                return q

            P = {k: (lambda f=v: kick(f())) for k, v in P.items()}
        # persist the 5 cross-tile stacks; hand the flux assembly the
        # carried [-1, bz) slabs in their place (their shift_m(_Z) in the
        # assembly then aligns them at the consuming plane)
        names = ("qm_z", "qRT_y", "qLT_y", "qRT_x", "qLT_x")
        for k, nm in enumerate(names):
            store(st_bufs[k], f"st{k}", P[nm](), 0, bz + 1,
                  lambda p: p + 1)
        P2 = dict(P)

        def carried(k):
            oy, rows = meta[f"st{k}"]
            return BoxField(st_bufs[k][:, 0 : bz + 1, 0:rows, :], -1, oy)

        for k, nm in enumerate(names):
            P2[nm] = (lambda k=k: carried(k))

        fluxes, emfs = mhd_fluxes_emfs_from_parts(
            tile_params, P2, xpos, xp=BOX
        )
        comp_box = None
        if comp:
            @pl.when(zi > 0)
            def _():
                comp_dma().wait()

            comp_box = BoxField(c_buf[...], 0, YB)
        upd = mhd_apply_update(
            tile_params, u_slab(0, bz), fluxes, emfs, dt,
            margin=(0, YB, 0), xp=BOX, comp=comp_box, gravity=grav,
        )

        if with_inv_dt:
            from ..core.constants import IB as _IB, IC as _IC

            def inv_of(st, by_p, bz_p):
                """CFL reduction over a cell set: ``st`` [nv, ...cells],
                ``by_p``/``bz_p`` the +1-face B fields at the same cells
                (the x face wraps in-row: periodic BC)."""
                if st.ndim == 2:
                    # single-row cell sets must keep a sublane axis: a
                    # rank-1 lane roll lowers to a 1-D tpu.concatenate
                    # Mosaic rejects ("input offsets outside of the first
                    # tile"); rank-2 rolls are the proven in-row wrap
                    st = st[:, None, :]
                    by_p = by_p[None]
                    bz_p = bz_p[None]
                rho = jnp.maximum(st[0], params.smallr)
                ia = st[5]
                return _inv_dt_mhd_fields(
                    params, st[0], st[1],
                    st[2] / rho, st[3] / rho, st[4] / rho,
                    0.5 * (ia + jnp.roll(ia, -1, -1)),
                    0.5 * (st[6] + by_p),
                    0.5 * (st[7] + bz_p),
                )

            def bump(val):
                acc[0, 0] = jnp.maximum(acc[0, 0], val)

            @pl.when(i == 0)
            def _():
                acc[0, 0] = jnp.zeros((), dtype)

            @pl.when(zi > 0)
            def _():
                blk = upd[0:nv] if comp else upd
                ys = slice(0, by - 1)
                # every stash slice sits at a multiple of bz (and bz % 8
                # == 0, enforced above) but Mosaic's affine prover cannot
                # see through (zi - 1) * bz — declare the alignment with
                # pl.multiple_of (hardware ladder zc_invdt failed twice on
                # "cannot statically prove that index in dimension 1 is a
                # multiple of 8" without it)
                z0a = pl.multiple_of(z0, 8)
                # stashes first (the same tile's C pieces read firstrow)
                @pl.when(yi == 0)
                def _():
                    firstrow[:, pl.ds(z0a, bz)] = blk[:, :, 0, :]

                @pl.when(jax.lax.rem(yi, jnp.int32(2)) == 0)
                def _():
                    rows0[:, pl.ds(z0a, bz)] = blk[:, :, by - 1, :]

                @pl.when(jax.lax.rem(yi, jnp.int32(2)) == 1)
                def _():
                    rows1[:, pl.ds(z0a, bz)] = blk[:, :, by - 1, :]

                @pl.when(zi == 1)
                def _():
                    firstpl[...] = blk[:, 0]

                # A: this column's rows [0, by-1)
                bump(inv_of(blk[:, 0 : bz - 1, ys],
                            blk[_IB, 0 : bz - 1, 1:by],
                            blk[_IC, 1:bz, ys]))

                @pl.when(zi >= 2)          # z-tile seam plane z0-1
                def _():
                    bump(inv_of(prevpl[:, ys], prevpl[_IB, 1:by],
                                blk[_IC, 0, ys]))

                @pl.when(zi == nzb)        # z wrap: plane nz-1 <- plane 0
                def _():
                    bump(inv_of(blk[:, bz - 1, ys],
                                blk[_IB, bz - 1, 1:by],
                                firstpl[_IC, ys]))

                # B: previous column's stashed last row, planes [z0, z1)
                @pl.when(yi > 0)
                def _():
                    even = jax.lax.rem(yi, jnp.int32(2)) == 1  # prev column parity 0
                    stp = jnp.where(even, rows0[:, pl.ds(z0a, bz)],
                                    rows1[:, pl.ds(z0a, bz)])
                    # whole-tile loads at pl.multiple_of-declared offsets,
                    # value-sliced afterwards: slice the already aligned
                    # ``stp`` load instead of re-loading at z0+1, and split
                    # the z0+bz / wrap-to-0 single-plane read into two
                    # branches (a jnp.where-selected index is opaque to
                    # the prover).
                    by_p = blk[_IB, :, 0, :]
                    bump(inv_of(stp[:, 0 : bz - 1], by_p[0 : bz - 1],
                                stp[_IC, 1:]))

                    @pl.when(zi < nzb)
                    def _():
                        znxt = pl.multiple_of(z0 + bz, 8)
                        nxt = jnp.where(
                            even, rows0[_IC, pl.ds(znxt, 1)],
                            rows1[_IC, pl.ds(znxt, 1)],
                        )
                        bump(inv_of(stp[:, bz - 1 :], by_p[bz - 1 :],
                                    nxt))

                    @pl.when(zi == nzb)
                    def _():
                        nxt = jnp.where(even, rows0[_IC, pl.ds(0, 1)],
                                        rows1[_IC, pl.ds(0, 1)])
                        bump(inv_of(stp[:, bz - 1 :], by_p[bz - 1 :],
                                    nxt))

                # C: the LAST column's own last row (y wrap to column 0's
                # first row; for a single column, to its own)
                @pl.when(yi == nyb - 1)
                def _():
                    fr_b = firstrow[_IB, pl.ds(z0a, bz)]
                    bump(inv_of(blk[:, 0 : bz - 1, by - 1],
                                fr_b[0 : bz - 1],
                                blk[_IC, 1:bz, by - 1]))

                    @pl.when(zi >= 2)
                    def _():
                        # aligned tile load at (zi-2)*bz, value-slice the
                        # last plane (z0-1 itself is sublane-unaligned)
                        fr_m = firstrow[
                            _IB, pl.ds(pl.multiple_of(z0 - bz, 8), bz)
                        ]
                        bump(inv_of(prevpl[:, by - 1],
                                    fr_m[bz - 1],
                                    blk[_IC, 0, by - 1]))

                    @pl.when(zi == nzb)
                    def _():
                        bump(inv_of(blk[:, bz - 1, by - 1],
                                    fr_b[bz - 1],
                                    firstpl[_IC, by - 1]))

                prevpl[...] = blk[:, bz - 1]

                @pl.when(jnp.logical_and(yi == nyb - 1, zi == nzb))
                def _():
                    inv_ref[0, 0] = acc[0, 0]

        # ---- output DMAs for tile (zi-1, yi): interior block + wrap
        # ghost bands (same spec as packed_io.make_packed_io_step).
        # Slots and deferred drains index REAL tiles (warmups issue no
        # DMAs and must not advance the slot/drain bookkeeping).
        j = yi * nzb + (zi - 1)        # real-tile linear index (zi >= 1)
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

        # drain the DMAs issued two REAL tiles ago on this slot, then
        # stage + start this tile's
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

        # final drains at the last real tile: its own DMAs + the previous
        # real tile's (other slot)
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
        (nvc, nz + 2 * g, ny + 2 * YB, nx), dtype
    )
    scratch = [
        pltpu.VMEM((nv, bz + 4, wy, nx), dtype),            # U
        pltpu.VMEM((nv, bz + 3, rows_c, nx), dtype),        # Q
        pltpu.VMEM((bz + 2, rows_c, nx), dtype),            # sh0
        pltpu.VMEM((bz + 2, rows_c, nx), dtype),            # sh1
        pltpu.VMEM((bz + 2, rows_c, nx), dtype),            # sh2
        pltpu.VMEM((bz + 2, rows_c, nx), dtype),            # sh3
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # st0
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # st1
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # st2
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # st3
        pltpu.VMEM((nv, bz + 2, rows_c, nx), dtype),        # st4
        pltpu.VMEM((2, nvc, bz, by, nx), dtype),            # result
    ]
    if comp:
        scratch += [
            pltpu.VMEM((nv, bz, by, nx), dtype),            # Kahan carries
            pltpu.SemaphoreType.DMA,
        ]
    if with_inv_dt:
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        out_shape = (p_shape, jax.ShapeDtypeStruct((1, 1), dtype))
        scratch += [
            pltpu.VMEM((nv, by, nx), dtype),                # prev plane
            pltpu.VMEM((nv, by, nx), dtype),                # first plane
            pltpu.VMEM((nv, nz, nx), dtype),                # rows0
            pltpu.VMEM((nv, nz, nx), dtype),                # rows1
            pltpu.VMEM((nv, nz, nx), dtype),                # first col row
            pltpu.SMEM((1, 1), dtype),                      # acc
        ]
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
