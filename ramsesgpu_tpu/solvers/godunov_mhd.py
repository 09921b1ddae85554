"""Unsplit MUSCL-Hancock Godunov scheme for MHD with constrained transport.

TPU-native re-design of the reference's MHD pipeline
(reference: src/hydro/mhd_godunov_unsplit_cpu_v1.cpp, MHDRunGodunov.cpp and
the kernels of godunov_unsplit_mhd.cuh — the "v1/v4 small-kernel pipeline"
decomposition documented in MHDRunGodunov.h:42-97):

  primitives -> trace (incl. induction half-step) -> 1D HLLD fluxes
  -> conservative update of (rho, E, momenta, out-of-plane B)
  -> 2D corner Riemann -> EMF -> CT curl update of face-centered B.

Everything is whole-array jnp; XLA fuses each stage. The face-centered field
lives in U[IA]/U[IB]/U[IC] at each cell's left faces, exactly as in the
reference's memory layout, so ghost filling and I/O carry over unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from ..ops.eos import constoprim_mhd
from ..ops.riemann_mhd import compute_emf, riemann_mhd
from ..ops.stencil import shift_m, shift_p
from ..ops.trace_mhd import trace_unsplit_mhd_2d

_X, _Y, _Z = -1, -2, -3

# component rotation for the y-sweep 1D Riemann problem: normal velocity and
# normal field into the IU/IA slots (mhd_godunov_unsplit_cpu_v1.cpp:146-163)
_PERM_Y = (ID, IP, IV, IU, IW, IB, IA, IC)
# z-sweep (3D): IU<->IW and IA<->IC
_PERM_Z = (ID, IP, IW, IV, IU, IC, IB, IA)


def _permute(q, perm, xp=None):
    """Component permutation via stack (not fancy indexing, which would
    capture an index-array constant — unsupported inside Pallas kernels)."""
    if xp is None:
        from ..ops.backend import JNP as xp
    return xp.stack([q[i] for i in perm])


def xpos_array(params: RunParams, dtype) -> jnp.ndarray:
    """Cell-center x coordinates, broadcastable over [(z,) y, x].
    Uses broadcasted_iota (plain 1D iota does not lower on TPU Pallas)."""
    import jax

    g = params.ghost_width
    shape = (1,) * (params.dim - 1) + (params.isize,)
    i = jax.lax.broadcasted_iota(jnp.int32, shape, params.dim - 1).astype(dtype)
    return params.xmin + params.dx / 2 + (i - g) * params.dx


def godunov_unsplit_mhd(
    params: RunParams, U: jnp.ndarray, dt, gravity=None, t=None,
    shear_comm=None, xpos=None, apply_dissipation=True,
) -> jnp.ndarray:
    """One unsplit MHD+CT update. ``t`` (current time) is only consumed by
    shearing-box runs, for the conservative flux/emfY remap at the domain
    x-faces; pass None to skip the remap. ``shear_comm`` (sharded runs,
    parallel/shear_dist.ShardedShearComm) swaps the remap for its collective
    twin; ``xpos`` overrides the cell-center x coordinates (per-shard global
    offsets in distributed rotating-frame runs)."""
    if params.dim == 2:
        return _godunov_unsplit_mhd_2d(
            params, U, dt, gravity=gravity, apply_dissipation=apply_dissipation
        )
    return _godunov_unsplit_mhd_3d(
        params, U, dt, gravity=gravity, t=t, shear_comm=shear_comm, xpos=xpos,
        apply_dissipation=apply_dissipation,
    )


def _gravity_kick(params: RunParams, states, gravity, dt):
    """Half-dt gravity predictor on traced states (MHDRunGodunov.cpp:2688-2736
    adds grav*dt/2 to the velocities of qm/qp/qEdge)."""
    vel_slots = (IU, IV, IW)[: params.dim]
    kicked = []
    for q in states:
        for d_ax, slot in enumerate(vel_slots):
            if d_ax < gravity.shape[0]:
                q = q.at[slot].add(0.5 * dt * gravity[d_ax])
        kicked.append(q)
    return kicked


def _gravity_source(params: RunParams, U_old, U_new, gravity, dt, interior):
    """Conservative source term: d(rho v)/dt = rho g, dE/dt = (rho v).g with
    time-centered momentum (gravity.cuh kernel_gravity_source_term)."""
    rho_old = U_old[ID][interior]
    mom_slots = (IU, IV, IW)[: params.dim]
    for d_ax, slot in enumerate(mom_slots):
        if d_ax >= gravity.shape[0]:
            continue
        g_d = gravity[d_ax][interior]
        mom_half = 0.5 * (U_old[slot][interior] + U_new[slot][interior])
        U_new = U_new.at[(slot,) + interior].add(dt * rho_old * g_d)
        U_new = U_new.at[(IP,) + interior].add(dt * mom_half * g_d)
    return U_new


def _godunov_unsplit_mhd_2d(
    params: RunParams, U: jnp.ndarray, dt, gravity=None, apply_dissipation=True
) -> jnp.ndarray:
    g = params.ghost_width
    dtdx = dt / params.dx
    dtdy = dt / params.dy
    xpos = xpos_array(params, U.dtype)

    Q, _c = constoprim_mhd(params, U, dt)
    (qm_x, qm_y), (qp_x, qp_y), (qRT, qRB, qLT, qLB) = trace_unsplit_mhd_2d(
        params, Q, U[IA], U[IB], dt, xpos
    )
    if gravity is not None:
        (qm_x, qm_y, qp_x, qp_y, qRT, qRB, qLT, qLB) = _gravity_kick(
            params, (qm_x, qm_y, qp_x, qp_y, qRT, qRB, qLT, qLB), gravity, dt
        )

    # --- 1D Riemann fluxes at faces ---
    flux_x = riemann_mhd(params, shift_m(qm_x, _X), qp_x)
    flux_y = _permute(
        riemann_mhd(
            params,
            _permute(shift_m(qm_y, _Y), _PERM_Y),
            _permute(qp_y, _PERM_Y),
        ),
        _PERM_Y,
    )

    # --- conservative update (hydro vars + out-of-plane B only;
    #     in-plane B is evolved by CT below) ---
    interior = (slice(g, -g), slice(g, -g))
    dF_x = (flux_x - shift_p(flux_x, _X))[(slice(None),) + interior]
    dF_y = (flux_y - shift_p(flux_y, _Y))[(slice(None),) + interior]
    dU = dtdx * dF_x + dtdy * dF_y
    # zero the face-field slots (flux[IA] is zero by construction; IB slot of
    # flux_x would be the transverse-field flux already accounted by the EMF)
    mask = jnp.ones((8,) + (1,) * params.dim, U.dtype).at[IA].set(0.0).at[IB].set(0.0)
    U_new = U.at[(slice(None),) + interior].add(mask * dU)

    # --- EMF at corners and CT update ---
    emf_z = compute_emf(
        params,
        shift_m(shift_m(qRT, _X), _Y),
        shift_m(qRB, _X),
        shift_m(qLT, _Y),
        qLB,
        "z",
        xpos,
    )
    # CT covers one extra layer of faces (reference loop bound jsize-g+1)
    ct = (slice(g, U.shape[_Y] - g + 1), slice(g, U.shape[_X] - g + 1))
    dbx = (shift_p(emf_z, _Y) - emf_z)[ct] * dtdy
    dby = -(shift_p(emf_z, _X) - emf_z)[ct] * dtdx
    U_new = U_new.at[(IA,) + ct].add(dbx)
    U_new = U_new.at[(IB,) + ct].add(dby)

    if gravity is not None:
        U_new = _gravity_source(params, U, U_new, gravity, dt, interior)

    if apply_dissipation and (params.nu > 0 or params.eta > 0):
        from .boundary import make_boundaries
        from .dissipation import apply_dissipation_mhd

        U_new = make_boundaries(params, U_new)
        U_new = apply_dissipation_mhd(params, U_new, dt)

    return U_new


def _mhd_3d_fluxes_emfs(params: RunParams, U: jnp.ndarray, dt, xp=None,
                        xpos=None, gravity=None):
    """The compute core of the 3D step: face fluxes and edge EMFs.
    Shared by the XLA whole-array update (xp=JNP, roll shifts absorbed by
    ghost margins) and the fused Pallas kernel (xp=BOX: intermediates carry
    validity boxes and shrink to exactly the extent later stages consume —
    see ops/backend.py).

    ``gravity``: optional per-axis tuple (gx, gy, gz) of static-gravity
    fields (None entries skipped). Each is a 3D field aligned with U's
    frame (a full-window BoxField inside a kernel, a broadcastable array
    in the whole-array path); the traced states get the half-dt kick
    exactly like _gravity_kick (MHDRunGodunov.cpp:2688-2736)."""
    from ..ops.trace_mhd3d import trace_unsplit_mhd_3d_parts

    if xp is None:
        from ..ops.backend import JNP as xp

    # xpos feeds only the omega0 > 0 branches. Width must match U's row
    # width: params.isize for the whole-array path, the (possibly padded)
    # window row width inside a Pallas kernel tile — values beyond the
    # ghosted extent land in pad lanes that are never consumed. An explicit
    # ``xpos`` overrides (sharded shear: per-shard global coordinates).
    if xpos is None and params.omega0 > 0:
        import jax as _jax

        row_w = (U.value if hasattr(U, "value") else U).shape[-1]
        i = _jax.lax.broadcasted_iota(jnp.int32, (1, 1, row_w), 2).astype(
            U.dtype
        )
        g_ = params.ghost_width
        xpos = params.xmin + params.dx / 2 + (i - g_) * params.dx

    Q, _c = constoprim_mhd(params, U, dt, xp=xp)
    # lazy face/edge state builders: each [8, ...] stack is assembled right
    # before its one consumer so at most ~2 stacks are live at a time
    # (Mosaic allocates in trace order; materializing all 15 stacks at once
    # is what capped the Pallas tile size)
    P = trace_unsplit_mhd_3d_parts(
        params, Q, U[IA], U[IB], U[IC], dt, xpos, xp=xp
    )
    if gravity is not None:
        def kick(q):
            for d, slot in enumerate((IU, IV, IW)):
                if gravity[d] is not None:
                    q = xp.set_component(
                        q, slot, q[slot] + 0.5 * dt * gravity[d]
                    )
            return q

        P = {k: (lambda f=v: kick(f())) for k, v in P.items()}
    return mhd_fluxes_emfs_from_parts(params, P, xpos, xp=xp)


def mhd_fluxes_emfs_from_parts(params: RunParams, P, xpos, xp=None):
    """Face fluxes + edge EMFs from a trace-parts builder dict. The
    z-streaming kernel calls this with builders whose qm_z / qRT_y / qLT_y /
    qRT_x / qLT_x return ring-carried z-1 planes; the shift_m(_Z)
    expressions below then align them with the current plane via the
    BoxField frame instead of a roll."""
    if xp is None:
        from ..ops.backend import JNP as xp

    flux_x = riemann_mhd(params, xp.shift_m(P["qm_x"](), _X), P["qp_x"](), xp=xp)
    flux_y = _permute(
        riemann_mhd(
            params,
            _permute(xp.shift_m(P["qm_y"](), _Y), _PERM_Y, xp=xp),
            _permute(P["qp_y"](), _PERM_Y, xp=xp),
            xp=xp,
        ),
        _PERM_Y,
        xp=xp,
    )
    flux_z = _permute(
        riemann_mhd(
            params,
            _permute(xp.shift_m(P["qm_z"](), _Z), _PERM_Z, xp=xp),
            _permute(P["qp_z"](), _PERM_Z, xp=xp),
            xp=xp,
        ),
        _PERM_Z,
        xp=xp,
    )

    # EMF_Z at edge (i-1/2, j-1/2, k)
    emf_z = compute_emf(
        params,
        xp.shift_m(xp.shift_m(P["qRT_z"](), _X), _Y),
        xp.shift_m(P["qRB_z"](), _X),
        xp.shift_m(P["qLT_z"](), _Y),
        P["qLB_z"](),
        "z",
        xpos,
        xp=xp,
    )
    # EMF_Y at edge (i-1/2, j, k-1/2); note the reference's RB/LT role swap
    # (mhd_godunov_unsplit_cpu_v1.cpp:519-522)
    emf_y = compute_emf(
        params,
        xp.shift_m(xp.shift_m(P["qRT_y"](), _X), _Z),
        xp.shift_m(P["qLT_y"](), _Z),
        xp.shift_m(P["qRB_y"](), _X),
        P["qLB_y"](),
        "y",
        xpos,
        xp=xp,
    )
    # EMF_X at edge (i, j-1/2, k-1/2)
    emf_x = compute_emf(
        params,
        xp.shift_m(xp.shift_m(P["qRT_x"](), _Y), _Z),
        xp.shift_m(P["qRB_x"](), _Y),
        xp.shift_m(P["qLT_x"](), _Z),
        P["qLB_x"](),
        "x",
        xpos,
        xp=xp,
    )
    return (flux_x, flux_y, flux_z), (emf_z, emf_y, emf_x)


def mhd_3d_interior_update(
    params: RunParams, U, dt, margin: tuple[int, int, int] | None = None,
    xp=None, shear_planes: bool = False, xpos=None, comp=None,
    gravity=None,
):
    """Scatter-free variant returning ONLY the updated interior
    [8, nz, ny, nx] — the form consumed by the fused Pallas kernel
    (no .at[] indexed updates, which don't lower on TPU Pallas).

    ``margin`` = (mz, my, mx) offsets of the interior inside U.

    With xp=JNP (default) the stencil shifts are rolls whose wrap corruption
    the margins absorb; with xp=BOX (U a BoxField over a kernel window)
    every intermediate carries its validity box instead — no z/y wrap at
    all, and each stage computes only the extent later stages consume.

    ``shear_planes=True`` (shearing-box runs) additionally returns the raw
    quantities the conservative x-border remap needs, as interior-extent
    planes: (U_new, fpl [2, nz, ny] density flux at the two domain x-faces,
    eypl [2, nz, ny] emfY there, ezpl [nz, ny] emfZ at the xmax face — the
    last feeds the CT update of the KEPT Bx face, solvers/shear.py:87-91).
    """
    if xp is None:
        from ..ops.backend import JNP as xp
    fluxes, emfs = _mhd_3d_fluxes_emfs(params, U, dt, xp=xp, xpos=xpos,
                                       gravity=gravity)
    return mhd_apply_update(
        params, U, fluxes, emfs, dt, margin=margin, xp=xp,
        shear_planes=shear_planes, comp=comp, gravity=gravity,
    )


def mhd_apply_update(
    params: RunParams, U, fluxes, emfs, dt,
    margin: tuple[int, int, int] | None = None, xp=None,
    shear_planes: bool = False, comp=None, gravity=None,
):
    """Conservative + CT update of the interior from precomputed face fluxes
    and edge EMFs (the tail of mhd_3d_interior_update; see its docstring).
    Exposed separately so the z-block-streaming kernel (pallas/zcarry_mhd3d.py)
    can apply it per plane with ring-carried flux/EMF slabs.

    ``comp``: a carried Kahan compensation field (same layout as U). When
    given, the state update runs compensated — y = dU - c; U' = U + y;
    c' = (U' - U) - y — and the function returns [2*nvar, ...] with the new
    compensation channels appended. This removes the f32 ``U += dU``
    accumulation loss (the dominant single-precision error in long runs;
    the reference's answer is USE_DOUBLE, real_type.h:1-105 — on TPU f64
    is ~86x-emulated, so compensated f32 is the production double story."""
    if xp is None:
        from ..ops.backend import JNP as xp
    g = params.ghost_width
    mz, my, mx = margin if margin is not None else (g, g, g)
    dtdx, dtdy, dtdz = dt / params.dx, dt / params.dy, dt / params.dz
    (flux_x, flux_y, flux_z), (emf_z, emf_y, emf_x) = fluxes, emfs
    z0, z1 = mz, mz + params.nz
    y0, y1 = my, my + params.ny
    x0, x1 = mx, mx + params.nx

    def crop(f):
        return xp.crop(f, z0, z1, y0, y1, x0, x1)

    def face_plane(f, xf):
        return xp.crop(f, z0, z1, y0, y1, xf, xf + 1)[..., 0]

    dU = (
        dtdx * crop(flux_x - xp.shift_p(flux_x, _X))
        + dtdy * crop(flux_y - xp.shift_p(flux_y, _Y))
        + dtdz * crop(flux_z - xp.shift_p(flux_z, _Z))
    )
    dbx = crop(xp.shift_p(emf_z, _Y) - emf_z) * dtdy - crop(
        xp.shift_p(emf_y, _Z) - emf_y
    ) * dtdz
    dby = crop(xp.shift_p(emf_x, _Z) - emf_x) * dtdz - crop(
        xp.shift_p(emf_z, _X) - emf_z
    ) * dtdx
    dbz = crop(xp.shift_p(emf_y, _X) - emf_y) * dtdx - crop(
        xp.shift_p(emf_x, _Y) - emf_x
    ) * dtdy
    Ui = crop(U)
    deltas = [dU[ID], dU[IP], dU[IU], dU[IV], dU[IW], dbx, dby, dbz]
    if gravity is not None:
        # conservative source term with time-centered momentum, exactly
        # _gravity_source (gravity.cuh kernel_gravity_source_term): the
        # energy source reads the momentum BEFORE its own source add.
        # Compensated mode chains the Kahan carry through every add.
        rho_old = Ui[ID]
        if comp is None:
            outs = [Ui[c] + d for c, d in enumerate(deltas)]
            for d_ax, slot in enumerate((IU, IV, IW)):
                if gravity[d_ax] is None:
                    continue
                gd = crop(gravity[d_ax])
                mom_half = 0.5 * (Ui[slot] + outs[slot])
                outs[slot] = outs[slot] + dt * rho_old * gd
                outs[IP] = outs[IP] + dt * mom_half * gd
            U_new = jnp.stack(outs)
        else:
            Ci = crop(comp)

            def kadd(val, carry, delta):
                y = delta - carry
                t_ = val + y
                return t_, (t_ - val) - y

            outs, carries = [], []
            for c, d in enumerate(deltas):
                t_, c_ = kadd(Ui[c], Ci[c], d)
                outs.append(t_)
                carries.append(c_)
            for d_ax, slot in enumerate((IU, IV, IW)):
                if gravity[d_ax] is None:
                    continue
                gd = crop(gravity[d_ax])
                mom_half = 0.5 * (Ui[slot] + outs[slot])
                outs[slot], carries[slot] = kadd(
                    outs[slot], carries[slot], dt * rho_old * gd
                )
                outs[IP], carries[IP] = kadd(
                    outs[IP], carries[IP], dt * mom_half * gd
                )
            U_new = jnp.stack(outs + carries)
    elif comp is None:
        U_new = jnp.stack([Ui[c] + d for c, d in enumerate(deltas)])
    else:
        Ci = crop(comp)
        outs, carries = [], []
        for c, d in enumerate(deltas):
            y = d - Ci[c]
            t_ = Ui[c] + y
            carries.append((t_ - Ui[c]) - y)
            outs.append(t_)
        U_new = jnp.stack(outs + carries)
    if not shear_planes:
        return U_new
    fpl = jnp.stack(
        [face_plane(flux_x[ID], x0), face_plane(flux_x[ID], x1)]
    )
    eypl = jnp.stack([face_plane(emf_y, x0), face_plane(emf_y, x1)])
    ezpl = face_plane(emf_z, x1)
    return U_new, fpl, eypl, ezpl


def mhd_3d_interior_update_staged(
    params: RunParams, U, dt,
    margin: tuple[int, int, int] | None = None, xp=None, comp=None,
    xpos=None, gravity=None,
):
    """mhd_3d_interior_update with DEMAND-DRIVEN per-stage extents (BOX
    backend only). The box machinery shrinks intermediates forward through
    stencil meets, but each stage still computes on its full input extents
    until a meet trims them — at the packed kernel's (8, 32) tile that
    leaves a measured 2.08x FLOP recompute (scripts/margin_flops.py). Here
    every stage's inputs are pre-sliced to exactly the margin later stages
    consume (reaches derived from the z-streaming kernel's plane-exact
    schedule, pallas/zcarry_mhd3d.py, and bounded by the ghost width):

        stage            z-margin (lo, hi)   y-margin (lo, hi)
        U / constoprim        (2, 3)              (3, 3)
        Q                     (2, 2)              (3, 3)
        shared precursors     (1, 2)              (1, 2)
        local precursors      (1, 1)              (1, 1)
        trace states          (1, 1)              (1, 1)
        fluxes / EMFs         (0..1, 1)           (0..1, 1)
        update                interior

    Same values as mhd_3d_interior_update (slicing never changes a compute
    graph, only its extent) — the packed-IO kernel's interpret-mode tests
    assert bitwise equality against the whole-array step.

    ``xpos``/``gravity``: rotating-frame coordinate and static-gravity
    kick, as in mhd_3d_interior_update. Both enter pointwise (no new
    stencil reach), so the staged extents above remain exact — this is
    what lets the shearing-box MAIN kernel run the staged body (round 4:
    the non-staged x2.08 margin recompute was ~3.5 ms of the 10.4 ms MRI
    main-kernel time at 128x256x128)."""
    from ..ops.backend import BoxField
    from ..ops.trace_mhd3d import (
        trace_mhd3d_local_precursors,
        trace_mhd3d_shared_precursors,
        trace_mhd3d_state_parts,
    )

    if xp is None:
        from ..ops.backend import BOX as xp
    if params.omega0 > 0 and xpos is None:
        raise ValueError("staged rotating frame needs an explicit xpos")
    g = params.ghost_width
    mz, my, mx = margin if margin is not None else (g, g, g)
    nz, ny = params.nz, params.ny

    def clip(f, zlo, zhi, ylo, yhi):
        z0 = max(mz - zlo, f.oz)
        z1 = min(mz + nz + zhi, f.oz + f.ze)
        y0 = max(my - ylo, f.oy)
        y1 = min(my + ny + yhi, f.oy + f.ye)
        return BoxField(
            f.value[..., z0 - f.oz : z1 - f.oz, y0 - f.oy : y1 - f.oy, :],
            z0, y0,
        )

    Ub = clip(U, 2, 3, 3, 3)
    Q, _c = constoprim_mhd(params, Ub, dt, xp=xp)
    Q = clip(Q, 2, 2, 3, 3)

    shared = trace_mhd3d_shared_precursors(
        params, Q, Ub[IA], Ub[IB], Ub[IC], xpos, xp=xp
    )
    shared = tuple(clip(f, 1, 2, 1, 2) for f in shared)
    shared_p = tuple(xp.shift_p(f, _Z) for f in shared)

    local = trace_mhd3d_local_precursors(
        params, clip(Q, 2, 2, 1, 1), clip(Ub[IA], 2, 2, 1, 1),
        clip(Ub[IB], 2, 2, 1, 1), xp=xp,
    )
    local = tuple(clip(f, 1, 1, 1, 1) for f in local)

    Qs = clip(Q, 1, 1, 3, 3)
    bfs = clip(Ub, 1, 1, 3, 3)
    bfz_p = clip(xp.shift_p(Ub[IC], _Z), 1, 1, 3, 3)
    P = trace_mhd3d_state_parts(
        params, Qs, bfs[IA], bfs[IB], bfs[IC], bfz_p,
        shared, shared_p, local, dt, xpos, xp=xp,
        merged=params.trace_merged,
    )
    if gravity is not None:
        # half-dt kick on the traced states, exactly _mhd_3d_fluxes_emfs
        # (pointwise — composes with the clip below in either order)
        def kick(q):
            for d, slot in enumerate((IU, IV, IW)):
                if gravity[d] is not None:
                    q = xp.set_component(
                        q, slot, q[slot] + 0.5 * dt * gravity[d]
                    )
            return q

        P = {k: (lambda f=v: kick(f())) for k, v in P.items()}
    # trim each lazy state stack to the flux/EMF demand before the solvers
    P = {k: (lambda f=v: clip(f(), 1, 1, 1, 1)) for k, v in P.items()}
    fluxes, emfs = mhd_fluxes_emfs_from_parts(params, P, xpos, xp=xp)
    return mhd_apply_update(params, U, fluxes, emfs, dt, margin=margin,
                            xp=xp, comp=comp, gravity=gravity)


def _uses_shear(params: RunParams) -> bool:
    from ..core.constants import BoundaryConditionType as BCT

    return (
        params.boundary_xmin == BCT.BC_SHEARINGBOX
        or params.boundary_xmax == BCT.BC_SHEARINGBOX
    )


def _shear_remap_pair(params: RunParams, f_xmin, f_xmax, t, dt):
    """Conservative remap of a pair of x-border face fields (density flux or
    emfY slabs, y along the LAST axis, interior-y extent).

    The sheared-periodic BC makes the two sides compute different fluxes
    through the same physical face; the fix replaces each side's value by
    the half-sum of its own and the other side's value linearly interpolated
    at the sheared y offset deltay(t + dt/2) — restoring exact global mass /
    By conservation (reference: shearingBox_utils.cuh:47-170
    kernel_remapping_mhd_3d, after Dumses bval_shear_flux/bval_shear_emf).
    """
    dy = params.dy
    Ly = params.ymax - params.ymin
    Lx = params.xmax - params.xmin
    deltay = jnp.mod(1.5 * params.omega0 * Lx * (t + 0.5 * dt), Ly)
    jplus = jnp.floor(deltay / dy).astype(jnp.int32)
    w = jnp.mod(deltay, dy) / dy  # weight of the (j - jplus - 1) sample

    interp_for_min = w * jnp.roll(f_xmax, jplus + 1, axis=-1) + (
        1.0 - w
    ) * jnp.roll(f_xmax, jplus, axis=-1)
    interp_for_max = (1.0 - w) * jnp.roll(f_xmin, -jplus, axis=-1) + w * jnp.roll(
        f_xmin, -(jplus + 1), axis=-1
    )
    return 0.5 * (f_xmin + interp_for_min), 0.5 * (f_xmax + interp_for_max)


def _shear_remap_pair_stacked(params: RunParams, f_xmin, f_xmax, t, dt):
    """_shear_remap_pair on STACKED border fields ([k, nz, ny]; the packed
    shear step remaps density flux and emfY together): two dynamic rolls
    instead of eight — roll(x, s+1) == roll(roll(x, s), 1) exactly, and a
    stacked roll is per-channel identical to separate rolls, so each
    channel is bit-identical to _shear_remap_pair."""
    dy = params.dy
    Ly = params.ymax - params.ymin
    Lx = params.xmax - params.xmin
    deltay = jnp.mod(1.5 * params.omega0 * Lx * (t + 0.5 * dt), Ly)
    jplus = jnp.floor(deltay / dy).astype(jnp.int32)
    w = jnp.mod(deltay, dy) / dy  # weight of the (j - jplus - 1) sample

    rmax0 = jnp.roll(f_xmax, jplus, axis=-1)
    rmax1 = jnp.roll(rmax0, 1, axis=-1)
    rmin0 = jnp.roll(f_xmin, -jplus, axis=-1)
    rmin1 = jnp.roll(rmin0, -1, axis=-1)
    interp_for_min = w * rmax1 + (1.0 - w) * rmax0
    interp_for_max = (1.0 - w) * rmin0 + w * rmin1
    return 0.5 * (f_xmin + interp_for_min), 0.5 * (f_xmax + interp_for_max)


def _godunov_unsplit_mhd_3d(
    params: RunParams, U: jnp.ndarray, dt, gravity=None, t=None,
    shear_comm=None, xpos=None, apply_dissipation=True,
) -> jnp.ndarray:
    from ..ops.trace_mhd3d import trace_unsplit_mhd_3d

    g = params.ghost_width
    dtdx = dt / params.dx
    dtdy = dt / params.dy
    dtdz = dt / params.dz
    if xpos is None:
        xpos = xpos_array(params, U.dtype)

    Q, _c = constoprim_mhd(params, U, dt)
    (qm, qp, qedge_z, qedge_y, qedge_x) = trace_unsplit_mhd_3d(
        params, Q, U[IA], U[IB], U[IC], dt, xpos
    )
    if gravity is not None:
        qm = tuple(_gravity_kick(params, qm, gravity, dt))
        qp = tuple(_gravity_kick(params, qp, gravity, dt))
        qedge_z = tuple(_gravity_kick(params, qedge_z, gravity, dt))
        qedge_y = tuple(_gravity_kick(params, qedge_y, gravity, dt))
        qedge_x = tuple(_gravity_kick(params, qedge_x, gravity, dt))

    flux_x = riemann_mhd(params, shift_m(qm[0], _X), qp[0])
    flux_y = _permute(
        riemann_mhd(
            params,
            _permute(shift_m(qm[1], _Y), _PERM_Y),
            _permute(qp[1], _PERM_Y),
        ),
        _PERM_Y,
    )
    flux_z = _permute(
        riemann_mhd(
            params,
            _permute(shift_m(qm[2], _Z), _PERM_Z),
            _permute(qp[2], _PERM_Z),
        ),
        _PERM_Z,
    )

    shear_remap = _uses_shear(params) and t is not None
    iy = slice(g, g + params.ny)
    _remap_pair = (
        shear_comm.remap_pair if shear_comm is not None
        else lambda p_, a, b, t_, dt_: _shear_remap_pair(p_, a, b, t_, dt_)
    )
    if shear_remap:
        # conservative density-flux remap at the two domain x-faces: the main
        # update then uses the remapped face flux directly (equivalent to the
        # reference's mask-then-add, godunov_unsplit_mhd.cuh:5546-5590 +
        # shearingBox_utils.cuh:428-492)
        fmin, fmax = _remap_pair(
            params, flux_x[ID, :, iy, g], flux_x[ID, :, iy, params.nx + g], t, dt
        )
        flux_x = (
            flux_x.at[ID, :, iy, g].set(fmin)
            .at[ID, :, iy, params.nx + g].set(fmax)
        )

    interior = (slice(g, -g),) * 3
    dU = (
        dtdx * (flux_x - shift_p(flux_x, _X))[(slice(None),) + interior]
        + dtdy * (flux_y - shift_p(flux_y, _Y))[(slice(None),) + interior]
        + dtdz * (flux_z - shift_p(flux_z, _Z))[(slice(None),) + interior]
    )
    mask = (
        jnp.ones((8,) + (1,) * 3, U.dtype)
        .at[IA].set(0.0)
        .at[IB].set(0.0)
        .at[IC].set(0.0)
    )
    U_new = U.at[(slice(None),) + interior].add(mask * dU)
    if shear_remap:
        # density floor on the two remapped border columns
        # (shearingBox_utils.cuh:484-485); under sharding only the
        # domain-edge shard columns apply it
        from jax import lax as _lax

        for xb, is_min in ((g, True), (params.nx + g - 1, False)):
            col = (ID, slice(g, -g), iy, xb)
            clamped = jnp.maximum(U_new[col], params.smallr)
            if shear_comm is not None:
                from .. parallel.mesh import AXIS_X as _AX

                xi = _lax.axis_index(_AX)
                mx = _lax.axis_size(_AX)
                edge = (xi == 0) if is_min else (xi == mx - 1)
                clamped = jnp.where(edge, clamped, U_new[col])
            U_new = U_new.at[col].set(clamped)

    # --- EMFs at the three edge families ---
    # EMF_Z at edge (i-1/2, j-1/2, k): diagonal neighbors in the xy plane
    qRT_z, qRB_z, qLT_z, qLB_z = qedge_z
    emf_z = compute_emf(
        params,
        shift_m(shift_m(qRT_z, _X), _Y),
        shift_m(qRB_z, _X),
        shift_m(qLT_z, _Y),
        qLB_z,
        "z",
        xpos,
    )
    # EMF_Y at edge (i-1/2, j, k-1/2): xz plane. Note the RB/LT role swap in
    # the reference's assembly (mhd_godunov_unsplit_cpu_v1.cpp:519-522:
    # IRB <- qEdge_LT2(i,j,k-1), ILT <- qEdge_RB2(i-1,j,k)).
    qRT_y, qRB_y, qLT_y, qLB_y = qedge_y
    emf_y = compute_emf(
        params,
        shift_m(shift_m(qRT_y, _X), _Z),
        shift_m(qLT_y, _Z),
        shift_m(qRB_y, _X),
        qLB_y,
        "y",
        xpos,
    )
    if shear_remap:
        # emfY remap at the domain x-faces keeps By exactly conserved across
        # the sheared boundary (shearingBox_utils.cuh:134-170)
        emin, emax = _remap_pair(
            params, emf_y[:, iy, g], emf_y[:, iy, params.nx + g], t, dt
        )
        emf_y = emf_y.at[:, iy, g].set(emin).at[:, iy, params.nx + g].set(emax)
    # EMF_X at edge (i, j-1/2, k-1/2): yz plane
    qRT_x, qRB_x, qLT_x, qLB_x = qedge_x
    emf_x = compute_emf(
        params,
        shift_m(shift_m(qRT_x, _Y), _Z),
        shift_m(qRB_x, _Y),
        shift_m(qLT_x, _Z),
        qLB_x,
        "x",
        xpos,
    )

    # --- CT curl update (mhd_ct_update.cuh:124-213) ---
    ct = (
        slice(g, U.shape[_Z] - g + 1),
        slice(g, U.shape[_Y] - g + 1),
        slice(g, U.shape[_X] - g + 1),
    )
    dbx = (shift_p(emf_z, _Y) - emf_z)[ct] * dtdy - (shift_p(emf_y, _Z) - emf_y)[ct] * dtdz
    dby = (shift_p(emf_x, _Z) - emf_x)[ct] * dtdz - (shift_p(emf_z, _X) - emf_z)[ct] * dtdx
    dbz = (shift_p(emf_y, _X) - emf_y)[ct] * dtdx - (shift_p(emf_x, _Y) - emf_x)[ct] * dtdy
    U_new = U_new.at[(IA,) + ct].add(dbx)
    U_new = U_new.at[(IB,) + ct].add(dby)
    U_new = U_new.at[(IC,) + ct].add(dbz)

    if gravity is not None:
        U_new = _gravity_source(params, U, U_new, gravity, dt, interior)

    if apply_dissipation and (params.nu > 0 or params.eta > 0):
        from .dissipation import apply_dissipation_mhd

        if _uses_shear(params) and t is not None:
            # the reference refills with the SHEARED remap before the
            # dissipative step (MHDRunGodunov.cpp:1968-1976)
            from .shear import make_all_boundaries_shear

            U_new = make_all_boundaries_shear(params, U_new, t + dt)
        else:
            from .boundary import make_boundaries

            U_new = make_boundaries(params, U_new)
        U_new = apply_dissipation_mhd(params, U_new, dt)

    return U_new
