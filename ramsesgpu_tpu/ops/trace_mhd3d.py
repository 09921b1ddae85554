"""MUSCL-Hancock trace for 3D MHD with constrained transport.

Whole-array JAX re-design of the reference's per-cell routine
(reference: src/hydro/trace_mhd.h:806-1418 trace_unsplit_mhd_3d, from
DUMSES trace3d). Produces, for every cell:

  qm[d], qp[d]       : face states for the 1D Riemann problems (d = x,y,z)
  qedge_z/y/x        : 4 corner states per edge family feeding the 2D EMF
                       solvers (Z: xy-plane, Y: xz-plane, X: yz-plane)

Face-field indexing: bfx/bfy/bfz hold B at each cell's LEFT x/y/z face
(= U[IA]/U[IB]/U[IC]); xp.shift_p(bf, axis) is therefore this cell's right face.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from .slopes import slope_1d

_X, _Y, _Z = -1, -2, -3


def _corner_avg4(f, ax1, ax2, xp):
    return 0.25 * (
        f
        + xp.shift_m(f, ax1)
        + xp.shift_m(f, ax2)
        + xp.shift_m(xp.shift_m(f, ax1), ax2)
    )


def trace_mhd3d_shared_precursors(
    params: RunParams, Q, bfx, bfy, bfz, xpos, xp=None
):
    """Trace precursor fields consumed at BOTH z and z+1 by the in-plane
    state assembly (trace_mhd3d_state_parts): the x/y edge-centered electric
    fields (trace_mhd.h:850-905) and the in-plane transverse slopes of bfz.
    Split out so the z-block-streaming kernel (pallas/zcarry_mhd3d.py) computes
    each plane once and carries it in a VMEM ring. z-stencil reach:
    Q/bf at z-1..z."""
    if xp is None:
        from .backend import JNP as xp
    omega0 = params.omega0

    # Ex at (i, j-1/2, k-1/2)
    v4 = _corner_avg4(Q[IV], _Y, _Z, xp)
    w4 = _corner_avg4(Q[IW], _Y, _Z, xp)
    B_e = 0.5 * (bfy + xp.shift_m(bfy, _Z))
    C_e = 0.5 * (bfz + xp.shift_m(bfz, _Y))
    ExC = v4 * C_e - w4 * B_e
    if omega0 > 0:
        ExC = ExC + (-1.5 * omega0 * xpos) * C_e

    # Ey at (i-1/2, j, k-1/2)
    u4 = _corner_avg4(Q[IU], _X, _Z, xp)
    w4b = _corner_avg4(Q[IW], _X, _Z, xp)
    A_e = 0.5 * (bfx + xp.shift_m(bfx, _Z))
    C_e2 = 0.5 * (bfz + xp.shift_m(bfz, _X))
    EyC = w4b * A_e - u4 * C_e2

    # transverse TVD slopes of bfz (slope_mhd.h:598-704): consumed at z
    # (dCLx/dCLy) and at z+1 (dCRx/dCRy)
    s_bz_x = slope_1d(params, bfz, _X, xp=xp)
    s_bz_y = slope_1d(params, bfz, _Y, xp=xp)
    return ExC, EyC, s_bz_x, s_bz_y


def trace_mhd3d_local_precursors(params: RunParams, Q, bfx, bfy, xp=None):
    """z-local trace precursors (consumed only at their own plane, but with
    z-stencil reach z-1..z+1): the z slopes of Q, bfx, bfy."""
    if xp is None:
        from .backend import JNP as xp
    s_qz = slope_1d(params, Q, _Z, xp=xp)
    s_bx_z = slope_1d(params, bfx, _Z, xp=xp)
    s_by_z = slope_1d(params, bfy, _Z, xp=xp)
    return s_qz, s_bx_z, s_by_z


def trace_unsplit_mhd_3d_parts(
    params: RunParams,
    Q: jnp.ndarray,
    bfx: jnp.ndarray,
    bfy: jnp.ndarray,
    bfz: jnp.ndarray,
    dt,
    xpos: jnp.ndarray,
    xp=None,
    merged=False,
):
    """Shared half-step core returning LAZY builders for the 15 face/edge
    state stacks. Consuming one stack at a time keeps peak VMEM liveness low
    inside the fused Pallas kernel — Mosaic allocates roughly in trace
    order, and materializing all 15 stacks at once (each a full window
    [8, wz, wy, wx]) is what capped the tile size at (8, 32).

    Composition of the precursor stages + the in-plane state assembly; the
    z-streaming kernel calls the stages per plane with ring-carried
    precursors instead."""
    if xp is None:
        from .backend import JNP as xp
    shared = trace_mhd3d_shared_precursors(params, Q, bfx, bfy, bfz, xpos, xp=xp)
    shared_p = tuple(xp.shift_p(f, _Z) for f in shared)
    local = trace_mhd3d_local_precursors(params, Q, bfx, bfy, xp=xp)
    return trace_mhd3d_state_parts(
        params, Q, bfx, bfy, bfz, xp.shift_p(bfz, _Z),
        shared, shared_p, local, dt, xpos, xp=xp, merged=merged,
    )


def trace_mhd3d_state_parts(
    params: RunParams,
    Q,
    bfx,
    bfy,
    bfz,
    bfz_p,
    shared,
    shared_p,
    local,
    dt,
    xpos,
    xp=None,
    merged=False,
):
    """In-plane half-step state assembly: everything downstream of the
    precursors touches only x/y neighbours of the current z plane.
    ``bfz_p`` is bfz at z+1; ``shared``/``shared_p`` are
    trace_mhd3d_shared_precursors at z and z+1; ``local`` is
    trace_mhd3d_local_precursors at z. ``merged`` assembles all 18
    state stacks as one concatenate that the builders slice (see
    RunParams.trace_merged)."""
    if xp is None:
        from .backend import JNP as xp
    smallr, smallp, gamma = params.smallr, params.smallp, params.gamma0
    omega0 = params.omega0
    dtdx, dtdy, dtdz = dt / params.dx, dt / params.dy, dt / params.dz

    ExC, EyC, s_bz_x, s_bz_y = shared
    ExC_p, EyC_p, s_bz_x_p, s_bz_y_p = shared_p
    s_qz, s_bx_z, s_by_z = local

    # Ez at (i-1/2, j-1/2, k) — purely in-plane (trace_mhd.h:906-940)
    u4c = _corner_avg4(Q[IU], _X, _Y, xp)
    v4c = _corner_avg4(Q[IV], _X, _Y, xp)
    A_e2 = 0.5 * (bfx + xp.shift_m(bfx, _Y))
    B_e2 = 0.5 * (bfy + xp.shift_m(bfy, _X))
    EzC = u4c * B_e2 - v4c * A_e2
    if omega0 > 0:
        EzC = EzC - (-1.5 * omega0 * (xpos - params.dx / 2)) * A_e2

    # the 2x2 stencils around the current cell (E**: L=this, R=next)
    ELL, ELR = ExC, ExC_p
    ERL, ERR = xp.shift_p(ExC, _Y), xp.shift_p(ExC_p, _Y)
    FLL, FLR = EyC, EyC_p
    FRL, FRR = xp.shift_p(EyC, _X), xp.shift_p(EyC_p, _X)
    GLL, GLR = EzC, xp.shift_p(EzC, _Y)
    GRL, GRR = xp.shift_p(EzC, _X), xp.shift_p(xp.shift_p(EzC, _X), _Y)

    # ---- cell-centered values, face values, half-slopes ----
    r, p = Q[ID], Q[IP]
    u, v, w = Q[IU], Q[IV], Q[IW]
    A, B, C = Q[IA], Q[IB], Q[IC]

    AL, AR = bfx, xp.shift_p(bfx, _X)
    BL, BR = bfy, xp.shift_p(bfy, _Y)
    CL, CR = bfz, bfz_p

    hx = 0.5 * slope_1d(params, Q, _X, xp=xp)
    hy = 0.5 * slope_1d(params, Q, _Y, xp=xp)
    hz = 0.5 * s_qz
    drx, dpx, dux, dvx, dwx = hx[ID], hx[IP], hx[IU], hx[IV], hx[IW]
    dBx, dCx = hx[IB], hx[IC]
    dry, dpy, duy, dvy, dwy = hy[ID], hy[IP], hy[IU], hy[IV], hy[IW]
    dAy, dCy = hy[IA], hy[IC]
    drz, dpz, duz, dvz, dwz = hz[ID], hz[IP], hz[IU], hz[IV], hz[IW]
    dAz, dBz = hz[IA], hz[IB]

    # transverse TVD slopes of the face-centered fields (slope_mhd.h:598-704)
    # (the in-plane ones computed here; the z-reaching ones arrive as
    # precursors: s_bx_z/s_by_z local, s_bz_x/s_bz_y shared + shared_p)
    s_bx_y = slope_1d(params, bfx, _Y, xp=xp)
    s_by_x = slope_1d(params, bfy, _X, xp=xp)

    dALy, dALz = 0.5 * s_bx_y, 0.5 * s_bx_z
    dARy, dARz = 0.5 * xp.shift_p(s_bx_y, _X), 0.5 * xp.shift_p(s_bx_z, _X)
    dBLx, dBLz = 0.5 * s_by_x, 0.5 * s_by_z
    dBRx, dBRz = 0.5 * xp.shift_p(s_by_x, _Y), 0.5 * xp.shift_p(s_by_z, _Y)
    dCLx, dCLy = 0.5 * s_bz_x, 0.5 * s_bz_y
    dCRx, dCRy = 0.5 * s_bz_x_p, 0.5 * s_bz_y_p

    dAx = 0.5 * (AR - AL)
    dBy = 0.5 * (BR - BL)
    dCz = 0.5 * (CR - CL)

    # ---- source terms (trace_mhd.h:1127-1155; the nine /r share one
    # hoisted reciprocal — ULP-level rounding differences only) ----
    inv_r = 1.0 / r
    sr0 = (-u * drx - dux * r) * dtdx + (-v * dry - dvy * r) * dtdy + (-w * drz - dwz * r) * dtdz
    su0 = (
        (-u * dux - (dpx + B * dBx + C * dCx) * inv_r) * dtdx
        + (-v * duy + B * dAy * inv_r) * dtdy
        + (-w * duz + C * dAz * inv_r) * dtdz
    )
    sv0 = (
        (-u * dvx + A * dBx * inv_r) * dtdx
        + (-v * dvy - (dpy + A * dAy + C * dCy) * inv_r) * dtdy
        + (-w * dvz + C * dBz * inv_r) * dtdz
    )
    sw0 = (
        (-u * dwx + A * dCx * inv_r) * dtdx
        + (-v * dwy + B * dCy * inv_r) * dtdy
        + (-w * dwz - (dpz + A * dAz + B * dBz) * inv_r) * dtdz
    )
    sp0 = (
        (-u * dpx - dux * gamma * p) * dtdx
        + (-v * dpy - dvy * gamma * p) * dtdy
        + (-w * dpz - dwz * gamma * p) * dtdz
    )
    sA0 = (u * dBy + B * duy - v * dAy - A * dvy) * dtdy + (
        u * dCz + C * duz - w * dAz - A * dwz
    ) * dtdz
    sB0 = (v * dAx + A * dvx - u * dBx - B * dux) * dtdx + (
        v * dCz + C * dvz - w * dBz - B * dwz
    ) * dtdz
    sC0 = (w * dAx + A * dwx - u * dCx - C * dux) * dtdx + (
        w * dBy + B * dwy - v * dCy - C * dvy
    ) * dtdy

    if omega0 > 0:
        shear = -1.5 * omega0 * xpos
        sr0 = sr0 - shear * dry * dtdy
        su0 = su0 - shear * duy * dtdy
        sv0 = sv0 - shear * dvy * dtdy
        sw0 = sw0 - shear * dwy * dtdy
        sp0 = sp0 - shear * dpy * dtdy
        sA0 = sA0 - shear * dAy * dtdy
        sB0 = sB0 + (shear * dAx - 1.5 * omega0 * A * params.dx) * dtdx + shear * dBz * dtdz
        sC0 = sC0 - shear * dCy * dtdy

    # face-centered field half-step (induction; trace_mhd.h:1152-1158)
    sAL0 = +(GLR - GLL) * dtdy * 0.5 - (FLR - FLL) * dtdz * 0.5
    sAR0 = +(GRR - GRL) * dtdy * 0.5 - (FRR - FRL) * dtdz * 0.5
    sBL0 = -(GRL - GLL) * dtdx * 0.5 + (ELR - ELL) * dtdz * 0.5
    sBR0 = -(GRR - GLR) * dtdx * 0.5 + (ERR - ERL) * dtdz * 0.5
    sCL0 = +(FRL - FLL) * dtdx * 0.5 - (ERL - ELL) * dtdy * 0.5
    sCR0 = +(FRR - FLR) * dtdx * 0.5 - (ERR - ELR) * dtdy * 0.5

    r2, u2, v2, w2, p2 = r + sr0, u + su0, v + sv0, w + sw0, p + sp0
    A2, B2, C2 = A + sA0, B + sB0, C + sC0
    AL2, AR2 = AL + sAL0, AR + sAR0
    BL2, BR2 = BL + sBL0, BR + sBR0
    CL2, CR2 = CL + sCL0, CR + sCR0

    if merged:
        (r2, u2, v2, w2, p2, A2, B2, C2, AL2, AR2, BL2, BR2, CL2, CR2,
         drx, dpx, dux, dvx, dwx, dBx, dCx,
         dry, dpy, duy, dvy, dwy, dAy, dCy,
         drz, dpz, duz, dvz, dwz, dAz, dBz,
         dALy, dALz, dARy, dARz, dBLx, dBLz, dBRx, dBRz,
         dCLx, dCLy, dCRx, dCRy) = [
            xp.pin(f) for f in (
                r2, u2, v2, w2, p2, A2, B2, C2, AL2, AR2, BL2, BR2,
                CL2, CR2,
                drx, dpx, dux, dvx, dwx, dBx, dCx,
                dry, dpy, duy, dvy, dwy, dAy, dCy,
                drz, dpz, duz, dvz, dwz, dAz, dBz,
                dALy, dALz, dARy, dARz, dBLx, dBLz, dBRx, dBRz,
                dCLx, dCLy, dCRx, dCRy,
            )
        ]

    def chans(rho, pres, uu, vv, ww, a_, b_, c_):
        rho = xp.maximum(smallr, rho)
        # note: the reference's 3D trace clamps pressure with smallp alone
        # (not smallp*rho), trace_mhd.h:1190 — matched here
        pres = xp.maximum(smallp, pres)
        return (rho, pres, uu, vv, ww, a_, b_, c_)

    # lazy channel-tuple builders — each call assembles one state's 8
    # channels (stacking happens below, per the ``merged`` mode)
    builders = {
        # ---- face states ----
        "qp_x": lambda: chans(r2 - drx, p2 - dpx, u2 - dux, v2 - dvx, w2 - dwx, AL2, B2 - dBx, C2 - dCx),
        "qm_x": lambda: chans(r2 + drx, p2 + dpx, u2 + dux, v2 + dvx, w2 + dwx, AR2, B2 + dBx, C2 + dCx),
        "qp_y": lambda: chans(r2 - dry, p2 - dpy, u2 - duy, v2 - dvy, w2 - dwy, A2 - dAy, BL2, C2 - dCy),
        "qm_y": lambda: chans(r2 + dry, p2 + dpy, u2 + duy, v2 + dvy, w2 + dwy, A2 + dAy, BR2, C2 + dCy),
        "qp_z": lambda: chans(r2 - drz, p2 - dpz, u2 - duz, v2 - dvz, w2 - dwz, A2 - dAz, B2 - dBz, CL2),
        "qm_z": lambda: chans(r2 + drz, p2 + dpz, u2 + duz, v2 + dvz, w2 + dwz, A2 + dAz, B2 + dBz, CR2),
        # ---- edge (corner) states, X family: varies in (y, z) ----
        "qRT_x": lambda: chans(r2 + dry + drz, p2 + dpy + dpz, u2 + duy + duz, v2 + dvy + dvz,
                               w2 + dwy + dwz, A2 + dAy + dAz, BR2 + dBRz, CR2 + dCRy),
        "qRB_x": lambda: chans(r2 + dry - drz, p2 + dpy - dpz, u2 + duy - duz, v2 + dvy - dvz,
                               w2 + dwy - dwz, A2 + dAy - dAz, BR2 - dBRz, CL2 + dCLy),
        "qLT_x": lambda: chans(r2 - dry + drz, p2 - dpy + dpz, u2 - duy + duz, v2 - dvy + dvz,
                               w2 - dwy + dwz, A2 - dAy + dAz, BL2 + dBLz, CR2 - dCRy),
        "qLB_x": lambda: chans(r2 - dry - drz, p2 - dpy - dpz, u2 - duy - duz, v2 - dvy - dvz,
                               w2 - dwy - dwz, A2 - dAy - dAz, BL2 - dBLz, CL2 - dCLy),
        # ---- Y family: varies in (x, z) ----
        "qRT_y": lambda: chans(r2 + drx + drz, p2 + dpx + dpz, u2 + dux + duz, v2 + dvx + dvz,
                               w2 + dwx + dwz, AR2 + dARz, B2 + dBx + dBz, CR2 + dCRx),
        "qRB_y": lambda: chans(r2 + drx - drz, p2 + dpx - dpz, u2 + dux - duz, v2 + dvx - dvz,
                               w2 + dwx - dwz, AR2 - dARz, B2 + dBx - dBz, CL2 + dCLx),
        "qLT_y": lambda: chans(r2 - drx + drz, p2 - dpx + dpz, u2 - dux + duz, v2 - dvx + dvz,
                               w2 - dwx + dwz, AL2 + dALz, B2 - dBx + dBz, CR2 - dCRx),
        "qLB_y": lambda: chans(r2 - drx - drz, p2 - dpx - dpz, u2 - dux - duz, v2 - dvx - dvz,
                               w2 - dwx - dwz, AL2 - dALz, B2 - dBx - dBz, CL2 - dCLx),
        # ---- Z family: varies in (x, y) ----
        "qRT_z": lambda: chans(r2 + drx + dry, p2 + dpx + dpy, u2 + dux + duy, v2 + dvx + dvy,
                               w2 + dwx + dwy, AR2 + dARy, BR2 + dBRx, C2 + dCx + dCy),
        "qRB_z": lambda: chans(r2 + drx - dry, p2 + dpx - dpy, u2 + dux - duy, v2 + dvx - dvy,
                               w2 + dwx - dwy, AR2 - dARy, BL2 + dBLx, C2 + dCx - dCy),
        "qLT_z": lambda: chans(r2 - drx + dry, p2 - dpx + dpy, u2 - dux + duy, v2 - dvx + dvy,
                               w2 - dwx + dwy, AL2 + dALy, BR2 - dBRx, C2 - dCx + dCy),
        "qLB_z": lambda: chans(r2 - drx - dry, p2 - dpx - dpy, u2 - dux - duy, v2 - dvx - dvy,
                               w2 - dwx - dwy, AL2 - dALy, BL2 - dBLx, C2 - dCx - dCy),
    }

    # one [8, ...] stack per state; each stack is its own fusion root,
    # into which the compiler DUPLICATES the shared half-step chain
    # above (18x on the XLA cost model: 12.2k counted flops/cell vs
    # ~2.5k computed once — scripts/trace_dup_probe.py). ``merged``
    # pins every shared field with an optimization barrier first, so
    # the chain is materialized once and the stacks only add slopes.
    # (A single 144-channel concatenate was tried instead and rejected:
    # the stacks' boxes differ by +-1 row/plane per consumption shift,
    # and the global meet loses extent some flux/EMF consumers need.)
    return {
        k: (lambda f=v: xp.stack(list(f()))) for k, v in builders.items()
    }


def trace_unsplit_mhd_3d(
    params: RunParams,
    Q: jnp.ndarray,
    bfx: jnp.ndarray,
    bfy: jnp.ndarray,
    bfz: jnp.ndarray,
    dt,
    xpos: jnp.ndarray,
    xp=None,
):
    """Materialized form: all face/edge stacks at once (XLA whole-array
    path; XLA's scheduler handles liveness there)."""
    P = trace_unsplit_mhd_3d_parts(params, Q, bfx, bfy, bfz, dt, xpos, xp=xp)
    qm = (P["qm_x"](), P["qm_y"](), P["qm_z"]())
    qp = (P["qp_x"](), P["qp_y"](), P["qp_z"]())
    qedge_z = (P["qRT_z"](), P["qRB_z"](), P["qLT_z"](), P["qLB_z"]())
    qedge_y = (P["qRT_y"](), P["qRB_y"](), P["qLT_y"](), P["qLB_y"]())
    qedge_x = (P["qRT_x"](), P["qRB_x"](), P["qLT_x"](), P["qLB_x"]())
    return qm, qp, qedge_z, qedge_y, qedge_x
