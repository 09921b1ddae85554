"""MUSCL-Hancock trace (half-step predictor) for the unsplit hydro scheme.

Whole-array JAX re-design of the reference's per-cell trace routines
(reference: src/hydro/trace.h:332-661, trace_unsplit_hydro_2d/3d — the
unsplitVersion=1 path). The cell state is advanced a half step in time using
cell-centered slopes including transverse derivative source terms, then
reconstructed to each face with the half-slope.

Returns per-direction face states:
  qm[d]: left state at the *right* face of the cell along direction d
  qp[d]: right state at the *left* face of the cell along direction d
so the Riemann problem at face i-1/2 along x is (qm_x[i-1], qp_x[i]).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW


def trace_unsplit_hydro(
    params: RunParams,
    Q: jnp.ndarray,
    dq: tuple[jnp.ndarray, ...],
    dt,
    xp=None,
):
    """Compute qm/qp face states for every direction.

    Args:
      Q: primitive state [nvar, (z,) y, x].
      dq: per-direction limited slopes (dqX, dqY[, dqZ]), same shape as Q.
      dt: time step (traced scalar).

    Returns:
      (qm, qp): tuples of arrays, one per direction, each [nvar, ...].
    """
    if xp is None:
        from .backend import JNP as xp
    smallr, smallp, gamma = params.smallr, params.smallp, params.gamma0
    dtdx = dt / params.dx
    dtdy = dt / params.dy

    r, p = Q[ID], Q[IP]
    u, v = Q[IU], Q[IV]

    # half-slopes (trace.h:352-362)
    hx = 0.5 * dq[0]
    hy = 0.5 * dq[1]
    drx, dpx, dux, dvx = hx[ID], hx[IP], hx[IU], hx[IV]
    dry, dpy, duy, dvy = hy[ID], hy[IP], hy[IU], hy[IV]

    inv_r = 1.0 / r
    if params.dim == 2:
        # source terms incl. transverse derivatives (trace.h:365-372)
        sr0 = (-u * drx - dux * r) * dtdx + (-v * dry - dvy * r) * dtdy
        su0 = (-u * dux - dpx * inv_r) * dtdx + (-v * duy) * dtdy
        sv0 = (-u * dvx) * dtdx + (-v * dvy - dpy * inv_r) * dtdy
        sp0 = (-u * dpx - dux * gamma * p) * dtdx + (-v * dpy - dvy * gamma * p) * dtdy

        r2, u2, v2, p2 = r + sr0, u + su0, v + sv0, p + sp0

        def face(dr, dp, du, dv, sign):
            rho_f = xp.maximum(smallr, r2 + sign * dr)
            p_f = xp.maximum(smallp * rho_f, p2 + sign * dp)
            return xp.stack([rho_f, p_f, u2 + sign * du, v2 + sign * dv])

        qp_x = face(drx, dpx, dux, dvx, -1.0)
        qm_x = face(drx, dpx, dux, dvx, +1.0)
        qp_y = face(dry, dpy, duy, dvy, -1.0)
        qm_y = face(dry, dpy, duy, dvy, +1.0)
        return (qm_x, qm_y), (qp_x, qp_y)

    # --- 3D (trace.h:544-661) ---
    dtdz = dt / params.dz
    w = Q[IW]
    hz = 0.5 * dq[2]
    dwx = hx[IW]
    dwy = hy[IW]
    drz, dpz, duz, dvz, dwz = hz[ID], hz[IP], hz[IU], hz[IV], hz[IW]

    sr0 = (-u * drx - dux * r) * dtdx + (-v * dry - dvy * r) * dtdy + (-w * drz - dwz * r) * dtdz
    su0 = (-u * dux - dpx * inv_r) * dtdx + (-v * duy) * dtdy + (-w * duz) * dtdz
    sv0 = (-u * dvx) * dtdx + (-v * dvy - dpy * inv_r) * dtdy + (-w * dvz) * dtdz
    sw0 = (-u * dwx) * dtdx + (-v * dwy) * dtdy + (-w * dwz - dpz * inv_r) * dtdz
    sp0 = (
        (-u * dpx - dux * gamma * p) * dtdx
        + (-v * dpy - dvy * gamma * p) * dtdy
        + (-w * dpz - dwz * gamma * p) * dtdz
    )

    r2, u2, v2, w2, p2 = r + sr0, u + su0, v + sv0, w + sw0, p + sp0

    def face3(dr, dp, du, dv, dw, sign):
        rho_f = xp.maximum(smallr, r2 + sign * dr)
        p_f = xp.maximum(smallp * rho_f, p2 + sign * dp)
        return xp.stack(
            [rho_f, p_f, u2 + sign * du, v2 + sign * dv, w2 + sign * dw]
        )

    qp_x = face3(drx, dpx, dux, dvx, dwx, -1.0)
    qm_x = face3(drx, dpx, dux, dvx, dwx, +1.0)
    qp_y = face3(dry, dpy, duy, dvy, dwy, -1.0)
    qm_y = face3(dry, dpy, duy, dvy, dwy, +1.0)
    qp_z = face3(drz, dpz, duz, dvz, dwz, -1.0)
    qm_z = face3(drz, dpz, duz, dvz, dwz, +1.0)
    return (qm_x, qm_y, qm_z), (qp_x, qp_y, qp_z)
