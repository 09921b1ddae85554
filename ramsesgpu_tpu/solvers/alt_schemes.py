"""Alternative 2D/3D schemes: directional-split Godunov, Kurganov-Tadmor,
relaxing TVD.

Re-designs of the reference's legacy scheme zoo:
- split Godunov: reference src/hydro/godunov.cuh + trace.h:32-129 (the
  RAMSES directionally-split MUSCL-Hancock with characteristic tracing),
  sweep order permuted by step parity (HydroRunGodunov.cpp:321-360)
- Kurganov-Tadmor: reference src/hydro/HydroRunKT.cpp (staggered central
  scheme, FD2, odd/even grids), 2D only
- relaxing TVD: reference src/hydro/relaxingTVD.h + HydroRunRelaxingTVD.cpp
  (Jin-Xin relaxation with van Leer flux limiting), needs ghostWidth=3

All whole-array jnp; the Lax-Liu positive scheme is provided in
alt_laxliu.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW, Scheme
from ..ops.eos import constoprim_hydro
from ..ops.riemann import riemann_hydro
from ..ops.slopes import slope_1d
from ..ops.stencil import shift_m, shift_p
from .boundary import make_boundaries
from .godunov import _rotation

_AXIS = {0: -1, 1: -2, 2: -3}


# --------------------------------------------------------------------------- #
# directional-split Godunov
# --------------------------------------------------------------------------- #
def _trace_split(params: RunParams, Q, c, dtdx, axis):
    """Characteristic trace along one direction (trace.h:32-129).

    Q must already be component-rotated so IU is the sweep-normal velocity.
    Returns (qxm, qxp): left/right edge states of each cell.
    """
    dq = slope_1d(params, Q, axis) if params.iorder != 1 else jnp.zeros_like(Q)

    if params.scheme == Scheme.MUSCL:
        zerol = -100.0 / dtdx
        zeror = 100.0 / dtdx
        project = 1.0
    elif params.scheme == Scheme.PLMDE:
        zerol = zeror = 0.0
        project = 1.0
    else:  # Collela
        zerol = zeror = 0.0
        project = 0.0

    cc = c
    csq = cc * cc
    r, p, u, v = Q[ID], Q[IP], Q[IU], Q[IV]
    dr, dp, du, dv = dq[ID], dq[IP], dq[IU], dq[IV]

    alpham = 0.5 * (dp / (r * cc) - du) * r / cc
    alphap = 0.5 * (dp / (r * cc) + du) * r / cc
    alpha0r = dr - dp / csq
    alpha0v = dv

    def right_state():
        spminus = jnp.where((u - cc) < zeror, (u - cc) * dtdx + 1.0, project)
        spplus = jnp.where((u + cc) < zeror, (u + cc) * dtdx + 1.0, project)
        spzero = jnp.where(u < zeror, u * dtdx + 1.0, project)
        ap = -0.5 * spplus * alphap
        am = -0.5 * spminus * alpham
        azr = -0.5 * spzero * alpha0r
        azv = -0.5 * spzero * alpha0v
        out = [r + ap + am + azr, p + (ap + am) * csq, u + (ap - am) * cc / r,
               v + azv]
        if params.dim == 3:
            out.append(Q[IW] - 0.5 * spzero * dq[IW])
        return jnp.stack(out)

    def left_state():
        spminus = jnp.where((u - cc) > zerol, (u - cc) * dtdx - 1.0, -project)
        spplus = jnp.where((u + cc) > zerol, (u + cc) * dtdx - 1.0, -project)
        spzero = jnp.where(u > zerol, u * dtdx - 1.0, -project)
        ap = -0.5 * spplus * alphap
        am = -0.5 * spminus * alpham
        azr = -0.5 * spzero * alpha0r
        azv = -0.5 * spzero * alpha0v
        out = [r + ap + am + azr, p + (ap + am) * csq, u + (ap - am) * cc / r,
               v + azv]
        if params.dim == 3:
            out.append(Q[IW] - 0.5 * spzero * dq[IW])
        return jnp.stack(out)

    return left_state(), right_state()


def _split_sweep(params: RunParams, U, dt, direction):
    """One 1D Godunov sweep along ``direction`` (godunov.cuh semantics)."""
    axis = _AXIS[direction]
    dh = [params.dx, params.dy, params.dz][direction]
    dtdx = dt / dh
    g = params.ghost_width

    U = make_boundaries(params, U)
    Q, c = constoprim_hydro(params, U)
    perm = tuple(_rotation(params, direction))
    Q_rot = Q[perm, ...]

    qxm, qxp = _trace_split(params, Q_rot, c, dtdx, axis)
    flux_rot = riemann_hydro(params, shift_m(qxm, axis), qxp)
    flux = flux_rot[perm, ...]

    interior = (slice(None),) + (slice(g, -g),) * params.dim
    dU = dtdx * (flux - shift_p(flux, axis))[interior]
    return U.at[interior].add(dU)


_SWEEP_ORDERS_2D = [(0, 1), (1, 0)]
_SWEEP_ORDERS_3D = [
    (0, 1, 2), (1, 2, 0), (2, 1, 0), (0, 1, 2), (1, 2, 0), (2, 0, 1),
]


def godunov_split_step(params: RunParams, U, dt, n_step):
    """Directionally split update with the reference's parity-permuted sweep
    order (HydroRunGodunov.cpp:321-360). n_step must be static."""
    if params.dim == 2:
        order = _SWEEP_ORDERS_2D[n_step % 2]
    else:
        order = _SWEEP_ORDERS_3D[n_step % 6]
    for d in order:
        U = _split_sweep(params, U, dt, d)
    return U


# --------------------------------------------------------------------------- #
# Kurganov-Tadmor central scheme (2D)
# --------------------------------------------------------------------------- #
def _minmod3(a, b, c):
    def mm(x, y):
        return jnp.where(x * y <= 0, 0.0, jnp.where(jnp.abs(x) < jnp.abs(y), x, y))

    return mm(a, mm(b, c))


def _kt_flux(params: RunParams, U):
    """Cell-centered Euler fluxes along x and y (kurganov-tadmor.h get_flux)."""
    rho = U[ID]
    p = jnp.maximum(
        (params.gamma0 - 1.0) * (U[IP] - 0.5 * (U[IU] ** 2 + U[IV] ** 2) / rho),
        rho * params.smallp,
    )
    fx = jnp.stack([
        U[IU],
        (U[IP] + p) * (U[IU] / rho),
        U[IU] ** 2 / rho + p,
        U[IU] * U[IV] / rho,
    ])
    fy = jnp.stack([
        U[IV],
        (U[IP] + p) * (U[IV] / rho),
        U[IU] * U[IV] / rho,
        U[IV] ** 2 / rho + p,
    ])
    return fx, fy


def _kt_limited_derivative(a, axis, alpha):
    return _minmod3(
        alpha * (shift_p(a, axis) - a),
        0.5 * (shift_p(a, axis) - shift_m(a, axis)),
        alpha * (a - shift_m(a, axis)),
    )


def kt_step(params: RunParams, U, odd: bool, xlam: float, ylam: float):
    """One staggered KT step (HydroRunKT.cpp kt_evolve /
    reconstruction_2d_FD2 / predictor_corrector_2d_FD2). dt = xlam*dx.
    ``odd`` selects the staggering offset and must be static."""
    alpha = jnp.asarray(params.alpha_kt, U.dtype)  # in [1, 2]
    U = make_boundaries(params, U)

    up = _kt_limited_derivative(U, -1, alpha)  # Uprime: x-derivatives
    uq = _kt_limited_derivative(U, -2, alpha)  # Uqrime: y-derivatives

    if odd:
        # staggered average centered at (i+1/2, j+1/2)
        uhalf = 0.25 * (
            U + shift_p(U, -1) + shift_p(U, -2) + shift_p(shift_p(U, -1), -2)
            + 0.25 * (
                (up - shift_p(up, -1))
                + (shift_p(up, -2) - shift_p(shift_p(up, -1), -2))
                + (uq - shift_p(uq, -2))
                + (shift_p(uq, -1) - shift_p(shift_p(uq, -1), -2))
            )
        )
    else:
        uhalf = 0.25 * (
            shift_m(U, -2) + shift_m(shift_m(U, -1), -2) + U + shift_m(U, -1)
            + 0.25 * (
                (shift_m(shift_m(up, -1), -2) - shift_m(up, -2))
                + (shift_m(up, -1) - up)
                + (shift_m(shift_m(uq, -1), -2) - shift_m(uq, -1))
                + (shift_m(uq, -2) - uq)
            )
        )

    fx, fy = _kt_flux(params, U)
    fpr = _kt_limited_derivative(fx, -1, alpha)
    gqr = _kt_limited_derivative(fy, -2, alpha)

    # predictor
    ustar = U - 0.5 * (xlam * fpr + ylam * gqr)
    fsx, fsy = _kt_flux(params, ustar)

    if odd:
        unew = uhalf - 0.5 * (
            xlam * ((shift_p(fsx, -1) - fsx) + (shift_p(shift_p(fsx, -1), -2) - shift_p(fsx, -2)))
            + ylam * ((shift_p(fsy, -2) - fsy) + (shift_p(shift_p(fsy, -1), -2) - shift_p(fsy, -1)))
        )
    else:
        unew = uhalf - 0.5 * (
            xlam * ((shift_m(fsx, -2) - shift_m(shift_m(fsx, -1), -2)) + (fsx - shift_m(fsx, -1)))
            + ylam * ((shift_m(fsy, -1) - shift_m(shift_m(fsy, -1), -2)) + (fsy - shift_m(fsy, -2)))
        )

    g = params.ghost_width
    interior = (slice(None),) + (slice(g, -g),) * 2
    return U.at[interior].set(unew[interior])


# --------------------------------------------------------------------------- #
# relaxing TVD scheme (Jin-Xin relaxation, van Leer limiter)
# --------------------------------------------------------------------------- #
def _average_flux(params: RunParams, Ur):
    """Cell-centered flux and freezing speed; Ur is already in rotated
    component order (relaxingTVD.h averageFlux)."""
    rho = jnp.maximum(Ur[ID], 1e-9)
    v = Ur[IU] / rho
    ek = 0.5 * sum(Ur[c] ** 2 for c in range(2, Ur.shape[0])) / rho
    P = jnp.maximum(0.0, (params.gamma0 - 1.0) * (Ur[IP] - ek))
    c = jnp.abs(v) + jnp.maximum(jnp.sqrt(params.gamma0 * P / rho), 1e-5)
    w = [rho * v, (Ur[IP] + P) * v, Ur[IU] * v + P]
    for comp in range(3, Ur.shape[0]):
        w.append(Ur[comp] * v)
    w = jnp.stack(w)
    return w, c


def _vanleer(f, a, b):
    c = a * b
    return f + jnp.where(c > 0, 2 * c / jnp.where(a + b == 0, 1.0, a + b), 0.0)


def _relaxing_sweep(params: RunParams, U, dt, direction):
    """One relaxing-TVD sweep (HydroRunRelaxingTVD.cpp:219-380)."""
    axis = _AXIS[direction]
    dh = [params.dx, params.dy, params.dz][direction]
    dtdx = dt / dh
    g = params.ghost_width  # must be 3

    U = make_boundaries(params, U)
    perm = list(_rotation(params, direction))
    Ur0 = U[perm, ...]

    def fluxes(Ur):
        w, c = _average_flux(params, Ur)
        fr = (Ur * c + w) / 2          # right-movers at cell centers
        fl = shift_p((Ur * c - w) / 2, axis)  # fl(i) = left-mover of cell i+1
        return fr, fl

    # half step: first-order upwind
    fr, fl = fluxes(Ur0)
    fu = fr - fl
    u1 = Ur0 - (fu - shift_m(fu, axis)) * dtdx / 2

    # full step: second-order TVD on the half-step state
    fr, fl = fluxes(u1)

    # right-moving waves: van Leer limit fr
    # (dfl(i) = (fr(i)-fr(i-1))/2, dfr(i) = dfl(i+1))
    dfl_r = (fr - shift_m(fr, axis)) / 2
    dfr_r = shift_p(dfl_r, axis)
    fr = _vanleer(fr, dfl_r, dfr_r)

    # left-moving waves: van Leer limit fl
    # (dfl(i) = (fl(i-1)-fl(i))/2, dfr(i) = dfl(i+1))
    dfl_l = (shift_m(fl, axis) - fl) / 2
    dfr_l = shift_p(dfl_l, axis)
    fl = _vanleer(fl, dfl_l, dfr_l)

    fu = fr - fl
    dU_rot = -(fu - shift_m(fu, axis)) * dtdx
    dU = dU_rot[perm, ...]

    interior = (slice(None),) + (slice(g, -g),) * params.dim
    return U.at[interior].add(dU[interior])


def relaxing_tvd_step(params: RunParams, U, dt, n_step):
    """Parity-alternating sweeps, like the split scheme."""
    if params.dim == 2:
        order = _SWEEP_ORDERS_2D[n_step % 2]
    else:
        order = _SWEEP_ORDERS_3D[n_step % 6]
    for d in order:
        U = _relaxing_sweep(params, U, dt, d)
    return U
