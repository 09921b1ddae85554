"""Lax-Liu positive scheme (2D).

Re-design of the reference's implementation
(reference: src/hydro/positiveScheme.h:36-260 limiter/eigs/
central_diff_flux/diffusive_flux, HydroRunLaxLiu.cpp:112-230 laxliu_evolve,
:326 oneStepIntegration; Lax & Liu, SIAM J. Sci. Comput. 19, p.319):
central flux plus a Roe-eigenbasis limited diffusive flux, two half-sweeps
averaged per step, fixed dt = XLAMBDA*dx.

Internal component order follows the paper/reference kernel: (rho, mx, my, E)
— note this differs from the framework's conservative layout; conversion
happens at the step boundary.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV
from ..ops.stencil import shift_m, shift_p
from .boundary import make_boundaries

_X, _Y = -1, -2


def _to_ll(U):
    """(rho, E, mx, my) -> (rho, mx, my, E)."""
    return jnp.stack([U[ID], U[IU], U[IV], U[IP]])


def _from_ll(V):
    return jnp.stack([V[0], V[3], V[1], V[2]])


def _limiter(dw, dwup, k_is_acoustic):
    """The positive-scheme limiter pair (positiveScheme.h:36-72).
    Returns (phi0, phi1); for acoustic characteristics phi0 is replaced by
    the van-Leer form."""
    same_sign = dw * dwup > 0.0
    theta = jnp.where(same_sign, dwup / jnp.where(dw == 0, 1.0, dw), 0.0)

    phi0 = jnp.where(
        same_sign,
        jnp.where(
            theta <= 0.5,
            2.0 * theta,
            jnp.where(theta <= 1.0, 1.0, jnp.where(theta <= 2.0, theta, 2.0)),
        ),
        0.0,
    )
    phi0 = jnp.where((dw == 0.0) & (dwup > 0.0), 2.0, phi0)

    phi_vl = jnp.where(same_sign, 2.0 * theta / (1.0 + theta), 0.0)
    phi_vl = jnp.where((dw == 0.0) & (dwup > 0.0), 2.0, phi_vl)

    phi1 = jnp.where(same_sign, jnp.minimum(theta, 1.0), 0.0)
    phi1 = jnp.where((dw == 0.0) & (dwup > 0.0), 1.0, phi1)

    if k_is_acoustic:
        phi0 = phi_vl
    return phi0, phi1


def _eigs(params: RunParams, up, um):
    """Roe-average eigensystem (positiveScheme.h:86-170). States in
    (rho, mx, my, E) order. Returns right eigvecs r[4][4], left ri[4][4],
    eigenvalues eig[4] — each entry a broadcast array."""
    gamma = params.gamma0
    r1 = jnp.maximum(um[0], params.smallr)
    u1, v1 = um[1] / r1, um[2] / r1
    ek1 = 0.5 * (u1 * u1 + v1 * v1)
    H1 = (um[3] + (gamma - 1.0) * (um[3] - ek1 * r1)) / r1
    r2 = jnp.maximum(up[0], params.smallr)
    u2, v2 = up[1] / r2, up[2] / r2
    ek2 = 0.5 * (u2 * u2 + v2 * v2)
    H2 = (up[3] + (gamma - 1.0) * (up[3] - ek2 * r2)) / r2
    w1 = jnp.sqrt(r1) + jnp.sqrt(r2)
    u = (jnp.sqrt(r1) * u1 + jnp.sqrt(r2) * u2) / w1
    v = (jnp.sqrt(r1) * v1 + jnp.sqrt(r2) * v2) / w1
    H = (jnp.sqrt(r1) * H1 + jnp.sqrt(r2) * H2) / w1
    q2 = u * u + v * v
    c2 = (gamma - 1.0) * (H - 0.5 * q2)
    c = jnp.where(c2 < 0, params.smallc, jnp.sqrt(jnp.maximum(c2, 0.0)))

    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    r = [
        [one, zero, one, one],
        [u - c, zero, u, u + c],
        [v, one, v, v],
        [H - u * c, v, 0.5 * q2, H + u * c],
    ]
    b1 = jnp.maximum(1.0 / jnp.maximum(H - 0.5 * q2, 1e-30), 1e-10)
    b2 = 0.5 * q2 * b1
    ri = [
        [0.5 * (b2 + u / c), -0.5 / c - 0.5 * b1 * u, -0.5 * b1 * v, 0.5 * b1],
        [-v, zero, one, zero],
        [1.0 - b2, b1 * u, b1 * v, -b1],
        [0.5 * (b2 - u / c), 0.5 / c - 0.5 * b1 * u, -0.5 * b1 * v, 0.5 * b1],
    ]
    eig = [u - c, u, u, u + c]
    return r, ri, eig


def _central_flux(params: RunParams, up, um):
    gamma = params.gamma0
    rl = jnp.maximum(um[0], params.smallr)
    rr = jnp.maximum(up[0], params.smallr)
    pl = (gamma - 1.0) * (um[3] - 0.5 * (um[1] ** 2 + um[2] ** 2) / rl)
    pr = (gamma - 1.0) * (up[3] - 0.5 * (up[1] ** 2 + up[2] ** 2) / rr)
    return jnp.stack([
        0.5 * (um[1] + up[1]),
        0.5 * (um[1] ** 2 / rl + pl + up[1] ** 2 / rr + pr),
        0.5 * (um[1] * um[2] / rl + up[1] * up[2] / rr),
        0.5 * ((um[3] + pl) * um[1] / rl + (up[3] + pr) * up[1] / rr),
    ])


def _diffusive_flux(params: RunParams, up, um, du, dup, dum):
    r, ri, eig = _eigs(params, up, um)
    mu = jnp.maximum(jnp.abs(eig[0]), jnp.abs(eig[3]))
    alpha, beta = params.alpha_ll, params.beta_ll

    dwf = []
    for k in range(4):
        dw_k = sum(ri[k][m] * du[m] for m in range(4))
        dw_up = sum(ri[k][m] * dup[m] for m in range(4))
        dw_dn = sum(ri[k][m] * dum[m] for m in range(4))
        dwup = jnp.where(eig[k] >= 0.0, dw_dn, dw_up)
        phi0, phi1 = _limiter(dw_k, dwup, k_is_acoustic=(k in (0, 3)))
        dwf.append(
            -0.5 * (alpha * (1.0 - phi0) * jnp.abs(eig[k]) + beta * (1.0 - phi1) * mu)
            * dw_k
        )
    return jnp.stack([sum(r[k][m] * dwf[m] for m in range(4)) for k in range(4)])


def _interface_flux(params: RunParams, V, axis, swap_xy):
    """Flux F(i) at interface (i, i+1) along ``axis``; component order
    (rho, m_norm, m_tran, E) via optional swap."""
    if swap_xy:
        V = jnp.stack([V[0], V[2], V[1], V[3]])
    um = V
    up = shift_p(V, axis)
    du = up - um
    dum = um - shift_m(V, axis)
    dup = shift_p(up, axis) - up
    fc = _central_flux(params, up, um)
    df = _diffusive_flux(params, up, um, du, dup, dum)
    F = fc + df
    if swap_xy:
        F = jnp.stack([F[0], F[2], F[1], F[3]])
    return F


def laxliu_evolve(params: RunParams, U):
    """One Lax-Liu half-step (HydroRunLaxLiu.cpp:112-230): x-flux difference
    then y-flux difference, both from the pre-sweep state."""
    g = params.ghost_width
    U = make_boundaries(params, U)
    V = _to_ll(U)

    Fx = _interface_flux(params, V, _X, swap_xy=False)
    Fy = _interface_flux(params, V, _Y, swap_xy=True)

    V_new = (
        V
        - params.xlambda * (Fx - shift_m(Fx, _X))
        - params.ylambda * (Fy - shift_m(Fy, _Y))
    )
    # positivity clamp on density/energy (HydroRunLaxLiu.cpp:198-205)
    V_new = V_new.at[0].set(jnp.maximum(V_new[0], params.smallr))
    V_new = V_new.at[3].set(jnp.maximum(V_new[3], params.smallr))

    interior = (slice(None), slice(g, -g), slice(g, -g))
    return U.at[interior].set(_from_ll(V_new)[interior])


def laxliu_step(params: RunParams, U):
    """Two half-sweeps averaged with the initial state
    (HydroRunLaxLiu.cpp oneStepIntegration + averageArray)."""
    U1 = laxliu_evolve(params, U)
    U2 = laxliu_evolve(params, U1)
    return 0.5 * (U + U2)
