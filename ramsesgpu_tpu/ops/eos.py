"""Equation of state and conservative -> primitive conversion.

Whole-array JAX re-design of the reference's per-cell routines
(reference: src/hydro/constoprim.h:28-199). Supports the calorically
perfect-gas EOS and the isothermal EOS (cIso > 0).

Conserved state U layout: [nvar, (z,) y, x] with components ID, IP(=E),
IU, IV(, IW)(, IA, IB, IC). Primitive state Q uses the same layout with
IP holding pressure.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from .stencil import shift_p


def eos(params: RunParams, rho: jnp.ndarray, eint: jnp.ndarray):
    """Pressure and sound speed from density and specific internal energy
    (constoprim.h:29-33)."""
    p = jnp.maximum((params.gamma0 - 1.0) * rho * eint, rho * params.smallp)
    c = jnp.sqrt(params.gamma0 * p / rho)
    return p, c


def constoprim_hydro(params: RunParams, U, xp=None):
    """Hydro conservative -> primitive over the whole array.

    Returns (Q, c): primitive array with the same shape as U, and the local
    sound speed array (constoprim.h:43-111).
    """
    if xp is None:
        from .backend import JNP as xp
    rho = xp.maximum(U[ID], params.smallr)
    inv_rho = 1.0 / rho
    velocities = [U[IU] * inv_rho, U[IV] * inv_rho]
    if params.dim == 3:
        velocities.append(U[IW] * inv_rho)

    eken = 0.5 * sum(v * v for v in velocities)

    if params.c_iso > 0:
        p = rho * params.c_iso * params.c_iso
        c = xp.full_like(rho, params.c_iso)
    else:
        eint = U[IP] * inv_rho - eken
        p = xp.maximum((params.gamma0 - 1.0) * rho * eint, rho * params.smallp)
        c = xp.sqrt(params.gamma0 * p * inv_rho)

    Q = xp.stack([rho, p, *velocities])
    return Q, c


def constoprim_mhd(params: RunParams, U: jnp.ndarray, dt, xp=None):
    """MHD conservative -> primitive (constoprim.h:137-198).

    The conservative state stores *left-face-centered* B; the primitive
    cell-centered B is the average of the left face and the next cell's left
    face (i.e. this cell's right face). Needs one ghost layer of valid B on
    the +x/+y/+z side, which ghost_width=3 provides.

    Includes the Coriolis predictor half-kick when omega0 > 0
    (constoprim.h:190-195).

    ``xp`` selects the array backend (ops/backend.py); default plain jnp.
    """
    if xp is None:
        from .backend import JNP as xp
    x_axis, y_axis, z_axis = -1, -2, -3

    rho = xp.maximum(U[ID], params.smallr)
    inv_rho = 1.0 / rho
    u = U[IU] * inv_rho
    v = U[IV] * inv_rho
    w = U[IW] * inv_rho

    bx = 0.5 * (U[IA] + xp.shift_p(U[IA], x_axis))
    by = 0.5 * (U[IB] + xp.shift_p(U[IB], y_axis if params.dim == 3 else -2))
    if params.dim == 3:
        bz = 0.5 * (U[IC] + xp.shift_p(U[IC], z_axis))
    else:
        bz = U[IC]  # 2D: no z-stagger, Bz is cell-centered (DUMSES convention)

    eken = 0.5 * (u * u + v * v + w * w)
    emag = 0.5 * (bx * bx + by * by + bz * bz)

    if params.c_iso > 0:
        p = rho * params.c_iso * params.c_iso
        c = xp.full_like(rho, params.c_iso)
    else:
        eint = (U[IP] - emag) * inv_rho - eken
        p = xp.maximum((params.gamma0 - 1.0) * rho * eint, rho * params.smallp)
        c = xp.sqrt(params.gamma0 * p * inv_rho)

    if params.omega0 > 0:
        dvx = 2.0 * params.omega0 * v
        dvy = -0.5 * params.omega0 * u
        u = u + dvx * dt * 0.5
        v = v + dvy * dt * 0.5

    Q = xp.stack([rho, p, u, v, w, bx, by, bz])
    return Q, c


def prim_to_cons_hydro(params: RunParams, Q: jnp.ndarray) -> jnp.ndarray:
    """Primitive -> conservative (inverse of constoprim_hydro), used by
    problem initializers that specify primitive values."""
    rho = Q[ID]
    p = Q[IP]
    velocities = [Q[IU], Q[IV]] + ([Q[IW]] if params.dim == 3 else [])
    eken = 0.5 * rho * sum(v * v for v in velocities)
    e_tot = p / (params.gamma0 - 1.0) + eken
    return jnp.stack([rho, e_tot, *[rho * v for v in velocities]])
