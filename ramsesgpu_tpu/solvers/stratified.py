"""Stratified-MRI vertical boundary (BC_Z_STRATIFIED).

Re-design of the reference's special z boundary for stratified shearing
boxes (reference: src/hydro/make_boundary_base.h:1357-1647
make_boundary2_z_stratified): isothermal-hydrostatic density extrapolation
into the vertical ghosts (Gaussian profile with scale height H = cIso/Omega0,
or flat when the floor option is on), constant-velocity momentum scaling,
outflow-only vertical momentum, zeroed horizontal field, and continued
vertical field (the reference's divB walk degenerates to a plane copy since
the horizontal ghost field is zeroed first).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW

_Z = -3


def make_boundary_z_stratified(
    params: RunParams, U: jnp.ndarray, side_max: bool | None = None,
    floor: bool = False,
) -> jnp.ndarray:
    """Fill the stratified z ghosts; ``side_max`` selects one side
    (None = both)."""
    g = params.ghost_width
    dz = params.dz
    H = params.c_iso / params.omega0
    factor = -dz / 2.0 / (H * H)
    kmax = U.shape[_Z]

    if floor:
        ratios_min = [1.0, 1.0, 1.0]
        ratios_max = [1.0, 1.0, 1.0]
    else:
        ratios_min = [
            math.exp(factor * (-2 * (params.zmin + 0.5 * dz) + (2 * k + 1) * dz))
            for k in range(g)
        ]
        ratios_max = [
            math.exp(factor * (2 * (params.zmax - 0.5 * dz) + (2 * k + 1) * dz))
            for k in range(g)
        ]

    def fill_side(U, is_max: bool, ratios):
        if is_max:
            src_k = kmax - g - 1
            ghost_ks = range(kmax - g, kmax)  # walking away from the interior
            w_clip = lambda w: jnp.maximum(w, 0.0)
        else:
            src_k = g
            ghost_ks = range(g - 1, -1, -1)
            w_clip = lambda w: jnp.minimum(w, 0.0)

        rho_src = U[ID, ..., src_k, :, :]
        u_src = U[IU, ..., src_k, :, :]
        v_src = U[IV, ..., src_k, :, :]
        w_src = w_clip(U[IW, ..., src_k, :, :])
        bz_src = U[IC, ..., src_k, :, :]
        if params.c_iso > 0:
            e_src = None  # isothermal: energy slot unused by the solver
        else:
            e_src = U[IP, ..., src_k, :, :]

        cumulative = 1.0
        for step_i, k in enumerate(ghost_ks):
            cumulative *= ratios[step_i]
            rho_k = rho_src * cumulative
            U = U.at[ID, ..., k, :, :].set(rho_k)
            U = U.at[IU, ..., k, :, :].set(u_src / rho_src * rho_k)
            U = U.at[IV, ..., k, :, :].set(v_src / rho_src * rho_k)
            U = U.at[IW, ..., k, :, :].set(w_src)
            U = U.at[IA, ..., k, :, :].set(0.0)
            U = U.at[IB, ..., k, :, :].set(0.0)
            U = U.at[IC, ..., k, :, :].set(bz_src)
            if e_src is not None:
                U = U.at[IP, ..., k, :, :].set(e_src)
        return U

    if side_max is None or side_max is False:
        U = fill_side(U, False, ratios_min)
    if side_max is None or side_max is True:
        U = fill_side(U, True, ratios_max)
    return U
