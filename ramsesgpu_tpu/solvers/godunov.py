"""Unsplit MUSCL-Hancock Godunov scheme for 2D/3D hydrodynamics.

TPU-native re-design of the reference's unsplit scheme
(reference: src/hydro/HydroRunGodunov.cpp:1860-2500 godunov_unsplit_cpu_v1 and
src/hydro/godunov_unsplit.cuh:257,766): one pure function
``godunov_unsplit_hydro(params, U, dt) -> U_new`` built from whole-array ops.
The CUDA shared-memory tiling disappears — XLA fuses the
primitive/slope/trace/Riemann/update DAG; a Pallas fused-stencil variant of
the same math lives in pallas/ for the hot path.

Update convention (matches the reference): flux[c] is the flux through the
*left* face of cell c, so  U_new[c] = U[c] + dtdx*(flux[c] - flux[c+1]).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW
from ..ops.eos import constoprim_hydro
from ..ops.riemann import riemann_hydro
from ..ops.slopes import slopes_unsplit
from ..ops.stencil import shift_m, shift_p
from ..ops.trace import trace_unsplit_hydro

# spatial axis per direction index (0=x, 1=y, 2=z) for [nvar, (z,) y, x] layout
_AXIS = {0: -1, 1: -2, 2: -3}


def _rotation(params: RunParams, direction: int) -> list[int]:
    """Component permutation bringing the direction-normal velocity into the
    IU slot (the reference swaps components when loading qleft/qright,
    HydroRunGodunov.cpp:2062-2068 'watchout IU, IV permutation')."""
    if params.dim == 2:
        perm = [ID, IP, IU, IV]
        if direction == 1:
            perm[IU], perm[IV] = perm[IV], perm[IU]
    else:
        perm = [ID, IP, IU, IV, IW]
        if direction == 1:
            perm[IU], perm[IV] = perm[IV], perm[IU]
        elif direction == 2:
            perm[IU], perm[IW] = perm[IW], perm[IU]
    return perm


def compute_fluxes(params: RunParams, qm, qp, dt, xp=None):
    """Directional Godunov fluxes from traced face states.

    flux[d][..., c] = flux through the left face of cell c along direction d,
    from the Riemann problem (qm[d] at c-1, qp[d] at c).
    """
    if xp is None:
        from ..ops.backend import JNP as xp

    def permute(q, perm):
        # stacked permute, not fancy indexing (index-array constants don't
        # lower inside Pallas kernels)
        return xp.stack([q[i] for i in perm])

    fluxes = []
    for d in range(params.dim):
        axis = _AXIS[d]
        perm = tuple(_rotation(params, d))
        ql = permute(xp.shift_m(qm[d], axis), perm)
        qr = permute(qp[d], perm)
        flux_rot = riemann_hydro(params, ql, qr, xp=xp)
        fluxes.append(permute(flux_rot, perm))  # swap perms are involutions
    return fluxes


def _interior(params: RunParams):
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    return sl


def hydro_3d_interior_update(
    params: RunParams, U, dt,
    margin: tuple[int, int, int] | None = None,
    xp=None,
) -> jnp.ndarray:
    """Scatter-free 3D hydro update returning ONLY the updated interior
    [nvar, nz, ny, nx] — the form consumed by the fused Pallas kernel
    (see the MHD twin in godunov_mhd.mhd_3d_interior_update; xp=BOX runs
    the box-tracked pipeline, ops/backend.py)."""
    if xp is None:
        from ..ops.backend import JNP as xp
    g = params.ghost_width
    mz, my, mx = margin if margin is not None else (g, g, g)
    dtdd = [dt / params.dx, dt / params.dy, dt / params.dz]

    Q, _c = constoprim_hydro(params, U, xp=xp)
    dq = slopes_unsplit(params, Q, xp=xp)
    qm, qp = trace_unsplit_hydro(params, Q, dq, dt, xp=xp)
    fluxes = compute_fluxes(params, qm, qp, dt, xp=xp)

    z0, z1 = mz, mz + params.nz
    y0, y1 = my, my + params.ny
    x0, x1 = mx, mx + params.nx
    out = xp.crop(U, z0, z1, y0, y1, x0, x1)
    for d in range(3):
        axis = _AXIS[d]
        flux = fluxes[d]
        out = out + dtdd[d] * xp.crop(
            flux - xp.shift_p(flux, axis), z0, z1, y0, y1, x0, x1
        )
    return out


def godunov_unsplit_hydro(
    params: RunParams,
    U: jnp.ndarray,
    dt,
    gravity: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One unsplit MUSCL-Hancock update. Ghost cells of U must be filled.

    ``gravity`` is an optional static acceleration field [dim, ...spatial]
    used for both the predictor half-kick on the traced states
    (HydroRunGodunov.cpp:1909-1921) and the conservative source term.
    """
    dtdd = [dt / params.dx, dt / params.dy, dt / params.dz][: params.dim]

    Q, _c = constoprim_hydro(params, U)
    dq = slopes_unsplit(params, Q)
    qm, qp = trace_unsplit_hydro(params, Q, dq, dt)

    if gravity is not None:
        half_kick = 0.5 * dt * gravity
        vel_slots = (IU, IV, IW)[: params.dim]
        def kick(qface):
            for d_ax, slot in enumerate(vel_slots):
                qface = qface.at[slot].add(half_kick[d_ax])
            return qface
        qm = tuple(kick(q) for q in qm)
        qp = tuple(kick(q) for q in qp)

    fluxes = compute_fluxes(params, qm, qp, dt)

    interior = _interior(params)
    dU = jnp.zeros_like(U[interior])
    for d in range(params.dim):
        axis = _AXIS[d]
        flux = fluxes[d]
        dU = dU + dtdd[d] * (flux - shift_p(flux, axis))[interior]

    U_new = U.at[interior].add(dU)

    if gravity is not None:
        # conservative gravity source term: d(rho v)/dt = rho g,
        # dE/dt = rho v.g evaluated with the time-centered momentum
        # (reference: gravity.cuh:38-202 kernel_gravity_source_term)
        rho_old = U[ID][interior[1:]]
        mom_slots = (IU, IV, IW)[: params.dim]
        for d_ax, slot in enumerate(mom_slots):
            g_d = gravity[d_ax][interior[1:]]
            mom_half = 0.5 * (U[slot][interior[1:]] + U_new[slot][interior[1:]])
            U_new = U_new.at[(slot,) + interior[1:]].add(dt * rho_old * g_d)
            U_new = U_new.at[(IP,) + interior[1:]].add(dt * mom_half * g_d)

    return U_new
