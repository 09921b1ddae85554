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


def xpos_array(params: RunParams, dtype) -> jnp.ndarray:
    """Cell-center x coordinates, broadcastable over [(z,) y, x]."""
    g = params.ghost_width
    i = jnp.arange(params.isize, dtype=dtype)
    x = params.xmin + params.dx / 2 + (i - g) * params.dx
    shape = (1,) * (params.dim - 1) + (params.isize,)
    return x.reshape(shape)


def godunov_unsplit_mhd(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    if params.dim == 2:
        return _godunov_unsplit_mhd_2d(params, U, dt)
    return _godunov_unsplit_mhd_3d(params, U, dt)


def _godunov_unsplit_mhd_2d(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    g = params.ghost_width
    dtdx = dt / params.dx
    dtdy = dt / params.dy
    xpos = xpos_array(params, U.dtype)

    Q, _c = constoprim_mhd(params, U, dt)
    (qm_x, qm_y), (qp_x, qp_y), (qRT, qRB, qLT, qLB) = trace_unsplit_mhd_2d(
        params, Q, U[IA], U[IB], dt, xpos
    )

    # --- 1D Riemann fluxes at faces ---
    flux_x = riemann_mhd(params, shift_m(qm_x, _X), qp_x)
    perm = list(_PERM_Y)
    flux_y_rot = riemann_mhd(params, shift_m(qm_y, _Y)[perm, ...], qp_y[perm, ...])
    flux_y = flux_y_rot[perm, ...]

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

    if params.nu > 0 or params.eta > 0:
        from .boundary import make_boundaries
        from .dissipation import apply_dissipation_mhd

        U_new = make_boundaries(params, U_new)
        U_new = apply_dissipation_mhd(params, U_new, dt)

    return U_new


def _godunov_unsplit_mhd_3d(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    from ..ops.trace_mhd3d import trace_unsplit_mhd_3d

    g = params.ghost_width
    dtdx = dt / params.dx
    dtdy = dt / params.dy
    dtdz = dt / params.dz
    xpos = xpos_array(params, U.dtype)

    Q, _c = constoprim_mhd(params, U, dt)
    (qm, qp, qedge_z, qedge_y, qedge_x) = trace_unsplit_mhd_3d(
        params, Q, U[IA], U[IB], U[IC], dt, xpos
    )

    flux_x = riemann_mhd(params, shift_m(qm[0], _X), qp[0])
    perm_y = list(_PERM_Y)
    flux_y = riemann_mhd(
        params, shift_m(qm[1], _Y)[perm_y, ...], qp[1][perm_y, ...]
    )[perm_y, ...]
    perm_z = list(_PERM_Z)
    flux_z = riemann_mhd(
        params, shift_m(qm[2], _Z)[perm_z, ...], qp[2][perm_z, ...]
    )[perm_z, ...]

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

    if params.nu > 0 or params.eta > 0:
        from .boundary import make_boundaries
        from .dissipation import apply_dissipation_mhd

        U_new = make_boundaries(params, U_new)
        U_new = apply_dissipation_mhd(params, U_new, dt)

    return U_new
