"""Ghost-cell boundary fill.

Functional re-design of the reference's templated boundary kernels
(reference: src/hydro/make_boundary_base.h:709-1332, make_boundary2).
Ghost layers live inside the state array (width 2 for hydro, 3 for MHD);
this module fills them from the interior according to the per-face BC type:

  BC_DIRICHLET: mirror copy, normal velocity sign-flipped
                (ghost g_i <- interior at 2*gw-1-i for the MIN side)
  BC_NEUMANN:   copy of the first/last interior layer
  BC_PERIODIC:  wrap copy from the opposite interior
  BC_COPY:      no-op here — filled by the halo exchange in parallel/halo.py

All BC types are static config, so the fill compiles to a handful of fused
dynamic-update-slices; no branching at runtime.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW, BoundaryConditionType as BCT

# axis (relative to trailing spatial dims) and normal-velocity component per side
_X, _Y, _Z = -1, -2, -3
_NORMAL_VEL = {_X: IU, _Y: IV, _Z: IW}
_NORMAL_B = {_X: IA, _Y: IB, _Z: IC}


def _take(U: jnp.ndarray, axis: int, idx) -> jnp.ndarray:
    sl = [slice(None)] * U.ndim
    sl[axis] = idx
    return U[tuple(sl)]


def _put(U: jnp.ndarray, axis: int, idx, value) -> jnp.ndarray:
    sl = [slice(None)] * U.ndim
    sl[axis] = idx
    return U.at[tuple(sl)].set(value)


def _fill_side(params: RunParams, U: jnp.ndarray, axis: int, is_max: bool,
               bc: BCT) -> jnp.ndarray:
    """Fill the ghost layers on one side of one axis."""
    gw = params.ghost_width
    n = U.shape[axis] - 2 * gw  # interior cell count along this axis

    if bc == BCT.BC_Z_STRATIFIED and axis == _Z:
        from .stratified import make_boundary_z_stratified

        return make_boundary_z_stratified(params, U, side_max=is_max)

    if bc in (BCT.BC_COPY, BCT.BC_UNDEFINED, BCT.BC_SHEARINGBOX):
        # COPY: halo exchange fills it. SHEARINGBOX is handled by the
        # dedicated shear remap (solvers/shear.py); treated as no-op here.
        return U

    if bc == BCT.BC_PERIODIC:
        if is_max:
            src = _take(U, axis, slice(gw, 2 * gw))
            return _put(U, axis, slice(n + gw, n + 2 * gw), src)
        src = _take(U, axis, slice(n, n + gw))
        return _put(U, axis, slice(0, gw), src)

    if bc == BCT.BC_NEUMANN:
        if is_max:
            src = _take(U, axis, n + gw - 1)
            for i in range(gw):
                U = _put(U, axis, n + gw + i, src)
            return U
        src = _take(U, axis, gw)
        for i in range(gw):
            U = _put(U, axis, i, src)
        return U

    if bc == BCT.BC_DIRICHLET:
        # mirror with sign flip on the normal velocity component
        # (make_boundary_base.h:741 i0 = 2*nGhosts-1-iGhost for the MIN side,
        #  :771 i0 = 2*nx+2*nGhosts-1-iGhost for the MAX side)
        nvel = _NORMAL_VEL[axis]
        sign = jnp.ones((U.shape[0],) + (1,) * (U.ndim - 1), dtype=U.dtype)
        sign = sign.at[nvel].set(-1.0)
        if params.mhd:
            # the reference also sign-flips the normal face-centered B at
            # reflecting walls (make_boundary, make_boundary_base.h:549-679)
            sign = sign.at[_NORMAL_B[axis]].set(-1.0)
        if is_max:
            # ghost index i (absolute n+gw .. n+2gw-1) <- 2n+2gw-1-i
            src = _take(U, axis, slice(n + gw - 1, n - 1, -1))
            return _put(U, axis, slice(n + gw, n + 2 * gw), sign * src)
        src = _take(U, axis, slice(2 * gw - 1, gw - 1, -1))
        return _put(U, axis, slice(0, gw), sign * src)

    raise ValueError(f"unhandled boundary type {bc!r}")


def make_jet(params: RunParams, U: jnp.ndarray) -> jnp.ndarray:
    """Inflow jet injected into the ghost zone each step
    (reference: HydroRunBase.cpp make_jet — 2D: YMIN ghost strip of width
    ijet at x-offset offsetJet, velocity +y; 3D: ZMIN ghost square,
    velocity +z)."""
    g = params.ghost_width
    i0 = g + params.offset_jet
    i1 = i0 + params.ijet
    djet, ujet, pjet = params.djet, params.ujet, params.pjet
    e_jet = pjet / (params.gamma0 - 1.0) + 0.5 * djet * ujet * ujet

    if params.dim == 2:
        sl = (slice(0, g), slice(i0, i1))
        U = U.at[(ID,) + sl].set(djet)
        U = U.at[(IP,) + sl].set(e_jet)
        U = U.at[(IU,) + sl].set(0.0)
        U = U.at[(IV,) + sl].set(djet * ujet)
    else:
        sl = (slice(0, g), slice(i0, i1), slice(i0, i1))
        U = U.at[(ID,) + sl].set(djet)
        U = U.at[(IP,) + sl].set(e_jet)
        U = U.at[(IU,) + sl].set(0.0)
        U = U.at[(IV,) + sl].set(0.0)
        U = U.at[(IW,) + sl].set(djet * ujet)
    return U


def concat_fill_supported(params: RunParams) -> bool:
    """True when every face is DIRICHLET / NEUMANN / PERIODIC — the cases
    ``make_boundaries_concat`` covers (no shear remap, no stratified
    hydrostatic fill, no jet rewrite)."""
    simple = (BCT.BC_DIRICHLET, BCT.BC_NEUMANN, BCT.BC_PERIODIC)
    return (
        all(b in simple for b in params.boundary_types)
        and params.problem not in ("jet", "Jet")
    )


def ghost_band(
    params: RunParams, mid: jnp.ndarray, axis: int, bc: BCT, is_max: bool
) -> jnp.ndarray:
    """The ``ghost_width``-wide ghost band adjacent to one side of ``mid``
    (which carries NO ghost layers along ``axis``), per the simple BC types.
    Bitwise-identical to the bands ``make_boundaries`` writes; shared by
    the concat fill below, and mirrored in-kernel by the padded-carry BC
    loop (pallas/packed_bc.py band builders)."""
    gw = params.ghost_width
    n = mid.shape[axis]
    if bc == BCT.BC_PERIODIC:
        return _take(
            mid, axis, slice(n - gw, n) if not is_max else slice(0, gw)
        )
    if bc == BCT.BC_NEUMANN:
        edge = _take(
            mid, axis, slice(0, 1) if not is_max else slice(n - 1, n)
        )
        return jnp.concatenate([edge] * gw, axis=axis)
    if bc != BCT.BC_DIRICHLET:
        raise ValueError(f"no concat ghost band for boundary type {bc!r}")
    # BC_DIRICHLET: mirror with sign flip on the normal velocity
    # (and face-B for MHD) — same formulas as _fill_side
    nvel = _NORMAL_VEL[axis]
    sign = jnp.ones((mid.shape[0],) + (1,) * (mid.ndim - 1), dtype=mid.dtype)
    sign = sign.at[nvel].set(-1.0)
    if params.mhd:
        sign = sign.at[_NORMAL_B[axis]].set(-1.0)
    src = _take(
        mid, axis, slice(gw - 1, None, -1) if not is_max
        else slice(n - 1, n - gw - 1, -1)
    )
    return sign * src


def make_boundaries_concat(
    params: RunParams, U: jnp.ndarray, interior_only: bool = False
) -> jnp.ndarray:
    """Bitwise-equal ``make_boundaries`` for the simple BC types, built
    from ONE concatenate per axis instead of per-face dynamic-update
    slices.  On TPU the six sequential ``.at[].set`` fills cost a full
    HBM copy EACH (measured 55.6 ms at 256^3 hydro,
    scripts/hydro_phase_timing.py); three concats cost three copies
    (~3.4 ms).  Axis order X then Y then Z, like make_boundaries, so
    corner ghosts pick up already-filled transverse ghosts.

    ``interior_only=True``: U carries NO ghost frame — each axis's concat
    adds its own (the fused-kernel step path, which grows the ghosted
    state straight around the kernel's new interior)."""
    if not concat_fill_supported(params):
        if interior_only:
            pad = ((0, 0),) + ((params.ghost_width,) * 2,) * params.dim
            U = jnp.pad(U, pad)
        return make_boundaries(params, U)
    gw = params.ghost_width
    bts = params.boundary_types
    axes = (_X, _Y) if params.dim == 2 else (_X, _Y, _Z)

    for k, axis in enumerate(axes):
        bmin, bmax = bts[2 * k], bts[2 * k + 1]
        if interior_only:
            n = U.shape[axis]
            mid = U
        else:
            n = U.shape[axis] - 2 * gw
            mid = _take(U, axis, slice(gw, gw + n))

        U = jnp.concatenate(
            [
                ghost_band(params, mid, axis, bmin, False),
                mid,
                ghost_band(params, mid, axis, bmax, True),
            ],
            axis=axis,
        )
    return U


def make_boundaries(params: RunParams, U: jnp.ndarray) -> jnp.ndarray:
    """Fill all ghost layers.

    Directions are processed X then Y then Z so corner ghosts pick up the
    already-filled transverse ghosts, matching the reference's sequencing
    (HydroRunBase.cpp:2223-2331 / HydroRunGodunovMpi.cpp:664).
    """
    bts = params.boundary_types
    U = _fill_side(params, U, _X, False, bts[0])
    U = _fill_side(params, U, _X, True, bts[1])
    U = _fill_side(params, U, _Y, False, bts[2])
    U = _fill_side(params, U, _Y, True, bts[3])
    if params.dim == 3:
        U = _fill_side(params, U, _Z, False, bts[4])
        U = _fill_side(params, U, _Z, True, bts[5])
    if params.problem in ("jet", "Jet") and params.ijet > 0:
        U = make_jet(params, U)
    return U
