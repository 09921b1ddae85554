"""Explicit dissipative terms: viscosity and resistivity.

Whole-array JAX re-design of the reference's dissipation kernels
(reference: src/hydro/viscosity.cuh:51-1141, resistivity.cuh:44-471).
Face-centered stress/energy fluxes are accumulated with the same
flux-difference convention as the hyperbolic update, and the resistive EMF
feeds the same CT curl so divB stays exact.

All fluxes here are pre-scaled by dt/dh exactly like the reference's
kernels, so the update is U[c] += flux[c] - flux[c+1] per direction.

Every compute function takes the pluggable ``xp`` backend (ops/backend.py):
xp=JNP (default) is the whole-array path; xp=BOX runs the same formulas on
box-tracked VMEM windows inside the fused dissipation kernel
(pallas/fused_dissip3d.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IW, IV
from ..ops.stencil import shift_m, shift_p

_X, _Y, _Z = -1, -2, -3


def _default_xp(xp):
    if xp is None:
        from ..ops.backend import JNP

        return JNP
    return xp


def _favg(f, axis, xp):
    """Average to the left face along axis: 0.5*(f[i] + f[i-1])."""
    return 0.5 * (f + xp.shift_m(f, axis))


def _bdiff(f, axis, d, xp):
    """Backward difference at the left face along axis: (f[i]-f[i-1])/d."""
    return (f - xp.shift_m(f, axis)) / d


def _tavg4(f, face_axis, t_axis, dt_, xp):
    """Transverse derivative at a face: centered difference along t_axis of
    the face-averaged field, i.e. ((f[i]+f[i-1])[t+1] - (..)[t-1]) / (4*dt)
    (viscosity.cuh:128-141 pattern)."""
    g = f + xp.shift_m(f, face_axis)
    return (xp.shift_p(g, t_axis) - xp.shift_m(g, t_axis)) / (4.0 * dt_)


def _apply_flux_update(params: RunParams, U, fluxes, var_slots):
    """U[c] += flux[c] - flux[c+1] on the interior, for the given components.
    ``fluxes`` is a dict axis -> {slot: flux_array}."""
    g = params.ghost_width
    interior = (slice(g, -g),) * params.dim
    for axis, comp in fluxes.items():
        for slot, flx in comp.items():
            dF = (flx - shift_p(flx, axis))[interior]
            U = U.at[(slot,) + interior].add(dF)
    return U


# --------------------------------------------------------------------------- #
# viscosity
# --------------------------------------------------------------------------- #
def compute_viscosity_fluxes(params: RunParams, U, dt, xp=None):
    """Navier-Stokes stress fluxes (viscosity.cuh:51-400 2D, :412+ 3D)."""
    xp = _default_xp(xp)
    nu = params.nu
    dx, dy, dz = params.dx, params.dy, params.dz
    two3rd = 2.0 / 3.0

    rho = U[ID]
    u = U[IU] / rho
    v = U[IV] / rho
    with_energy = params.c_iso <= 0

    fluxes: dict = {}
    if params.dim == 2:
        # x-face flux
        rho_f = _favg(rho, _X, xp)
        dudx_x = _bdiff(u, _X, dx, xp)
        dvdx_x = _bdiff(v, _X, dx, xp)
        dudy_x = _tavg4(u, _X, _Y, dy, xp)
        dvdy_x = _tavg4(v, _X, _Y, dy, xp)
        txx = -two3rd * nu * rho_f * (2.0 * dudx_x - dvdy_x)
        txy = -nu * rho_f * (dudy_x + dvdx_x)
        fx = {IU: txx * dt / dx, IV: txy * dt / dx}
        if with_energy:
            fx[IP] = (_favg(u, _X, xp) * txx + _favg(v, _X, xp) * txy) * dt / dx
        fluxes[_X] = fx

        # y-face flux
        rho_f = _favg(rho, _Y, xp)
        dudy_y = _bdiff(u, _Y, dy, xp)
        dvdy_y = _bdiff(v, _Y, dy, xp)
        dudx_y = _tavg4(u, _Y, _X, dx, xp)
        dvdx_y = _tavg4(v, _Y, _X, dx, xp)
        tyy = -two3rd * nu * rho_f * (2.0 * dvdy_y - dudx_y)
        txy = -nu * rho_f * (dudy_y + dvdx_y)
        fy = {IU: txy * dt / dy, IV: tyy * dt / dy}
        if with_energy:
            fy[IP] = (_favg(u, _Y, xp) * txy + _favg(v, _Y, xp) * tyy) * dt / dy
        fluxes[_Y] = fy
        return fluxes

    # --- 3D ---
    w = U[IW] / rho
    for axis, dh, nvel in ((_X, dx, 0), (_Y, dy, 1), (_Z, dz, 2)):
        rho_f = _favg(rho, axis, xp)
        vels = (u, v, w)
        dhs = (dx, dy, dz)
        axes = (_X, _Y, _Z)
        # normal derivative of each velocity component at the face
        dnorm = [_bdiff(q, axis, dh, xp) for q in vels]
        # transverse derivatives of each velocity at the face
        dtrans = {}
        for t_i, (t_axis, t_dh) in enumerate(zip(axes, dhs)):
            if t_axis == axis:
                continue
            dtrans[t_i] = [_tavg4(q, axis, t_axis, t_dh, xp) for q in vels]

        # divergence-complement term: sum of the two transverse normal
        # derivatives dq_t/dt
        div_t = sum(dtrans[t_i][t_i] for t_i in dtrans)
        t_norm = -two3rd * nu * rho_f * (2.0 * dnorm[nvel] - div_t)

        comp = {}
        vel_slots = (IU, IV, IW)
        comp[vel_slots[nvel]] = t_norm * dt / dh
        shear_stresses = {nvel: t_norm}
        for t_i in dtrans:
            t_shear = -nu * rho_f * (dtrans[t_i][nvel] + dnorm[t_i])
            comp[vel_slots[t_i]] = t_shear * dt / dh
            shear_stresses[t_i] = t_shear
        if with_energy:
            e_flux = sum(
                _favg(vels[k], axis, xp) * s for k, s in shear_stresses.items()
            )
            comp[IP] = e_flux * dt / dh
        fluxes[axis] = comp
    return fluxes


def apply_viscosity(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    fluxes = compute_viscosity_fluxes(params, U, dt)
    return _apply_flux_update(params, U, fluxes, None)


# --------------------------------------------------------------------------- #
# resistivity
# --------------------------------------------------------------------------- #
def compute_resistivity_emf(params: RunParams, U, xp=None):
    """Resistive EMF at edges: -eta * J (resistivity.cuh:44-115, 233-330).
    Returns (emf_z, emf_y, emf_x); in 2D only emf_z (others None)."""
    xp = _default_xp(xp)
    eta = params.eta
    dx, dy, dz = params.dx, params.dy, params.dz
    bx, by, bz = U[IA], U[IB], U[IC]

    if params.dim == 2:
        jz = _bdiff(by, _X, dx, xp) - _bdiff(bx, _Y, dy, xp)
        return -eta * jz, None, None

    jx = _bdiff(bz, _Y, dy, xp) - _bdiff(by, _Z, dz, xp)
    jy = _bdiff(bx, _Z, dz, xp) - _bdiff(bz, _X, dx, xp)
    jz = _bdiff(by, _X, dx, xp) - _bdiff(bx, _Y, dy, xp)
    return -eta * jz, -eta * jy, -eta * jx


def apply_resistivity_ct(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    """CT update with the resistive EMF (compute_ct_update path)."""
    g = params.ghost_width
    dtdx, dtdy = dt / params.dx, dt / params.dy
    emf_z, emf_y, emf_x = compute_resistivity_emf(params, U)

    if params.dim == 2:
        ct = (slice(g, U.shape[_Y] - g + 1), slice(g, U.shape[_X] - g + 1))
        U = U.at[(IA,) + ct].add((shift_p(emf_z, _Y) - emf_z)[ct] * dtdy)
        U = U.at[(IB,) + ct].add(-(shift_p(emf_z, _X) - emf_z)[ct] * dtdx)
        return U

    dtdz = dt / params.dz
    ct = (
        slice(g, U.shape[_Z] - g + 1),
        slice(g, U.shape[_Y] - g + 1),
        slice(g, U.shape[_X] - g + 1),
    )
    dbx = (shift_p(emf_z, _Y) - emf_z)[ct] * dtdy - (shift_p(emf_y, _Z) - emf_y)[ct] * dtdz
    dby = (shift_p(emf_x, _Z) - emf_x)[ct] * dtdz - (shift_p(emf_z, _X) - emf_z)[ct] * dtdx
    dbz = (shift_p(emf_y, _X) - emf_y)[ct] * dtdx - (shift_p(emf_x, _Y) - emf_x)[ct] * dtdy
    U = U.at[(IA,) + ct].add(dbx)
    U = U.at[(IB,) + ct].add(dby)
    U = U.at[(IC,) + ct].add(dbz)
    return U


def compute_resistivity_energy_fluxes(params: RunParams, U, dt, xp=None):
    """Resistive Poynting energy fluxes at faces
    (resistivity.cuh:124-212 2D, and the 3D twin)."""
    xp = _default_xp(xp)
    eta = params.eta
    dx, dy, dz = params.dx, params.dy, params.dz
    bx, by, bz = U[IA], U[IB], U[IC]

    def edge_avg_pair(j_edge, axis):
        """Average an edge-centered current to the face: (j + j[axis+1])/2."""
        return 0.5 * (j_edge + xp.shift_p(j_edge, axis))

    if params.dim == 2:
        jz_edge = _bdiff(by, _X, dx, xp) - _bdiff(bx, _Y, dy, xp)

        # x-face
        By_f = 0.25 * (
            by + xp.shift_m(by, _X) + xp.shift_p(by, _Y)
            + xp.shift_p(xp.shift_m(by, _X), _Y)
        )
        Bz_f = _favg(bz, _X, xp)
        jy_f = -_bdiff(bz, _X, dx, xp)
        jz_f = edge_avg_pair(jz_edge, _Y)
        fx = {IP: -eta * (jy_f * Bz_f - jz_f * By_f) * dt / dx}

        # y-face
        Bx_f = 0.25 * (
            bx + xp.shift_m(bx, _Y) + xp.shift_p(bx, _X)
            + xp.shift_p(xp.shift_m(bx, _Y), _X)
        )
        Bz_f2 = _favg(bz, _Y, xp)
        jx_f = _bdiff(bz, _Y, dy, xp)
        jz_f2 = edge_avg_pair(jz_edge, _X)
        fy = {IP: -eta * (jz_f2 * Bx_f - jx_f * Bz_f2) * dt / dy}
        return {_X: fx, _Y: fy}

    # --- 3D (resistivity.cuh kernel_resistivity_energy_flux_3d) ---
    jx_edge = _bdiff(bz, _Y, dy, xp) - _bdiff(by, _Z, dz, xp)
    jy_edge = _bdiff(bx, _Z, dz, xp) - _bdiff(bz, _X, dx, xp)
    jz_edge = _bdiff(by, _X, dx, xp) - _bdiff(bx, _Y, dy, xp)

    def quad_avg(f, face_axis, t_axis):
        return 0.25 * (
            f + xp.shift_m(f, face_axis) + xp.shift_p(f, t_axis)
            + xp.shift_p(xp.shift_m(f, face_axis), t_axis)
        )

    # x-face
    By_f = quad_avg(by, _X, _Y)
    Bz_f = quad_avg(bz, _X, _Z)
    jy_f = edge_avg_pair(jy_edge, _Z)
    jz_f = edge_avg_pair(jz_edge, _Y)
    fx = {IP: -eta * (jy_f * Bz_f - jz_f * By_f) * dt / dx}

    # y-face
    Bx_f = quad_avg(bx, _Y, _X)
    Bz_f2 = quad_avg(bz, _Y, _Z)
    jx_f = edge_avg_pair(jx_edge, _Z)
    jz_f2 = edge_avg_pair(jz_edge, _X)
    fy = {IP: -eta * (jz_f2 * Bx_f - jx_f * Bz_f2) * dt / dy}

    # z-face
    Bx_f2 = quad_avg(bx, _Z, _X)
    By_f2 = quad_avg(by, _Z, _Y)
    jx_f2 = edge_avg_pair(jx_edge, _Y)
    jy_f2 = edge_avg_pair(jy_edge, _X)
    fz = {IP: -eta * (jx_f2 * By_f2 - jy_f2 * Bx_f2) * dt / dz}
    return {_X: fx, _Y: fy, _Z: fz}


def apply_dissipation_mhd(params: RunParams, U: jnp.ndarray, dt) -> jnp.ndarray:
    """Dissipative step for MHD, mirroring the sequencing of
    mhd_godunov_unsplit_cpu_v1.cpp:300-345: resistive EMF + CT, resistive
    energy flux (non-isothermal), then viscous fluxes."""
    if params.eta > 0:
        U = apply_resistivity_ct(params, U, dt)
        if params.c_iso <= 0:
            fluxes = compute_resistivity_energy_fluxes(params, U, dt)
            U = _apply_flux_update(params, U, fluxes, None)
    if params.nu > 0:
        U = apply_viscosity(params, U, dt)
    return U


def mhd_dissipation_interior_update(
    params: RunParams, U, dt, margin: tuple[int, int, int] | None = None,
    xp=None, shear_planes: bool = False, comp=None,
):
    """Scatter-free 3D dissipative update returning ONLY the new interior
    [8, nz, ny, nx] — the form the fused dissipation kernel consumes
    (pallas/fused_dissip3d.py). Composition matches apply_dissipation_mhd
    exactly: resistive CT first, THEN energy fluxes from the CT-updated B,
    then viscous fluxes (which read only rho/velocities, untouched by CT).

    ``shear_planes=True`` additionally returns the resistive emfY and emfZ
    planes at the domain xmax face — the CT update of the KEPT Bx face in
    shearing-box runs (solvers/shear.py) also gets the resistive curl.

    ``comp``: carried Kahan compensation field; when given the additions
    run compensated and [2*nvar, ...] is returned (state + new carries) —
    see godunov_mhd.mhd_apply_update.
    """
    xp = _default_xp(xp)
    g = params.ghost_width
    mz, my, mx = margin if margin is not None else (g, g, g)
    dtdx, dtdy, dtdz = dt / params.dx, dt / params.dy, dt / params.dz
    z0, z1 = mz, mz + params.nz
    y0, y1 = my, my + params.ny
    x0, x1 = mx, mx + params.nx

    def crop(f):
        return xp.crop(f, z0, z1, y0, y1, x0, x1)

    U2 = U
    eypl = ezpl = None
    if params.eta > 0:
        emf_z, emf_y, emf_x = compute_resistivity_emf(params, U, xp=xp)
        # CT on the full (box-shrinking) extent: later stages consume the
        # UPDATED B up to their own stencil reach
        dbx = (xp.shift_p(emf_z, _Y) - emf_z) * dtdy - (
            xp.shift_p(emf_y, _Z) - emf_y
        ) * dtdz
        dby = (xp.shift_p(emf_x, _Z) - emf_x) * dtdz - (
            xp.shift_p(emf_z, _X) - emf_z
        ) * dtdx
        dbz = (xp.shift_p(emf_y, _X) - emf_y) * dtdx - (
            xp.shift_p(emf_x, _Y) - emf_x
        ) * dtdy
        U2 = xp.set_component(U2, IA, U2[IA] + dbx)
        U2 = xp.set_component(U2, IB, U2[IB] + dby)
        U2 = xp.set_component(U2, IC, U2[IC] + dbz)
        if shear_planes:
            eypl = xp.crop(emf_y, z0, z1, y0, y1, x1, x1 + 1)[..., 0]
            ezpl = xp.crop(emf_z, z0, z1, y0, y1, x1, x1 + 1)[..., 0]

    dU = {}
    if params.eta > 0 and params.c_iso <= 0:
        efl = compute_resistivity_energy_fluxes(params, U2, dt, xp=xp)
        for axis, comps in efl.items():
            for slot, flx in comps.items():
                dU[slot] = dU.get(slot, 0.0) + crop(flx - xp.shift_p(flx, axis))
    if params.nu > 0:
        vfl = compute_viscosity_fluxes(params, U2, dt, xp=xp)
        for axis, comps in vfl.items():
            for slot, flx in comps.items():
                dU[slot] = dU.get(slot, 0.0) + crop(flx - xp.shift_p(flx, axis))

    if comp is None:
        Ui = [crop(U2[c]) for c in range(params.nb_var)]
        for slot, d in dU.items():
            Ui[slot] = Ui[slot] + d
        out = jnp.stack(Ui)
        if shear_planes:
            return out, eypl, ezpl
        return out

    # compensated: collect EXPLICIT per-channel deltas (crop(U)+crop(db)
    # is bitwise crop(U+db); non-B channels are untouched by the CT) and
    # Kahan-add them against the carried compensation
    deltas = dict(dU)
    if params.eta > 0:
        deltas[IA] = crop(dbx)
        deltas[IB] = crop(dby)
        deltas[IC] = crop(dbz)
    Ui = [crop(U[c]) for c in range(params.nb_var)]
    Ci = [crop(comp[c]) for c in range(params.nb_var)]
    outs, carries = [], []
    for c in range(params.nb_var):
        if c in deltas:
            y = deltas[c] - Ci[c]
            t_ = Ui[c] + y
            carries.append((t_ - Ui[c]) - y)
            outs.append(t_)
        else:
            outs.append(Ui[c])
            carries.append(Ci[c])
    out = jnp.stack(outs + carries)
    if shear_planes:
        return out, eypl, ezpl
    return out
