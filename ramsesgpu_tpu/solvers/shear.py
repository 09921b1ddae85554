"""Shearing-box boundary conditions (x-direction shear-periodic remap).

Re-design of the reference's shear border machinery
(reference: src/hydro/make_boundary_shear.h:39-300
kernel_compute_shear_border_slopes / kernel_perform_final_remapping_shear_borders,
MHDRunGodunov.cpp:3445-3560 make_boundaries_shear, itself from DUMSES
bval_shear.f90). Velocities are stored as deviations from the background
shear -1.5*Omega0*x, so the remap is a pure y-shift by
deltay = 1.5*Omega0*Lx*t (mod Ly) with 2nd-order (slope-corrected)
interpolation; the face-centered By uses the conservative 1st-order+slope
form, and the first XMAX ghost column of Bx is left untouched (it is the
interior's own face).

Whole-array implementation: border slabs are gathered along y with traced
shift indices (jnp.take), so the same jitted program serves every time step.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW, BoundaryConditionType as BCT
from ..ops.slopes import slope_1d
from .boundary import _fill_side

_X, _Y, _Z = -1, -2, -3


def _border_slopes(params: RunParams, buf: jnp.ndarray) -> jnp.ndarray:
    """Limited y-slopes of a border slab (make_boundary_shear.h:62-128)."""
    return slope_1d(params, buf, _Y)


def make_boundaries_shear(params: RunParams, U: jnp.ndarray, t) -> jnp.ndarray:
    """Fill the x ghost zones with the sheared-periodic remap; ``t`` is the
    time the boundary data is needed at (the reference passes totalTime+dt)."""
    g = params.ghost_width
    nx, ny = params.nx, params.ny
    dy = params.dy
    Lx = params.dx * nx
    Ly = dy * ny

    deltay = jnp.mod(1.5 * params.omega0 * Lx * t, Ly)
    jplus = jnp.floor(deltay / dy).astype(jnp.int32)
    epsi = jnp.mod(deltay, dy)

    # border slabs: first/last ghost_width interior x-columns
    bmin = U[..., g : 2 * g]
    bmax = U[..., nx : nx + g]
    smin = _border_slopes(params, bmin)
    smax = _border_slopes(params, bmax)

    def remap(buf, slopes, shift, eps, lam, sign):
        """Interpolated remap of a border slab to ghost y-positions: row j of
        the result samples interior row (j - g + shift) mod ny (the
        reference's jremap double-wrap collapses to one modular shift, which
        lowers as a dynamic roll — slice+concat — instead of a TPU gather).
        sign=+1: XMIN formula (slope[jr]-slope[jr+1]); -1: XMAX."""
        iy = (slice(None),) * (buf.ndim + _Y) + (slice(g, g + ny),)

        def sampled(a, sh):
            rolled = jnp.roll(a[iy], -sh, axis=_Y)
            return jnp.pad(
                rolled,
                ((0, 0),) * (a.ndim + _Y) + ((g, g),) + ((0, 0),),
                mode="wrap",
            )

        b_r = sampled(buf, shift)
        b_rp1 = sampled(buf, shift + 1)
        s_r = sampled(slopes, shift)
        s_rp1 = sampled(slopes, shift + 1)

        interp = (1.0 - eps) * b_r + eps * b_rp1 + lam * sign * (s_r - s_rp1)
        by_form = b_r + eps * s_r  # conservative form for face-centered By
        if params.mhd:
            interp = interp.at[IB].set(by_form[IB])
        return interp

    # XMIN ghosts <- XMAX border shifted down (make_boundary_shear.h:213-247)
    eps_min = 1.0 - epsi / dy
    lam_min = 0.5 * eps_min * (eps_min - 1.0)
    ghost_min = remap(bmax, smax, -jplus - 1, eps_min, lam_min, +1.0)
    U = U.at[..., 0:g].set(ghost_min)

    # XMAX ghosts <- XMIN border shifted up (make_boundary_shear.h:251-299)
    eps_max = epsi / dy
    lam_max = 0.5 * eps_max * (eps_max - 1.0)
    ghost_max = remap(bmin, smin, jplus, eps_max, lam_max, -1.0)
    if params.mhd:
        # do NOT overwrite Bx in the first outer ghost column: that face
        # belongs to the last interior cell (make_boundary_shear.h:276-288)
        keep_bx0 = U[IA, ..., nx + g]
        U = U.at[..., nx + g : nx + 2 * g].set(ghost_max)
        U = U.at[IA, ..., nx + g].set(keep_bx0)
    else:
        U = U.at[..., nx + g : nx + 2 * g].set(ghost_max)
    return U


def _shear_ghost_slabs(params: RunParams, U: jnp.ndarray, t):
    """Interior-extent (z, y) sheared x-ghost slabs [nvar, nz, ny, g]: the
    same remap math as make_boundaries_shear, restricted to interior rows so
    the periodic-y/z fast path can assemble the whole fill in one pass."""
    g = params.ghost_width
    nx, ny = params.nx, params.ny
    dy = params.dy
    Lx = params.dx * nx
    Ly = dy * ny

    deltay = jnp.mod(1.5 * params.omega0 * Lx * t, Ly)
    jplus = jnp.floor(deltay / dy).astype(jnp.int32)
    epsi = jnp.mod(deltay, dy)

    core = (slice(None), slice(g, -g), slice(g, -g))
    bmin = U[core + (slice(g, 2 * g),)]
    bmax = U[core + (slice(nx, nx + g),)]

    def slopes_of(buf):
        padded = jnp.pad(
            buf, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap"
        )
        return _border_slopes(params, padded)[:, :, 1:-1, :]

    def remap(buf, slopes, shift, eps, lam, sign):
        b_r = jnp.roll(buf, -shift, axis=_Y)
        b_rp1 = jnp.roll(buf, -(shift + 1), axis=_Y)
        s_r = jnp.roll(slopes, -shift, axis=_Y)
        s_rp1 = jnp.roll(slopes, -(shift + 1), axis=_Y)
        interp = (1.0 - eps) * b_r + eps * b_rp1 + lam * sign * (s_r - s_rp1)
        by_form = b_r + eps * s_r
        if params.mhd:
            interp = interp.at[IB].set(by_form[IB])
        return interp

    eps_min = 1.0 - epsi / dy
    lam_min = 0.5 * eps_min * (eps_min - 1.0)
    gmin = remap(bmax, slopes_of(bmax), -jplus - 1, eps_min, lam_min, +1.0)
    eps_max = epsi / dy
    lam_max = 0.5 * eps_max * (eps_max - 1.0)
    gmax = remap(bmin, slopes_of(bmin), jplus, eps_max, lam_max, -1.0)
    if params.mhd:
        # kept Bx face: the first XMAX ghost column of Bx is the interior's
        # own face (make_boundary_shear.h:276-288)
        gmax = gmax.at[IA, :, :, 0].set(U[(IA,) + core[1:] + (nx + g,)])
    return gmin, gmax


def _stratified_ghost_slabs(params: RunParams, mid: jnp.ndarray):
    """BC_Z_STRATIFIED ghost slabs [nvar, g, ny, nxg] for both z sides of an
    x-assembled (interior-z/y, ghosted-x) block — the same math as
    stratified.make_boundary_z_stratified, built as slabs instead of .at
    passes (make_boundary_base.h:1357-1647)."""
    import math as _math

    g = params.ghost_width
    dz = params.dz
    H = params.c_iso / params.omega0
    factor = -dz / 2.0 / (H * H)
    ratios_min = [
        _math.exp(factor * (-2 * (params.zmin + 0.5 * dz) + (2 * k + 1) * dz))
        for k in range(g)
    ]
    ratios_max = [
        _math.exp(factor * (2 * (params.zmax - 0.5 * dz) + (2 * k + 1) * dz))
        for k in range(g)
    ]

    def side(src_k, ratios, is_max):
        rho_src = mid[ID, src_k]
        u_src = mid[IU, src_k]
        v_src = mid[IV, src_k]
        w_src = (jnp.maximum if is_max else jnp.minimum)(mid[IW, src_k], 0.0)
        bz_src = mid[IC, src_k]
        planes = []
        cumulative = 1.0
        for r in ratios:
            cumulative *= r
            rho_k = rho_src * cumulative
            chans = [
                rho_k,
                mid[IP, src_k],          # isothermal: unused by the solver
                u_src / rho_src * rho_k,
                v_src / rho_src * rho_k,
                w_src,
                jnp.zeros_like(rho_k),
                jnp.zeros_like(rho_k),
                bz_src,
            ]
            planes.append(jnp.stack(chans))
        # planes[0] is adjacent to the interior; zmin side stacks outward
        if is_max:
            return jnp.stack(planes, axis=1)
        return jnp.stack(planes[::-1], axis=1)

    return (
        side(0, ratios_min, False),
        side(params.nz - 1, ratios_max, True),
    )


def make_all_boundaries_shear(params: RunParams, U: jnp.ndarray, t) -> jnp.ndarray:
    """Full ghost fill for shearing-box runs, with the reference's ordering:
    Y first, then the shear X remap, then Z, then Y again
    (MHDRunGodunov.cpp make_all_boundaries_shear).

    Periodic-y 3D fast paths (periodic OR stratified z): the sequential
    per-side fills cost ~9 full-array materializations; instead the sheared
    x-ghost slabs (and, stratified, the hydrostatic z slabs) are computed on
    interior extents and the whole fill assembles as concats + one wrap pad
    (identical values — the sequencing only matters for corners, which the
    slab-on-assembled-block order reproduces)."""
    bts = params.boundary_types
    if params.dim == 3 and all(
        b == BCT.BC_PERIODIC for b in (bts[2], bts[3], bts[4], bts[5])
    ):
        g = params.ghost_width
        gmin, gmax = _shear_ghost_slabs(params, U, t)
        mid = jnp.concatenate(
            [gmin, U[:, g:-g, g:-g, g : params.nx + g], gmax], axis=_X
        )
        return jnp.pad(
            mid, ((0, 0), (g, g), (g, g), (0, 0)), mode="wrap"
        )
    if (
        params.dim == 3
        and bts[2] == BCT.BC_PERIODIC
        and bts[3] == BCT.BC_PERIODIC
        and bts[4] == BCT.BC_Z_STRATIFIED
        and bts[5] == BCT.BC_Z_STRATIFIED
    ):
        g = params.ghost_width
        gmin, gmax = _shear_ghost_slabs(params, U, t)
        mid = jnp.concatenate(
            [gmin, U[:, g:-g, g:-g, g : params.nx + g], gmax], axis=_X
        )
        zlo, zhi = _stratified_ghost_slabs(params, mid)
        mid = jnp.concatenate([zlo, mid, zhi], axis=_Z)
        return jnp.pad(
            mid, ((0, 0), (0, 0), (g, g), (0, 0)), mode="wrap"
        )

    U = _fill_side(params, U, _Y, False, bts[2])
    U = _fill_side(params, U, _Y, True, bts[3])
    U = make_boundaries_shear(params, U, t)
    if params.dim == 3:
        U = _fill_side(params, U, _Z, False, bts[4])
        U = _fill_side(params, U, _Z, True, bts[5])
    U = _fill_side(params, U, _Y, False, bts[2])
    U = _fill_side(params, U, _Y, True, bts[3])
    return U
