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

    jsize = U.shape[_Y]
    j = jnp.arange(jsize)

    def remap(buf, slopes, jremap, eps, lam, sign):
        """Interpolated remap of a border slab to ghost y-positions.
        sign=+1: XMIN formula (slope[jr]-slope[jr+1]); -1: XMAX."""
        jremapp1 = jremap + 1
        jremap = jnp.where(jremap < g, jremap + ny, jremap)
        jremap = jnp.where(jremap > ny + g - 1, jremap - ny, jremap)
        jremapp1 = jnp.where(jremapp1 < g, jremapp1 + ny, jremapp1)
        jremapp1 = jnp.where(jremapp1 > ny + g - 1, jremapp1 - ny, jremapp1)

        b_r = jnp.take(buf, jremap, axis=_Y)
        b_rp1 = jnp.take(buf, jremapp1, axis=_Y)
        s_r = jnp.take(slopes, jremap, axis=_Y)
        s_rp1 = jnp.take(slopes, jremapp1, axis=_Y)

        interp = (1.0 - eps) * b_r + eps * b_rp1 + lam * sign * (s_r - s_rp1)
        by_form = b_r + eps * s_r  # conservative form for face-centered By
        if params.mhd:
            interp = interp.at[IB].set(by_form[IB])
        return interp

    # XMIN ghosts <- XMAX border shifted down (make_boundary_shear.h:213-247)
    eps_min = 1.0 - epsi / dy
    lam_min = 0.5 * eps_min * (eps_min - 1.0)
    ghost_min = remap(bmax, smax, j - jplus - 1, eps_min, lam_min, +1.0)
    U = U.at[..., 0:g].set(ghost_min)

    # XMAX ghosts <- XMIN border shifted up (make_boundary_shear.h:251-299)
    eps_max = epsi / dy
    lam_max = 0.5 * eps_max * (eps_max - 1.0)
    ghost_max = remap(bmin, smin, j + jplus, eps_max, lam_max, -1.0)
    if params.mhd:
        # do NOT overwrite Bx in the first outer ghost column: that face
        # belongs to the last interior cell (make_boundary_shear.h:276-288)
        keep_bx0 = U[IA, ..., nx + g]
        U = U.at[..., nx + g : nx + 2 * g].set(ghost_max)
        U = U.at[IA, ..., nx + g].set(keep_bx0)
    else:
        U = U.at[..., nx + g : nx + 2 * g].set(ghost_max)
    return U


def make_all_boundaries_shear(params: RunParams, U: jnp.ndarray, t) -> jnp.ndarray:
    """Full ghost fill for shearing-box runs, with the reference's ordering:
    Y first, then the shear X remap, then Z, then Y again
    (MHDRunGodunov.cpp make_all_boundaries_shear)."""
    bts = params.boundary_types
    U = _fill_side(params, U, _Y, False, bts[2])
    U = _fill_side(params, U, _Y, True, bts[3])
    U = make_boundaries_shear(params, U, t)
    if params.dim == 3:
        U = _fill_side(params, U, _Z, False, bts[4])
        U = _fill_side(params, U, _Z, True, bts[5])
    U = _fill_side(params, U, _Y, False, bts[2])
    U = _fill_side(params, U, _Y, True, bts[3])
    return U
