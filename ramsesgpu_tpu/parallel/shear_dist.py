"""Distributed shearing-box machinery: sheared-periodic x-borders under
shard_map.

Replaces the reference's MPI shearing-box code
(reference: src/hydro/MHDRunGodunovMpi.cpp:3346-3768 — sheared-y rank lookup
plus dual MPI_Sendrecv per border, and the distributed flux/emfY remap
kernels kernel_mhd_3d_flux_remapping_xmin/xmax) with collectives:

- the opposite x-border slab travels between the two domain-edge shard
  columns over a single ``ppermute`` on the x ring;
- ``all_gather`` along the y mesh axis assembles the slab's full global-y
  extent, replacing the reference's sheared-rank-pair bookkeeping — every
  shard then slices its own sheared window with a traced offset, so one SPMD
  program serves all times t;
- the reference's "preserve the first XMAX ghost column of Bx" trick (that
  face belongs to the last interior cell, make_boundary_shear.h:276-288)
  has no direct equivalent for an interior-only carried state: the face is
  reconstructed instead from the divB = 0 constraint of the last interior
  cell, which the CT update maintains exactly, so the reconstruction equals
  the evolved face value to roundoff.

All collectives run unconditionally on every shard (SPMD); values are
consumed only where ``lax.axis_index`` selects the domain-edge columns.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config.params import RunParams
from ..core.constants import IA, IB, IC
from ..ops.slopes import slope_1d
from .mesh import AXIS_X, AXIS_Y, AXIS_Z

_X, _Y, _Z = -1, -2, -3


def _edge_swap_x(slab_min, slab_max):
    """Send each domain-edge shard column the OPPOSITE edge's border slab:
    x index 0 receives slab_max from x index mx-1 and vice versa (one
    ppermute pair each way; other shards receive zeros, never consumed)."""
    mx = lax.axis_size(AXIS_X)
    if mx == 1:
        return slab_max, slab_min  # single column: opposite edge is local
    to_min = lax.ppermute(slab_max, AXIS_X, [(mx - 1, 0)])
    to_max = lax.ppermute(slab_min, AXIS_X, [(0, mx - 1)])
    return to_min, to_max


def _gather_y(slab, axis: int):
    """Global-y assembly of a per-shard slab along ``axis``."""
    if lax.axis_size(AXIS_Y) == 1:
        return slab
    return lax.all_gather(slab, AXIS_Y, axis=axis % slab.ndim, tiled=True)


def _y_offset(local_ny: int):
    return lax.axis_index(AXIS_Y) * local_ny


class ShardedShearComm:
    """Collective implementations of the shear remaps for the sharded step.

    ``gparams`` carries the GLOBAL grid (the local step otherwise runs on
    per-shard extents, which would corrupt deltay = 1.5*Omega0*Lx*t)."""

    def __init__(self, gparams: RunParams, local_dims):
        self.gp = gparams
        self.lnz, self.lny, self.lnx = local_dims

    # -- conservative flux / emfY remap at the domain x-faces ------------- #
    def remap_pair(self, params_local, f_xmin, f_xmax, t, dt):
        """Distributed twin of godunov_mhd._shear_remap_pair: the slabs are
        per-shard (y = last axis, interior extent); values are meaningful on
        the x-edge shard columns only."""
        gp = self.gp
        dy = gp.dy
        Ly = gp.ymax - gp.ymin
        Lx = gp.xmax - gp.xmin
        NY = gp.ny
        deltay = jnp.mod(1.5 * gp.omega0 * Lx * (t + 0.5 * dt), Ly)
        jplus = jnp.floor(deltay / dy).astype(jnp.int32)
        w = jnp.mod(deltay, dy) / dy

        fmax_here, fmin_here = _edge_swap_x(f_xmin, f_xmax)
        G_fmax = _gather_y(fmax_here, -1)   # (z_ext, NY) — valid on x==0
        G_fmin = _gather_y(fmin_here, -1)   # valid on x==mx-1
        yo = _y_offset(self.lny)

        def local_rows(gbuf, shift):
            # gbuf rolled so row j holds gbuf[(j - shift) mod NY], then this
            # shard's rows [yo, yo+lny)
            rolled = jnp.roll(gbuf, shift, axis=-1)
            return lax.dynamic_slice_in_dim(rolled, yo, self.lny, axis=-1)

        interp_min = w * local_rows(G_fmax, jplus + 1) + (1.0 - w) * local_rows(
            G_fmax, jplus
        )
        interp_max = (1.0 - w) * local_rows(G_fmin, -jplus) + w * local_rows(
            G_fmin, -(jplus + 1)
        )
        # gate to the domain-edge shard columns: interior shards keep their
        # ordinary interior fluxes untouched
        xi = lax.axis_index(AXIS_X)
        mx = lax.axis_size(AXIS_X)
        new_min = jnp.where(xi == 0, 0.5 * (f_xmin + interp_min), f_xmin)
        new_max = jnp.where(xi == mx - 1, 0.5 * (f_xmax + interp_max), f_xmax)
        return new_min, new_max

    # -- sheared-periodic ghost fill at the domain x-borders -------------- #
    def fill_shear_x(self, Uyg, U_local, t):
        """Overwrite the x ghost columns of the domain-edge shards with the
        sheared remap (solvers/shear.make_boundaries_shear semantics, with
        global-y interpolation). ``Uyg`` is the local block already grown in
        y AND x (periodic rings); ``U_local`` the bare interior block."""
        gp = self.gp
        g = gp.ghost_width
        dy = gp.dy
        NY = gp.ny
        Lx = gp.xmax - gp.xmin
        Ly = gp.ymax - gp.ymin

        deltay = jnp.mod(1.5 * gp.omega0 * Lx * t, Ly)
        jplus = jnp.floor(deltay / dy).astype(jnp.int32)
        epsi = jnp.mod(deltay, dy)

        # border slabs (interior y, interior z) -> opposite edge, global y
        bmin = U_local[..., :g]
        bmax = U_local[..., -g:]
        bmax_here, bmin_here = _edge_swap_x(bmin, bmax)
        G_bmax = _gather_y(bmax_here, -2)    # (nvar, lnz, NY, g) on x==0
        G_bmin = _gather_y(bmin_here, -2)    # on x==mx-1
        # y-slopes on the global slab: roll wrap IS the periodic y BC
        S_bmax = slope_1d(gp, G_bmax, _Y)
        S_bmin = slope_1d(gp, G_bmin, _Y)

        yo = _y_offset(self.lny)
        lny2g = self.lny + 2 * g

        def remap(Gbuf, Gslope, base_shift, eps, lam, sign):
            """Remapped ghost slab over this shard's GHOSTED y rows.
            Global ghosted row j_glob = yo + j_loc maps to interior source
            row (j_glob + base_shift - g) mod NY; rolling by -(base_shift-g)
            then slicing [yo, yo+lny2g) from a (NY + ghosted overhang)-safe
            double cover implements the traced shift."""
            def rows(shift):
                rolled = jnp.roll(Gbuf, shift, axis=-2)
                rolled_s = jnp.roll(Gslope, shift, axis=-2)
                # double cover in y so the ghosted window never runs off
                twice = jnp.concatenate([rolled, rolled], axis=-2)
                twice_s = jnp.concatenate([rolled_s, rolled_s], axis=-2)
                b = lax.dynamic_slice_in_dim(twice, yo, lny2g, axis=-2)
                s = lax.dynamic_slice_in_dim(twice_s, yo, lny2g, axis=-2)
                return b, s

            b_r, s_r = rows(-(base_shift) + g)
            b_rp1, s_rp1 = rows(-(base_shift) + g - 1)
            interp = (1.0 - eps) * b_r + eps * b_rp1 + lam * sign * (s_r - s_rp1)
            by_form = b_r + eps * s_r   # conservative face-By form
            if gp.mhd:
                interp = jnp.concatenate(
                    [interp[:IB], by_form[IB : IB + 1], interp[IB + 1 :]]
                )
            return interp

        # XMIN ghosts <- XMAX border shifted down: source j - jplus - 1
        eps_min = 1.0 - epsi / dy
        lam_min = 0.5 * eps_min * (eps_min - 1.0)
        ghost_min = remap(G_bmax, S_bmax, -jplus - 1, eps_min, lam_min, +1.0)
        # XMAX ghosts <- XMIN border shifted up: source j + jplus
        eps_max = epsi / dy
        lam_max = 0.5 * eps_max * (eps_max - 1.0)
        ghost_max = remap(G_bmin, S_bmin, jplus, eps_max, lam_max, -1.0)

        # the ghost slabs cover interior-z rows only — this fill runs BEFORE
        # the Z exchange, so Uyg's z extent is still the bare interior
        xi = lax.axis_index(AXIS_X)
        mx = lax.axis_size(AXIS_X)
        Ug = Uyg
        Ug = Ug.at[..., :g].set(
            jnp.where(xi == 0, ghost_min, Ug[..., :g])
        )
        Ug = Ug.at[..., -g:].set(
            jnp.where(xi == mx - 1, ghost_max, Ug[..., -g:])
        )
        return Ug

    def fix_xmax_bx_face(self, Ug):
        """Reference keeps Bx in the FIRST XMAX ghost column: that face
        belongs to the last interior cell (make_boundary_shear.h:276-288).
        The interior-only carried state drops it, so reconstruct it from
        divB = 0 of the last interior column — exact to roundoff since CT
        keeps divB at zero:  bx_face = bx_left - dx*(dby/dy + dbz/dz).

        Runs on the FULLY grown block. The roll-based +1 reads are invalid
        only at the single topmost y/z ghost rows; the column's ghost bands
        are then replaced by ring-exchanged copies of the neighbors' own
        reconstructions (y first, then z, so corners propagate)."""
        from .halo import _ring_shift

        gp = self.gp
        g = gp.ghost_width
        xi = lax.axis_index(AXIS_X)
        mx = lax.axis_size(AXIS_X)
        bx_l = Ug[IA, :, :, -g - 1]
        by_c = Ug[IB, :, :, -g - 1]
        by_p = jnp.roll(Ug[IB], -1, -2)[:, :, -g - 1]
        bz_c = Ug[IC, :, :, -g - 1]
        bz_p = jnp.roll(Ug[IC], -1, -3)[:, :, -g - 1]
        col = bx_l - gp.dx * ((by_p - by_c) / gp.dy + (bz_p - bz_c) / gp.dz)
        # band exchanges along the y then z rings (thin [g]-wide strips)
        col = col.at[:, -g:].set(_ring_shift(col[:, g : 2 * g], AXIS_Y, up=False))
        col = col.at[:, :g].set(_ring_shift(col[:, -2 * g : -g], AXIS_Y, up=True))
        col = col.at[-g:, :].set(_ring_shift(col[g : 2 * g, :], AXIS_Z, up=False))
        col = col.at[:g, :].set(_ring_shift(col[-2 * g : -g, :], AXIS_Z, up=True))
        return Ug.at[IA, :, :, -g].set(
            jnp.where(xi == mx - 1, col, Ug[IA, :, :, -g])
        )


def attach_halos_shear(params: RunParams, gparams: RunParams, U, t,
                       comm: ShardedShearComm):
    """Ghosted local block for a shearing-box step: periodic Y ring, X ring
    with the sheared remap overriding the domain-edge ghosts, then the Z
    exchange (reference ordering: make_all_boundaries_shear =
    Y -> shear X -> Z). The Z boundary may be periodic or the stratified-MRI
    special fill (BC_Z_STRATIFIED): the ring exchange runs either way and
    the z-edge shards override their outer ghosts with the stratified fill,
    evaluated with the GLOBAL domain z bounds (the hydrostatic extrapolation
    ratios depend on zmin/zmax, which the local params view rescales)."""
    from ..core.constants import BoundaryConditionType as BCT
    from ..solvers.boundary import _fill_side
    from .halo import attach_halos_axis

    Ug = attach_halos_axis(params, U, _Y, BCT.BC_PERIODIC, BCT.BC_PERIODIC)
    Ug = attach_halos_axis(params, Ug, _X, BCT.BC_PERIODIC, BCT.BC_PERIODIC)
    Ug = comm.fill_shear_x(Ug, U, t)
    if params.dim == 3:
        Ug = attach_halos_axis(params, Ug, _Z, BCT.BC_PERIODIC, BCT.BC_PERIODIC)
    if params.mhd:
        Ug = comm.fix_xmax_bx_face(Ug)
    if params.dim == 3:
        # the stratified z override comes last, matching the single-device
        # Y -> shear X -> Z ordering where the Z fill covers the x-ghost
        # columns (and the reconstructed face column's z-ghost bands)
        zi = lax.axis_index(AXIS_Z)
        mz = lax.axis_size(AXIS_Z)
        if gparams.boundary_zmin == BCT.BC_Z_STRATIFIED:
            # params view whose z window ENDS at the global bound while the
            # derived dz stays that of the global grid (dz = (zmax-zmin)/nz)
            pmin = params.replace(
                zmin=gparams.zmin,
                zmax=gparams.zmin + params.nz * gparams.dz,
            )
            filled = _fill_side(pmin, Ug, _Z, False, BCT.BC_Z_STRATIFIED)
            Ug = jnp.where(zi == 0, filled, Ug)
        if gparams.boundary_zmax == BCT.BC_Z_STRATIFIED:
            pmax = params.replace(
                zmin=gparams.zmax - params.nz * gparams.dz,
                zmax=gparams.zmax,
            )
            filled = _fill_side(pmax, Ug, _Z, True, BCT.BC_Z_STRATIFIED)
            Ug = jnp.where(zi == mz - 1, filled, Ug)
    return Ug
