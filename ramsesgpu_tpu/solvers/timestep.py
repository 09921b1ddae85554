"""CFL time-step computation.

Re-design of the reference's block-reduction kernels
(reference: src/hydro/cmpdt.cuh:43-230, cmpdt_mhd.cuh, HydroRunBase.cpp:314-426).
On TPU the shared-memory tree reduction collapses to a single fused
``jnp.max`` that XLA lowers to an optimal on-chip reduction; distributed runs
wrap this in ``lax.pmax`` (see parallel/).

dt = cfl / max over interior cells of sum_d (c_d + |v_d|)/dx_d, where c is
the sound speed (hydro) or fast magnetosonic speed per direction (MHD).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW
from ..ops.eos import constoprim_hydro
from ..ops.mhd_utils import fast_magnetosonic_speeds


def _interior(params: RunParams, a: jnp.ndarray, ghost=None) -> jnp.ndarray:
    """``ghost`` overrides the frame width: an int (uniform) or a per-axis
    tuple ((z,) y, x); 0 means no ghosts along that axis (the packed Pallas
    state has no x ghosts, pallas/fused_mhd3d.py)."""
    g = params.ghost_width if ghost is None else ghost
    if isinstance(g, int):
        g = (g,) * params.dim
    sl = tuple(slice(gi, -gi) if gi else slice(None) for gi in g)
    return a[(..., *sl)]


def compute_inv_dt_hydro(
    params: RunParams, U: jnp.ndarray, ghost: int | None = None
) -> jnp.ndarray:
    """Max inverse time step over the local interior (cmpdt.cuh:84-86,179-182).

    ``ghost`` overrides the ghost frame width of U (the overlapped sharded
    path passes blocks thinner than params.ghost_width, parallel/overlap.py).
    """
    # fused expression chain (the MHD twin's design, below): the
    # constoprim_hydro call stacks a full primitive array, which XLA
    # materializes in HBM — measured 4.9 ms of the 57 ms implode step at
    # 256^3. Written flat, the same formulas lower to a single read of U
    # + reduction (bit-identical values: identical op order per cell).
    rho = jnp.maximum(U[ID], params.smallr)
    u = U[IU] / rho
    v = U[IV] / rho
    w = U[IW] / rho if params.dim == 3 else None
    if params.c_iso > 0:
        c = jnp.full_like(rho, params.c_iso)
    else:
        eken2 = u * u + v * v
        if params.dim == 3:
            eken2 = eken2 + w * w
        eken = 0.5 * eken2
        eint = U[IP] / rho - eken
        p = jnp.maximum(
            (params.gamma0 - 1.0) * rho * eint, rho * params.smallp
        )
        c = jnp.sqrt(params.gamma0 * p / rho)
    inv = (c + jnp.abs(u)) / params.dx + (c + jnp.abs(v)) / params.dy
    if params.dim == 3:
        inv = inv + (c + jnp.abs(w)) / params.dz
    return jnp.max(_interior(params, inv, ghost))


def compute_inv_dt_mhd(
    params: RunParams, U: jnp.ndarray, ghost: int | None = None
) -> jnp.ndarray:
    """MHD version using the fast magnetosonic speed per direction, with the
    shearing-box correction vy += 1.5*Omega0*dx/2 (cmpdt_mhd.cuh:188-213).

    Written as one fused expression chain (no stacked primitive array) so
    XLA lowers it to a single read of U + reduction.
    """
    from ..core.constants import IA, IB, IC
    from ..ops.stencil import shift_p

    rho = jnp.maximum(U[0], params.smallr)
    u = U[IU] / rho
    v = U[IV] / rho
    w = U[IW] / rho
    bx = 0.5 * (U[IA] + shift_p(U[IA], -1))
    by = 0.5 * (U[IB] + shift_p(U[IB], -2 if params.dim == 2 else -2))
    if params.dim == 3:
        bz = 0.5 * (U[IC] + shift_p(U[IC], -3))
    else:
        bz = U[IC]
    if params.c_iso > 0:
        p = rho * params.c_iso**2
    else:
        eken = 0.5 * (u * u + v * v + w * w)
        emag = 0.5 * (bx * bx + by * by + bz * bz)
        eint = (U[IP] - emag) / rho - eken
        p = jnp.maximum((params.gamma0 - 1.0) * rho * eint, rho * params.smallp)

    b2 = bx * bx + by * by + bz * bz
    c2 = params.gamma0 * p / rho
    d2 = 0.5 * (b2 / rho + c2)

    def cf(bn):
        return jnp.sqrt(d2 + jnp.sqrt(jnp.maximum(d2 * d2 - c2 * bn * bn / rho, 0.0)))

    vy = v
    if params.omega0 > 0:
        vy = vy + 1.5 * params.omega0 * params.dx / 2.0
    inv = (cf(bx) + jnp.abs(u)) / params.dx + (cf(by) + jnp.abs(vy)) / params.dy
    if params.dim == 3:
        inv = inv + (cf(bz) + jnp.abs(w)) / params.dz
    return jnp.max(_interior(params, inv, ghost))


def _inv_dt_mhd_fields(params: RunParams, rho, eP, u, v, w, bx, by, bz):
    """Max inverse dt from interior-extent fields (cell-centered B)."""
    rho = jnp.maximum(rho, params.smallr)
    if params.c_iso > 0:
        p = rho * params.c_iso**2
    else:
        eken = 0.5 * (u * u + v * v + w * w)
        emag = 0.5 * (bx * bx + by * by + bz * bz)
        eint = (eP - emag) / rho - eken
        p = jnp.maximum((params.gamma0 - 1.0) * rho * eint, rho * params.smallp)

    b2 = bx * bx + by * by + bz * bz
    c2 = params.gamma0 * p / rho
    d2 = 0.5 * (b2 / rho + c2)

    def cf(bn):
        return jnp.sqrt(d2 + jnp.sqrt(jnp.maximum(d2 * d2 - c2 * bn * bn / rho, 0.0)))

    vy = v
    if params.omega0 > 0:
        vy = vy + 1.5 * params.omega0 * params.dx / 2.0
    inv = (
        (cf(bx) + jnp.abs(u)) / params.dx
        + (cf(by) + jnp.abs(vy)) / params.dy
        + (cf(bz) + jnp.abs(w)) / params.dz
    )
    return jnp.max(inv)


def compute_inv_dt_mhd_packed(
    params: RunParams, P: jnp.ndarray, y0: int | None = None
) -> jnp.ndarray:
    """compute_inv_dt_mhd specialized to the packed Pallas-loop state
    [nvar, nz+2g, ny+2*y0, nx] (z wrap-ghosted by g, y by ``y0`` rows, x
    ghost-free periodic — pallas/fused_mhd3d.make_pallas_advance_n).

    Equivalent to ``compute_inv_dt_mhd(params, interior, ghost=0)`` on the
    interior bit-for-bit, but the +1 face-B shifts in z/y are SLICES of the
    ghosted buffer instead of jnp.roll — XLA fuses slices into the reduction
    where a roll (lowered to concat) materializes a full-array copy; only
    the x direction needs one single-component roll (periodic in-row wrap).
    """
    g = params.ghost_width
    nz, ny = params.nz, params.ny
    if y0 is None:
        y0 = g
    from ..core.constants import IA, IB, IC

    zi, yi = slice(g, g + nz), slice(y0, y0 + ny)
    rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
    ia = P[IA, zi, yi, :]
    return _inv_dt_mhd_fields(
        params,
        P[ID, zi, yi, :],
        P[IP, zi, yi, :],
        P[IU, zi, yi, :] / rho,
        P[IV, zi, yi, :] / rho,
        P[IW, zi, yi, :] / rho,
        0.5 * (ia + jnp.roll(ia, -1, -1)),
        0.5 * (P[IB, zi, yi, :] + P[IB, zi, y0 + 1 : y0 + ny + 1, :]),
        0.5 * (P[IC, zi, yi, :] + P[IC, g + 1 : g + nz + 1, yi, :]),
    )


def compute_inv_dt_mhd_packed_seams(
    params: RunParams, P: jnp.ndarray, tiles: tuple[int, int],
    y0: int | None = None,
) -> jnp.ndarray:
    """CFL max over the TILE-SEAM cells of the packed state: the top z
    plane of every (bz)-tile row and the last y row of every (by)-tile
    column — the cells the packed kernel's in-tile reduction
    (packed_io.make_packed_io_step with_inv_dt_mhd) skips because their
    +1 faces live in a neighbor tile. Their +1 shifts read the fresh
    in-kernel wrap ghosts, so no wrap special-casing. max() is idempotent
    and exactly associative: max(in-kernel partial, this) ==
    compute_inv_dt_mhd_packed bit-for-bit (the overlap at seam
    intersections is harmless)."""
    g = params.ghost_width
    nz, ny = params.nz, params.ny
    bz, by = tiles
    if y0 is None:
        y0 = g
    from ..core.constants import IA, IB, IC

    def inv_of(zi, yi, zp, yp):
        rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
        ia = P[IA, zi, yi, :]
        return _inv_dt_mhd_fields(
            params,
            P[ID, zi, yi, :],
            P[IP, zi, yi, :],
            P[IU, zi, yi, :] / rho,
            P[IV, zi, yi, :] / rho,
            P[IW, zi, yi, :] / rho,
            0.5 * (ia + jnp.roll(ia, -1, -1)),
            0.5 * (P[IB, zi, yi, :] + P[IB, zi, yp, :]),
            0.5 * (P[IC, zi, yi, :] + P[IC, zp, yi, :]),
        )

    # top plane of every z-tile (incl. the z-wrap plane nz-1: its +1 is
    # the fresh ghost plane g+nz), full y interior
    zs = slice(g + bz - 1, g + nz, bz)
    zs_p = slice(g + bz, g + nz + 1, bz)
    inv = inv_of(zs, slice(y0, y0 + ny), zs_p, slice(y0 + 1, y0 + ny + 1))
    # last row of every y-tile, full z interior
    ys = slice(y0 + by - 1, y0 + ny, by)
    ys_p = slice(y0 + by, y0 + ny + 1, by)
    return jnp.maximum(
        inv,
        inv_of(slice(g, g + nz), ys, slice(g + 1, g + nz + 1), ys_p),
    )


def compute_inv_dt_mhd_ghosted(params: RunParams, U: jnp.ndarray) -> jnp.ndarray:
    """compute_inv_dt_mhd on a fully-ghosted 3D state with EVERY +1 face-B
    shift taken as a slice of the ghost frame (no rolls at all — the rolls
    in compute_inv_dt_mhd each materialize a full-array copy on TPU).
    Bit-identical to ``compute_inv_dt_mhd(params, U)``."""
    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    from ..core.constants import IA, IB, IC

    zi, yi, xi = slice(g, g + nz), slice(g, g + ny), slice(g, g + nx)
    rho = jnp.maximum(U[ID, zi, yi, xi], params.smallr)
    return _inv_dt_mhd_fields(
        params,
        U[ID, zi, yi, xi],
        U[IP, zi, yi, xi],
        U[IU, zi, yi, xi] / rho,
        U[IV, zi, yi, xi] / rho,
        U[IW, zi, yi, xi] / rho,
        0.5 * (U[IA, zi, yi, xi] + U[IA, zi, yi, g + 1 : g + nx + 1]),
        0.5 * (U[IB, zi, yi, xi] + U[IB, zi, g + 1 : g + ny + 1, xi]),
        0.5 * (U[IC, zi, yi, xi] + U[IC, g + 1 : g + nz + 1, yi, xi]),
    )


def compute_dt(params: RunParams, U: jnp.ndarray) -> jnp.ndarray:
    """cfl / max(invDt), as in HydroRunBase::compute_dt (HydroRunBase.cpp:314-426)."""
    if params.mhd:
        inv_dt = compute_inv_dt_mhd(params, U)
    else:
        inv_dt = compute_inv_dt_hydro(params, U)
    if params.problem in ("jet", "Jet") and params.ijet > 0:
        # account for the inflow jet speed (HydroRunBase.cpp:365-367)
        import math

        cjet = math.sqrt(params.gamma0 * params.pjet / params.djet)
        inv_dt = jnp.maximum(inv_dt, (params.ujet + cjet) / params.dx)
    return params.cfl / inv_dt
