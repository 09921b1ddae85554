"""Halo-exchange / compute overlap for the sharded step.

The reference's halo exchange is fully synchronous (pack -> D2H ->
MPI_Sendrecv -> H2D -> unpack, reference: src/hydro/HydroRunBaseMpi.cpp:3294-3760)
with zero overlap — doc/main.h lists communication/computation overlap as
future work, and BASELINE.md makes it an explicit improvement target.

Design — cells further than the stencil reach r (= ghost_width) from the
shard boundary depend only on shard-local data, so the step splits into
data-independent dataflow branches XLA's latency-hiding scheduler can run
concurrently:

  1. dt chain:  a THIN exchange (one high-side layer of the face-B
     components only — the sole halo data compute_inv_dt_mhd reads) feeds
     the inv-dt reduction and the scalar pmax. Tiny payload, clears early.
     For hydro the inv-dt pass reads no ghosts at all, so dt is purely
     local + one scalar pmax.
  2. bulk exchange: the full ghost_width ppermute rings (attach_halos) —
     the big payload, independent of the dt chain.
  3. deep update: interior cells [r, n-r) computed from the local block
     alone + dt — the ~(1 - 6r/n) volume bulk of the FLOPs, overlapping
     the in-flight bulk exchange.
  4. shells: six thin slabs (surface work) from the halo'd block once the
     collectives land.

The result is cell-for-cell identical to the non-overlapped step: the deep
window semantics mirror the fused Pallas kernel's tiled windows (margin =
ghost_width, validated bitwise in tests/test_pallas.py), and max() is an
exact reduction so the thin-exchange dt is bit-identical too.

Enabled with [implementation] haloOverlap=yes (3D; MHD additionally needs
all-periodic boundaries, omega0 == nu == eta == 0).
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC
from ..core.constants import BoundaryConditionType as BCT
from .mesh import AXIS_X, AXIS_Y, AXIS_Z


def overlap_supported(params: RunParams, local_dims: tuple[int, int, int]) -> bool:
    """Whether the overlapped local step applies to this configuration.

    ``local_dims`` = per-shard (nz, ny, nx): every axis must leave a
    non-degenerate deep region (> 2*ghost_width cells).
    """
    g = params.ghost_width
    if params.dim != 3:
        return False
    if any(n <= 2 * g for n in local_dims):
        return False
    if params.mhd:
        # the deep/shell regions use the plain-stencil interior update and
        # the thin dt exchange assumes periodic rings
        return (
            params.omega0 == 0.0
            and params.nu == 0.0
            and params.eta == 0.0
            and all(b == BCT.BC_PERIODIC for b in params.boundary_types)
        )
    return params.nu == 0.0


def _ext_params(params: RunParams, ext: tuple[int, int, int]) -> RunParams:
    """Params view with region extents, domain bounds adjusted so the
    *derived* dx/dy/dz stay identical to the global grid."""
    ez, ey, ex = ext
    return params.replace(
        nz=ez, ny=ey, nx=ex,
        zmax=params.zmin + ez * params.dz,
        ymax=params.ymin + ey * params.dy,
        xmax=params.xmin + ex * params.dx,
    )


def overlapped_interior_update(
    params: RunParams,
    U_local: jnp.ndarray,       # interior-only local block [nvar, nz, ny, nx]
    U_ghosted: jnp.ndarray,     # fully halo'd block (post-ppermute)
    update_region: Callable,    # (window, (nz,ny,nx) extents) -> new region
    deep_fn: Callable | None = None,  # optional override: (U_local) -> deep
) -> jnp.ndarray:
    """New interior of a shard, deep/shell split (3D).

    ``update_region(win, ext)`` must return the updated interior of a
    window carrying ghost_width cells of context on every side (margin =
    ghost_width — the same window contract as the fused Pallas kernel's
    tiles, fused_mhd3d.py). ``deep_fn`` overrides the deep-region update
    (e.g. the fused Pallas kernel, parallel/sharded_step.py) — it receives
    the raw local block and must return the [nz-2g, ny-2g, nx-2g] deep
    interior.
    """
    g = params.ghost_width
    r = g  # stencil reach == ghost width
    nv = U_local.shape[0]
    nz, ny, nx = U_local.shape[1:]

    # deep region [r, n-r): its window with margin g is exactly U_local —
    # in-window roll wrap corrupts only cells the deep slice never keeps
    if deep_fn is not None:
        deep = deep_fn(U_local)
    else:
        deep = update_region(U_local, (nz - 2 * r, ny - 2 * r, nx - 2 * r))

    out = jnp.zeros((nv, nz, ny, nx), U_local.dtype)
    out = out.at[:, r:-r, r:-r, r:-r].set(deep)

    # six boundary shells from the halo'd block (wait on the collectives);
    # windows carry true g-halos on every side. Shells overlap at edges and
    # corners — each computes the same halo-correct values, last write wins.
    for z0, zext in ((0, r), (nz - r, r)):          # z shells: full y/x extent
        win = U_ghosted[:, z0 : z0 + zext + 2 * g, :, :]
        out = out.at[:, z0 : z0 + zext, :, :].set(
            update_region(win, (zext, ny, nx)))
    for y0, yext in ((0, r), (ny - r, r)):          # y shells: full z/x extent
        win = U_ghosted[:, :, y0 : y0 + yext + 2 * g, :]
        out = out.at[:, :, y0 : y0 + yext, :].set(
            update_region(win, (nz, yext, nx)))
    for x0, xext in ((0, r), (nx - r, r)):          # x shells
        win = U_ghosted[:, :, :, x0 : x0 + xext + 2 * g]
        out = out.at[:, :, :, x0 : x0 + xext].set(
            update_region(win, (nz, ny, xext)))
    return out


def overlap_report(params: RunParams, local_dims: tuple[int, int, int]) -> dict:
    """Structural overlap figures (BASELINE.md metric — the reference is 0%,
    fully synchronous): fraction of the update FLOPs that proceed without
    waiting for the bulk halo exchange, and the per-step per-shard exchange
    volumes. Actual wall-clock overlap depends on XLA's latency-hiding
    schedule on the target topology."""
    g = params.ghost_width
    nz, ny, nx = local_dims
    deep = max(nz - 2 * g, 0) * max(ny - 2 * g, 0) * max(nx - 2 * g, 0)
    total = nz * ny * nx
    itemsize = 8 if params.dtype == "float64" else 4
    nv = params.nb_var
    # sequenced X->Y->Z exchange: later axes carry the already-grown block
    bulk_cells = 2 * g * (
        nz * ny + nz * (nx + 2 * g) + (ny + 2 * g) * (nx + 2 * g)
    )
    thin_cells = (nz * ny + nz * nx + ny * nx) if params.mhd else 0
    return {
        "deep_fraction": deep / total,
        "bulk_exchange_bytes": bulk_cells * nv * itemsize,
        "dt_exchange_bytes": thin_cells * itemsize,
    }


def local_inv_dt(params: RunParams, U_local: jnp.ndarray) -> jnp.ndarray:
    """Per-shard max inverse dt WITHOUT the bulk halo exchange.

    Hydro's inv-dt pass is elementwise over the interior — no ghosts read.
    MHD's face-B averaging (compute_inv_dt_mhd) reads exactly one high-side
    ghost layer of IA (x), IB (y), IC (z); fetch those three one-layer,
    one-component slabs via dedicated ppermutes (periodic rings — gated by
    overlap_supported). max() is exact, so the result is bit-identical to
    the inv-dt computed from the fully halo'd block.
    """
    from ..solvers.timestep import compute_inv_dt_hydro, compute_inv_dt_mhd
    from .halo import _ring_shift

    if not params.mhd:
        return compute_inv_dt_hydro(params, U_local, ghost=0)

    # wrap-pad by one: for single-shard axes the wrap IS the periodic ghost;
    # multi-shard axes get the true layer from the +1 neighbor below
    Up = jnp.pad(U_local, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="wrap")
    ia_hi = _ring_shift(U_local[IA, :, :, 0], AXIS_X, up=False)
    ib_hi = _ring_shift(U_local[IB, :, 0, :], AXIS_Y, up=False)
    ic_hi = _ring_shift(U_local[IC, 0, :, :], AXIS_Z, up=False)
    Up = Up.at[IA, 1:-1, 1:-1, -1].set(ia_hi)
    Up = Up.at[IB, 1:-1, -1, 1:-1].set(ib_hi)
    Up = Up.at[IC, -1, 1:-1, 1:-1].set(ic_hi)
    return compute_inv_dt_mhd(params, Up, ghost=1)
