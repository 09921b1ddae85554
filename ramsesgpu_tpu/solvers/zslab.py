"""Z-slab pipelining: bound the 3D scheme's scratch memory.

The TPU rebirth of the reference's z-slab method
(reference: src/hydro/{Hydro,MHD}RunGodunovZslab.cpp, zSlabInfo.h:30-38;
~(164/nPiece + 16) B/cell vs ~180 B/cell, memory_footprint.py:10-21):
instead of duplicating every kernel with a ZslabInfo window, we run the
*unchanged* whole-array update on a z-window inside ``lax.fori_loop``.
XLA then keeps only one slab's intermediates (trace states, edge states,
fluxes, EMFs) live at a time — O(nz / zSlabNb) scratch — which is what lets
256^3+ MHD fit a single chip, exactly as the z-slab method enabled 2000^3
runs in the reference (ChangeLog:34-38).

Each slab window carries the full ghost width on both z-sides and writes
back exactly its own nz/zSlabNb planes, so the result is bitwise identical
to the monolithic update.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

from ..config.params import RunParams

_Z = -3


def zslab_apply(
    params: RunParams,
    U: jnp.ndarray,
    update_fn: Callable[..., jnp.ndarray],
    n_slabs: int,
    aux: tuple[jnp.ndarray, ...] = (),
) -> jnp.ndarray:
    """Apply ``update_fn`` (a whole-array ghosted update like the Godunov
    step) slab-by-slab along z.

    ``update_fn`` must write only the ghost-interior of its input (which is
    what the Godunov/CT updates do); reads extend ghost_width cells beyond.

    ``aux`` arrays (e.g. a static ghosted gravity field, the reference's
    gravity_zslab.cuh window argument) are sliced to the same z-window and
    passed as extra positional arguments: ``update_fn(window, *aux_windows)``.
    """
    g = params.ghost_width
    nz = U.shape[_Z] - 2 * g
    if n_slabs <= 1:
        return update_fn(U, *aux)
    if nz % n_slabs:
        raise ValueError(f"nz={nz} not divisible by zSlabNb={n_slabs}")
    bz = nz // n_slabs

    def body(s, U_new):
        k0 = g + s * bz
        window = lax.dynamic_slice_in_dim(U, k0 - g, bz + 2 * g, axis=_Z)
        aux_windows = tuple(
            lax.dynamic_slice_in_dim(a, k0 - g, bz + 2 * g, axis=_Z)
            for a in aux
        )
        updated = update_fn(window, *aux_windows)
        slab = lax.dynamic_slice_in_dim(updated, g, bz, axis=_Z)
        return lax.dynamic_update_slice_in_dim(U_new, slab, k0, axis=_Z)

    return lax.fori_loop(0, n_slabs, body, U)
