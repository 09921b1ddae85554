"""TVD slope limiters, whole-array.

Re-design of the reference's per-cell slope routines
(reference: src/hydro/slope.h:41-147): the generalized-minmod limiter with
``slope_type`` in {0: zero, 1: minmod, 2: moncen/van-Leer-style}. The split
and unsplit variants share the same 1D formula, applied per direction.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from .stencil import shift_m, shift_p


def slope_1d(params: RunParams, q: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Limited slope of q along ``axis`` (slope.h:96-147 inner loop).

    dlft = slope_type * (q_i - q_{i-1}); drgt = slope_type * (q_{i+1} - q_i);
    dcen = (q_{i+1} - q_{i-1}) / 2; result = sign(dcen) * min(|dlft|, |drgt|,
    |dcen|), zeroed at extrema.
    """
    if params.slope_type == 0 or params.iorder == 1:
        return jnp.zeros_like(q)
    q_p = shift_p(q, axis)
    q_m = shift_m(q, axis)
    dlft = params.slope_type * (q - q_m)
    drgt = params.slope_type * (q_p - q)
    dcen = 0.5 * (q_p - q_m)
    dsgn = jnp.where(dcen >= 0.0, 1.0, -1.0).astype(q.dtype)
    dlim = jnp.minimum(jnp.abs(dlft), jnp.abs(drgt))
    dlim = jnp.where(dlft * drgt <= 0.0, 0.0, dlim)
    return dsgn * jnp.minimum(dlim, jnp.abs(dcen))


def slopes_unsplit(params: RunParams, Q: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Slopes in every direction for the unsplit scheme.

    Returns (dqX, dqY) in 2D or (dqX, dqY, dqZ) in 3D, each with the shape of
    Q. Matches slope_unsplit_hydro_2d / slope_unsplit_3d (slope.h:96-147 and
    the 3D twin) for slope_type in {0, 1, 2}.
    """
    dqx = slope_1d(params, Q, axis=-1)
    dqy = slope_1d(params, Q, axis=-2)
    if params.dim == 2:
        return dqx, dqy
    dqz = slope_1d(params, Q, axis=-3)
    return dqx, dqy, dqz
