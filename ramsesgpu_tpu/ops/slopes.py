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


def slope_1d(params: RunParams, q: jnp.ndarray, axis: int, xp=None) -> jnp.ndarray:
    """Limited slope of q along ``axis`` (slope.h:96-147 inner loop).

    dlft = slope_type * (q_i - q_{i-1}); drgt = slope_type * (q_{i+1} - q_i);
    dcen = (q_{i+1} - q_{i-1}) / 2; result = sign(dcen) * min(|dlft|, |drgt|,
    |dcen|), zeroed at extrema.
    """
    if xp is None:
        from .backend import JNP as xp
    if params.slope_type == 0 or params.iorder == 1:
        return xp.zeros_like(q)
    q_p = xp.shift_p(q, axis)
    q_m = xp.shift_m(q, axis)
    dlft = params.slope_type * (q - q_m)
    drgt = params.slope_type * (q_p - q)
    dcen = 0.5 * (q_p - q_m)
    dsgn = xp.where(dcen >= 0.0, 1.0, -1.0).astype(q.dtype)
    dlim = xp.minimum(xp.abs(dlft), xp.abs(drgt))
    dlim = xp.where(dlft * drgt <= 0.0, 0.0, dlim)
    return dsgn * xp.minimum(dlim, xp.abs(dcen))


def slopes_unsplit(params: RunParams, Q, xp=None) -> tuple:
    """Slopes in every direction for the unsplit scheme.

    Returns (dqX, dqY) in 2D or (dqX, dqY, dqZ) in 3D, each with the shape of
    Q. Matches slope_unsplit_hydro_2d / slope_unsplit_3d (slope.h:96-147 and
    the 3D twin) for slope_type in {0, 1, 2}.
    """
    dqx = slope_1d(params, Q, axis=-1, xp=xp)
    dqy = slope_1d(params, Q, axis=-2, xp=xp)
    if params.dim == 2:
        return dqx, dqy
    dqz = slope_1d(params, Q, axis=-3, xp=xp)
    return dqx, dqy, dqz
