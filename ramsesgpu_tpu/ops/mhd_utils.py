"""MHD wave-speed helpers (whole-array).

Re-design of the reference's per-cell utilities, themselves from
RAMSES/DUMSES (reference: src/hydro/mhd_utils.h:29-318).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP


def fast_magnetosonic_speed_dir(params: RunParams, Q: jnp.ndarray, bn: jnp.ndarray):
    """Fast magnetosonic speed given the normal field component ``bn``
    (mhd_utils.h:30-52)."""
    d = Q[ID]
    p = Q[IP]
    b2 = Q[IA] ** 2 + Q[IB] ** 2 + Q[IC] ** 2
    c2 = params.gamma0 * p / d
    d2 = 0.5 * (b2 / d + c2)
    return jnp.sqrt(d2 + jnp.sqrt(jnp.maximum(d2 * d2 - c2 * bn * bn / d, 0.0)))


def fast_magnetosonic_speeds(params: RunParams, Q: jnp.ndarray):
    """(cf_x, cf_y, cf_z) over the whole array."""
    return (
        fast_magnetosonic_speed_dir(params, Q, Q[IA]),
        fast_magnetosonic_speed_dir(params, Q, Q[IB]),
        fast_magnetosonic_speed_dir(params, Q, Q[IC]),
    )
