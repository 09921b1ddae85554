"""Stencil shift helpers for whole-array finite-volume numerics.

The reference expresses every numeric routine per-cell and loops/launches
around it (src/hydro/godunov_unsplit.cuh, *_cpu_v*.cpp). On TPU the idiomatic
form is the opposite: every routine is a whole-array jnp expression, and
neighbor access is an array *shift*. XLA then fuses the resulting elementwise
DAG into large VPU kernels, which replaces the CUDA shared-memory tiling.

Shifts are implemented with ``jnp.roll``: ghost layers (width >= 2) guarantee
that the ring of cells corrupted by wrap-around is never consumed by the
interior update, so no padding or masking is needed and all shapes stay
static (required for jit).
"""
from __future__ import annotations

import jax.numpy as jnp


def shift_p(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Value at the next cell along ``axis``: out[i] = a[i+1]."""
    return jnp.roll(a, -1, axis=axis)


def shift_m(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Value at the previous cell along ``axis``: out[i] = a[i-1]."""
    return jnp.roll(a, 1, axis=axis)


def shift(a: jnp.ndarray, axis: int, offset: int) -> jnp.ndarray:
    """out[i] = a[i+offset] along ``axis`` (wraps; ghosts absorb the wrap)."""
    return jnp.roll(a, -offset, axis=axis)
