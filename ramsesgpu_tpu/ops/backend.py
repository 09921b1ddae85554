"""Pluggable array backends for the stencil numerics.

The finite-volume pipeline (eos -> slopes -> trace -> Riemann -> EMF ->
update) is written against a tiny namespace ``xp`` instead of raw ``jnp``
so the same formulas run in two modes:

- ``JNP`` (default): plain whole-array jnp with jnp.roll shifts — the XLA
  path. Roll-wrap corruption at array edges is absorbed by ghost margins.

- ``BoxBackend``: every intermediate carries an explicit validity box in
  the (z, y) window coordinates of a Pallas kernel tile. Shifts translate
  the box instead of wrapping; binary ops intersect boxes and slice both
  operands to the overlap. Intermediates therefore SHRINK as the stencil
  chain progresses — the kernel computes each stage only on the extent
  later stages actually consume, instead of the full halo'd window (a
  2.2x FLOP overhead at (8,32) tiles). The x axis is never boxed: rows
  stay full lane width so x-shifts remain in-row rolls (and in periodic-x
  mode the row wrap IS the x boundary condition).

This replaces the reference's hand-tuned per-kernel loop bounds
(reference: src/hydro/godunov_unsplit_mhd.cuh — each CUDA kernel guards
its own shrinking i/j ranges) with mechanical box inference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from .stencil import shift_m as _shift_m, shift_p as _shift_p

_Z, _Y, _X = -3, -2, -1


class JnpBackend:
    """Pass-through backend: plain jnp + roll shifts."""

    sqrt = staticmethod(jnp.sqrt)
    abs = staticmethod(jnp.abs)
    isnan = staticmethod(jnp.isnan)
    clip = staticmethod(jnp.clip)
    ones_like = staticmethod(jnp.ones_like)
    maximum = staticmethod(jnp.maximum)
    minimum = staticmethod(jnp.minimum)
    where = staticmethod(jnp.where)
    sign = staticmethod(jnp.sign)
    logical_and = staticmethod(jnp.logical_and)
    full_like = staticmethod(jnp.full_like)
    zeros_like = staticmethod(jnp.zeros_like)
    stack = staticmethod(jnp.stack)
    shift_p = staticmethod(_shift_p)
    shift_m = staticmethod(_shift_m)

    @staticmethod
    def rsqrt(a):
        import jax

        return jax.lax.rsqrt(a)

    @staticmethod
    def pin(a):
        """Materialization point: stops XLA's algebraic simplifier from
        folding/duplicating through ``a`` (slice-of-concat re-splitting,
        fusion recompute into multiple roots)."""
        import jax

        return jax.lax.optimization_barrier(a)

    @staticmethod
    def crop(a, z0, z1, y0, y1, x0, x1):
        """Window-coordinate crop (z/y/x ranges in the array's own frame)."""
        return a[..., z0:z1, y0:y1, x0:x1]

    @staticmethod
    def set_component(q, idx, val):
        """Replace component ``idx`` of a stacked state (scatter-free form so
        it also lowers inside Pallas kernels)."""
        return jnp.stack([val if i == idx else q[i] for i in range(q.shape[0])])


JNP = JnpBackend()


class SwapXYJnpBackend(JnpBackend):
    """JNP backend for arrays stored [..., z, x, y]: logical-x stencil ops
    act on axis -2 and logical-y ops on axis -1. Used by the shear-packed
    strip pass (pallas/shear_packed.py): the 18-column border strip is
    transposed so its wide y extent rides the 128-lane minor dim — in
    [z, y, x] order XLA pads the 18-column minor dim to 128 lanes and the
    strip costs as much as a full-array pass."""

    @staticmethod
    def _ax(axis: int) -> int:
        return {-1: -2, -2: -1, -3: -3}[axis]

    @staticmethod
    def shift_p(a, axis):
        return _shift_p(a, SwapXYJnpBackend._ax(axis))

    @staticmethod
    def shift_m(a, axis):
        return _shift_m(a, SwapXYJnpBackend._ax(axis))

    @staticmethod
    def crop(a, z0, z1, y0, y1, x0, x1):
        return a[..., z0:z1, x0:x1, y0:y1]


JNP_T = SwapXYJnpBackend()


@dataclass(frozen=True, eq=False)
class BoxField:
    """An array plus the (z, y) window box where its values are valid.

    value[..., a, b, :] is the field at window coords (oz + a, oy + b).
    The x axis is always full width (lane dimension, in-row rolls).
    """

    value: Any  # jnp array [..., ze, ye, wx]
    oz: int
    oy: int

    @property
    def ze(self) -> int:
        return self.value.shape[-3]

    @property
    def ye(self) -> int:
        return self.value.shape[-2]

    @property
    def dtype(self):
        return self.value.dtype

    def __getitem__(self, idx):
        # leading-axis (component) indexing only — boxes are untouched
        return BoxField(self.value[idx], self.oz, self.oy)

    def astype(self, dtype):
        return BoxField(self.value.astype(dtype), self.oz, self.oy)

    # -- arithmetic (box intersection happens in _binary) ----------------- #
    def __add__(self, o):  return _binary(jnp.add, self, o)
    def __radd__(self, o): return _binary(jnp.add, o, self)
    def __sub__(self, o):  return _binary(jnp.subtract, self, o)
    def __rsub__(self, o): return _binary(jnp.subtract, o, self)
    def __mul__(self, o):  return _binary(jnp.multiply, self, o)
    def __rmul__(self, o): return _binary(jnp.multiply, o, self)
    def __truediv__(self, o):  return _binary(jnp.divide, self, o)
    def __rtruediv__(self, o): return _binary(jnp.divide, o, self)
    def __pow__(self, o):  return _binary(jnp.power, self, o)
    def __neg__(self):     return BoxField(-self.value, self.oz, self.oy)
    def __pos__(self):     return self
    def __gt__(self, o):   return _binary(jnp.greater, self, o)
    def __ge__(self, o):   return _binary(jnp.greater_equal, self, o)
    def __lt__(self, o):   return _binary(jnp.less, self, o)
    def __le__(self, o):   return _binary(jnp.less_equal, self, o)
    def __eq__(self, o):   return _binary(jnp.equal, self, o)  # elementwise
    def __ne__(self, o):   return _binary(jnp.not_equal, self, o)


def _is_scalarlike(o) -> bool:
    """True for operands with no (z, y) spatial footprint: python scalars,
    0-d arrays, or arrays broadcasting over z/y (dims of size 1)."""
    if isinstance(o, BoxField):
        return False
    shape = getattr(o, "shape", ())
    if len(shape) < 3:
        return True
    return shape[-3] == 1 and shape[-2] == 1


def _meet(fields):
    """Intersect the boxes of all BoxField operands; slice each operand's
    value to the common box. Scalar-likes pass through unchanged."""
    boxes = [f for f in fields if isinstance(f, BoxField)]
    if not boxes:
        return fields, None, None
    z0 = max(f.oz for f in boxes)
    z1 = min(f.oz + f.ze for f in boxes)
    y0 = max(f.oy for f in boxes)
    y1 = min(f.oy + f.ye for f in boxes)
    if z1 <= z0 or y1 <= y0:
        raise ValueError(
            f"empty box intersection: z[{z0},{z1}) y[{y0},{y1}) — the tile "
            "margins are too small for this stencil chain"
        )
    out = []
    for f in fields:
        if isinstance(f, BoxField):
            out.append(
                f.value[..., z0 - f.oz : z1 - f.oz, y0 - f.oy : y1 - f.oy, :]
            )
        elif _is_scalarlike(f):
            out.append(f)
        else:
            raise TypeError(
                f"raw array with spatial extent mixed into BoxField math: "
                f"shape {getattr(f, 'shape', None)}"
            )
    return out, z0, y0


def _binary(op, a, b):
    (va, vb), z0, y0 = _meet((a, b))
    return BoxField(op(va, vb), z0, y0)


class BoxBackend:
    """Box-tracked backend for Pallas kernel tiles (see module docstring)."""

    @staticmethod
    def sqrt(f):
        return BoxField(jnp.sqrt(f.value), f.oz, f.oy)

    @staticmethod
    def rsqrt(f):
        import jax

        return BoxField(jax.lax.rsqrt(f.value), f.oz, f.oy)

    @staticmethod
    def abs(f):
        return BoxField(jnp.abs(f.value), f.oz, f.oy)

    @staticmethod
    def sign(f):
        return BoxField(jnp.sign(f.value), f.oz, f.oy)

    @staticmethod
    def maximum(a, b):
        return _binary(jnp.maximum, a, b)

    @staticmethod
    def minimum(a, b):
        return _binary(jnp.minimum, a, b)

    @staticmethod
    def logical_and(a, b):
        return _binary(jnp.logical_and, a, b)

    @staticmethod
    def where(c, a, b):
        (vc, va, vb), z0, y0 = _meet((c, a, b))
        return BoxField(jnp.where(vc, va, vb), z0, y0)

    @staticmethod
    def isnan(f):
        return BoxField(jnp.isnan(f.value), f.oz, f.oy)

    @staticmethod
    def clip(f, lo, hi):
        return BoxField(jnp.clip(f.value, lo, hi), f.oz, f.oy)

    @staticmethod
    def ones_like(f):
        return BoxField(jnp.ones_like(f.value), f.oz, f.oy)

    @staticmethod
    def full_like(f, v):
        return BoxField(jnp.full_like(f.value, v), f.oz, f.oy)

    @staticmethod
    def zeros_like(f):
        return BoxField(jnp.zeros_like(f.value), f.oz, f.oy)

    @staticmethod
    def stack(fields):
        vals, z0, y0 = _meet(tuple(fields))
        return BoxField(jnp.stack(vals), z0, y0)

    @staticmethod
    def pin(f):
        # no-op: Pallas TPU has no optimization_barrier lowering, and
        # Mosaic lowers the kernel jaxpr eqn-by-eqn without XLA's
        # fusion-duplication pass — there is nothing to pin against
        # (measured: scripts/trace_merged_bench.py, round 5)
        return f

    # -- shifts: x rolls in-row; z/y translate the box --------------------- #
    @staticmethod
    def shift_p(f, axis):
        if axis == _X:
            return BoxField(jnp.roll(f.value, -1, _X), f.oz, f.oy)
        if axis == _Y:
            return BoxField(f.value, f.oz, f.oy - 1)
        return BoxField(f.value, f.oz - 1, f.oy)

    @staticmethod
    def shift_m(f, axis):
        if axis == _X:
            return BoxField(jnp.roll(f.value, 1, _X), f.oz, f.oy)
        if axis == _Y:
            return BoxField(f.value, f.oz, f.oy + 1)
        return BoxField(f.value, f.oz + 1, f.oy)

    @staticmethod
    def set_component(q, idx, val):
        n = q.value.shape[0]
        return BoxBackend.stack([val if i == idx else q[i] for i in range(n)])

    @staticmethod
    def crop(f, z0, z1, y0, y1, x0, x1):
        """Extract the window-coordinate box [z0,z1)x[y0,y1) (x in array
        coords) as a raw array; the field's box must cover it."""
        if f.oz > z0 or f.oz + f.ze < z1 or f.oy > y0 or f.oy + f.ye < y1:
            raise ValueError(
                f"crop z[{z0},{z1}) y[{y0},{y1}) outside box "
                f"z[{f.oz},{f.oz + f.ze}) y[{f.oy},{f.oy + f.ye})"
            )
        return f.value[
            ..., z0 - f.oz : z1 - f.oz, y0 - f.oy : y1 - f.oy, x0:x1
        ]


BOX = BoxBackend()
