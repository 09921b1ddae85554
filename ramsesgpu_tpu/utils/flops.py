"""FLOP accounting for the step functions.

Counterpart of the reference's PAPI-based flop reporting
(reference: src/utils/monitoring/PapiInfo.{h,cpp}, report at
HydroRunGodunov.cpp:4041-4049 'total flop per cell per time step'):
instead of hardware counters, XLA's own cost analysis of the compiled step
provides the exact flop count of the program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.params import RunParams


def step_cost(params: RunParams, config=None) -> dict[str, float]:
    """Compile the step once and return {'flops', 'bytes_accessed',
    'flops_per_cell'} from XLA's cost analysis."""
    import numpy as np

    from ..solvers.step import make_step_fn

    step = make_step_fn(params, config)
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    U = jnp.zeros(params.shape, dtype)
    t = jnp.zeros((), dtype)

    compiled = jax.jit(step).lower(U, t).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per computation
        costs = costs[0]
    flops = float(costs.get("flops", float("nan")))
    n_cells = params.nx * params.ny * (params.nz if params.dim == 3 else 1)
    return {
        "flops": flops,
        "bytes_accessed": float(costs.get("bytes accessed", float("nan"))),
        "flops_per_cell": flops / n_cells,
    }


def report(params: RunParams, config=None) -> str:
    c = step_cost(params, config)
    return (
        f"step flops           : {c['flops']:.3e}\n"
        f"flops per cell       : {c['flops_per_cell']:.1f}\n"
        f"bytes accessed       : {c['bytes_accessed']:.3e}"
    )
