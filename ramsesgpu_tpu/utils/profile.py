"""Per-phase step profiling: the reference's DO_TIMING breakdown.

The reference prints boundaries / godunov / dissipative (etc.) percentages
of total time when built with DO_TIMING (reference:
src/hydro/HydroRunGodunov.cpp:4056-4062, timer fields MHDRunGodunov.h:382-405).
Here the phases are jitted separately and timed with value-forcing syncs;
inside the production step XLA fuses them, so the numbers are indicative of
where the work is, not an exact decomposition (the fused total is printed
alongside). Through a remote TPU tunnel, per-dispatch latency inflates every
phase by a constant; compare phases against each other, not to wall clock.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..config.params import RunParams


def _time(fn, *args, reps: int = 5) -> float:
    def sync(r):
        r = r[0] if isinstance(r, tuple) else r
        return float(r) if getattr(r, "ndim", 0) == 0 else float(r.ravel()[0])

    sync(fn(*args))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def profile_step(params: RunParams, config, reps: int = 5) -> dict[str, float]:
    """Time the phases of one step on the current default backend.
    Returns {phase: seconds}."""
    from ..problems import init_problem
    from ..solvers.boundary import make_boundaries
    from ..solvers.step import make_step_fn, uses_shear
    from ..solvers.timestep import compute_dt

    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U.dtype)
    dt0 = compute_dt(params, U)
    float(dt0)

    phases: dict[str, float] = {}
    phases["dt reduction"] = _time(jax.jit(lambda u: compute_dt(params, u)), U)

    if uses_shear(params):
        from ..solvers.shear import make_all_boundaries_shear

        fill = jax.jit(lambda u, t: make_all_boundaries_shear(params, u, t))
        phases["boundary fill"] = _time(lambda u: fill(u, t0), U)
    else:
        phases["boundary fill"] = _time(
            jax.jit(lambda u: make_boundaries(params, u)), U
        )

    if params.mhd:
        from ..solvers.godunov_mhd import godunov_unsplit_mhd

        upd = jax.jit(
            lambda u, d: godunov_unsplit_mhd(params, u, d,
                                             apply_dissipation=False)
        )
    else:
        from ..solvers.godunov import godunov_unsplit_hydro

        upd = jax.jit(lambda u, d: godunov_unsplit_hydro(params, u, d))
    phases["godunov update"] = _time(upd, U, dt0)

    if params.mhd and (params.nu > 0 or params.eta > 0):
        from ..solvers.dissipation import apply_dissipation_mhd

        phases["dissipative"] = _time(
            jax.jit(lambda u, d: apply_dissipation_mhd(params, u, d)), U, dt0
        )
    elif params.nu > 0:
        from ..solvers.dissipation import apply_viscosity

        phases["dissipative"] = _time(
            jax.jit(lambda u, d: apply_viscosity(params, u, d)), U, dt0
        )

    step = jax.jit(make_step_fn(params, config))
    phases["full fused step"] = _time(step, U, t0)
    return phases


def format_profile(phases: dict[str, float]) -> str:
    total = sum(v for k, v in phases.items() if k != "full fused step")
    lines = ["per-phase profile (jitted separately, best-of-N):"]
    for k, v in phases.items():
        if k == "full fused step":
            continue
        lines.append(f"  {k:18s}: {v * 1e3:8.2f} ms ({100 * v / total:5.1f} %)")
    lines.append(f"  {'sum of phases':18s}: {total * 1e3:8.2f} ms")
    if "full fused step" in phases:
        lines.append(
            f"  {'full fused step':18s}: "
            f"{phases['full fused step'] * 1e3:8.2f} ms (XLA/Pallas-fused)"
        )
    return "\n".join(lines)
