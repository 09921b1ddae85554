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


def profile_step_distributed(
    params: RunParams, config, mesh=None, reps: int = 5
) -> dict[str, float]:
    """Per-phase profile of the DISTRIBUTED step + measured halo overlap.

    Times, on the device mesh selected by [mpi] mx/my/mz:
      - "halo exchange" — the ppermute ghost-ring fill alone,
      - "sync step"     — the full step with synchronous exchange,
      - "overlap step"  — the same step with halo/compute overlap
                          ([implementation] haloOverlap) when supported,
      - "overlap %"     — fraction of the halo-exchange time hidden by
                          overlap: (sync - overlap) / halo, clamped to
                          [0, 1].  The reference's overlap is 0%
                          (BASELINE.md; HydroRunBaseMpi.cpp:3530-3661 is a
                          synchronous pack/sendrecv/unpack chain).
    """
    from jax import shard_map

    from ..parallel.halo import attach_halos
    from ..parallel.mesh import (
        make_mesh,
        state_sharding,
        topology_from_config,
        validate_decomposition,
    )
    from ..parallel.overlap import overlap_supported
    from ..parallel.sharded_step import make_sharded_advance_n, shard_global_state
    from ..problems import init_problem
    from ..solvers.boundary import make_boundaries
    from ..solvers.step import uses_shear

    mx, my, mz = topology_from_config(config)
    validate_decomposition(params, mx, my, mz)
    if mesh is None:
        mesh = make_mesh(mx=mx, my=my, mz=mz)

    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    U = shard_global_state(params, mesh, U0)
    one = jnp.array(1, jnp.int32)

    spec = state_sharding(params, mesh).spec
    halo_fn = jax.jit(
        shard_map(
            lambda u: attach_halos(params, u),
            mesh=mesh, in_specs=spec, out_specs=spec,
            check_vma=False,
        )
    )
    phases: dict[str, float] = {}
    phases["halo exchange"] = _time(
        lambda u: jnp.sum(halo_fn(u)), U, reps=reps
    )

    t0 = jnp.asarray(0.0, U.dtype)

    def step_time(p):
        adv = make_sharded_advance_n(p, mesh, config)
        return _time(lambda u: adv(u, t0, one)[0], U, reps=reps)

    phases["sync step"] = step_time(params.replace(halo_overlap=False))

    local_dims = (
        params.nz // mz if params.dim == 3 else 1,
        params.ny // my, params.nx // mx,
    )
    can_overlap = (
        params.dim == 3
        and not uses_shear(params)
        and overlap_supported(params, local_dims)
    )
    if can_overlap:
        phases["overlap step"] = step_time(params.replace(halo_overlap=True))
        hidden = phases["sync step"] - phases["overlap step"]
        phases["overlap %"] = max(
            0.0, min(1.0, hidden / max(phases["halo exchange"], 1e-30))
        )
    return phases


def format_profile_distributed(phases: dict[str, float], n_devices: int) -> str:
    lines = [f"distributed step profile ({n_devices} devices, best-of-N):"]
    for k, v in phases.items():
        if k == "overlap %":
            lines.append(
                f"  {'halo overlap':18s}: {100 * v:5.1f} % of exchange time "
                "hidden (reference: 0 %)"
            )
        else:
            lines.append(f"  {k:18s}: {v * 1e3:8.2f} ms")
    if "overlap step" not in phases:
        lines.append(
            "  halo overlap      : not supported for this configuration"
        )
    return "\n".join(lines)
