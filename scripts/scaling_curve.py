"""Weak-scaling proxy on the virtual CPU mesh: relative efficiency curve.

Real multi-chip hardware is not available in this environment (one v5e
behind the axon tunnel), so the BASELINE.md weak-scaling target (>= 90% to
64 chips) cannot be measured directly. This script produces the two
quantities a multi-chip projection needs, on the 8-device VIRTUAL mesh the
test suite uses (XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT):

1. A sharding-overhead curve at FIXED global grid: the virtual devices
   share one CPU, so total compute time is mesh-independent and the
   ratio t_unsharded / t_sharded isolates the framework's own scaling
   overheads: halo ppermute rings, collective dt, sharded-step dispatch,
   and the per-shard ghost-margin recompute. The last dominates at small
   test blocks and shrinks like g/L with the shard edge L (each split
   axis computes (L+2g)/L of its cells: +25% at L=24, +2.3% at L=256),
   so the production-size projection subtracts it analytically.

2. The analytic comm/compute ratio per mesh shape: halo bytes moved per
   step vs interior cells updated (the reference's border buffers,
   HydroRunBaseMpi.cpp make_all_boundaries, map 1:1 to the ppermute ring
   payloads in parallel/halo.py), which is what actually bounds ICI-link
   scaling on real hardware.

Usage: python scripts/scaling_curve.py [global_n] [n_iter]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ramsesgpu_tpu.config.configmap import ConfigMap  # noqa: E402
from ramsesgpu_tpu.config.params import params_from_config  # noqa: E402

_INI = """
[run]
tend=1e9
[mesh]
nx={nx}
ny={ny}
nz={nz}
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=Orszag-Tang
cfl=0.4
gamma0=1.666
slope_type=2.0
riemannSolver=hlld
smallr=1e-7
smallc=1e-7
[MHD]
enable=true
magRiemannSolver=hlld
[mpi]
mx={mx}
my={my}
mz={mz}
"""

MESHES = [(1, 1, 1), (2, 1, 1), (2, 2, 1), (2, 2, 2)]


def halo_bytes_per_step(params, mx, my, mz) -> int:
    """Ring payload per step: 2 faces x ghost_width planes per split axis
    per variable (parallel/halo.py), in bytes across the whole mesh."""
    g = params.ghost_width
    nv = params.nb_var
    itemsize = 8 if params.dtype == "float64" else 4
    n_dev = mx * my * mz
    per_dev = 0
    lx, ly, lz = params.nx // mx, params.ny // my, params.nz // mz
    if mx > 1:
        per_dev += 2 * g * (ly + 2 * g) * (lz + 2 * g)
    if my > 1:
        per_dev += 2 * g * (lx + 2 * g) * (lz + 2 * g)
    if mz > 1:
        per_dev += 2 * g * (lx + 2 * g) * (ly + 2 * g)
    return per_dev * nv * itemsize * n_dev


def main() -> int:
    import json
    from pathlib import Path

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    records = []

    from ramsesgpu_tpu.parallel.mesh import make_mesh
    from ramsesgpu_tpu.parallel.sharded_step import (
        make_sharded_advance_n,
        shard_global_state,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    base = None
    print(f"sharding overhead at a FIXED {n}^3 global grid, {n_iter} steps"
          f" (virtual CPU mesh: total compute is mesh-independent, so the"
          f" slowdown vs 1x1x1 is pure framework scaling overhead):")
    for mx, my, mz in MESHES:
        n_dev = mx * my * mz
        nx = ny = nz = n
        config = ConfigMap(text=_INI.format(nx=nx, ny=ny, nz=nz,
                                            mx=mx, my=my, mz=mz))
        params = params_from_config(config)
        U = jnp.asarray(init_problem(params, config))
        U = make_boundaries(params, U)
        mesh = make_mesh(mx=mx, my=my, mz=mz)
        Us = shard_global_state(params, mesh, np.asarray(U))
        advance = make_sharded_advance_n(params, mesh)
        t = jnp.asarray(0.0, U.dtype)
        advance(Us, t, jnp.array(1, jnp.int32))[0].block_until_ready()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = advance(Us, t, jnp.array(n_iter, jnp.int32))
            out[0].block_until_ready()
            best = min(best, (time.perf_counter() - t0) / n_iter)
        if base is None:
            base = best
        cells = nx * ny * nz
        hb = halo_bytes_per_step(params, mx, my, mz)
        print(
            f"  mesh {mx}x{my}x{mz} ({n_dev} dev): {best * 1e3:8.1f} ms/step,"
            f" overhead vs 1 dev {best / base - 1:+.1%},"
            f" halo {hb / 1e6:.2f} MB/step"
            f" ({hb / (cells * params.nb_var * 4):.1%} of state)"
        )
        # ghost-margin recompute fraction: each split axis computes
        # (L+2g)/L of its cells — subtracted analytically for the
        # production-size projection (see module docstring)
        g = params.ghost_width
        lx, ly, lz = nx // mx, ny // my, nz // mz
        margin = (
            (lx + 2 * g) / lx * (ly + 2 * g) / ly * (lz + 2 * g) / lz
            if n_dev > 1 else 1.0
        )
        records.append({
            "mesh": [mx, my, mz],
            "n_devices": n_dev,
            "global_grid": n,
            "ms_per_step": best * 1e3,
            "overhead_vs_1dev": best / base - 1,
            "margin_recompute_factor": margin,
            "overhead_minus_margin": (best / base) / margin - 1,
            "halo_mb_per_step": hb / 1e6,
            "halo_fraction_of_state": hb / (cells * params.nb_var * 4),
        })
    out = Path(__file__).resolve().parent.parent / "SCALING.json"
    out.write_text(json.dumps({
        "note": (
            "weak-scaling proxy on the 8-device VIRTUAL CPU mesh (one v5e "
            "chip only in this environment): fixed global grid, so the "
            "slowdown vs 1x1x1 is pure framework scaling overhead (halo "
            "ppermute rings + collective dt + per-shard ghost-margin "
            "recompute). overhead_minus_margin divides out the analytic "
            "margin-recompute factor — the part that vanishes like g/L at "
            "production shard sizes; what remains is the projected "
            "weak-scaling loss (BASELINE.md target: >=90% to 64 chips)."
        ),
        "ts": time.time(),
        "n_iter": n_iter,
        "rows": records,
    }, indent=1) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
