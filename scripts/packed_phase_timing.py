"""Phase timing of the current packed-io MHD loop on the real TPU."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd_packed

_INI = """
[run]
tend=100.0
[mesh]
nx={n}
ny={n}
nz={n}
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
"""


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


def timeit(name, fn, *args, iters=20):
    for _ in range(2):
        _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:24s}: {best * 1e3:8.3f} ms", flush=True)
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = ConfigMap(text=_INI.format(n=n))
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)

    from ramsesgpu_tpu.pallas.fused_mhd3d import (
        _pick_tiles, make_fused_mhd_packed_io,
    )
    from ramsesgpu_tpu.pallas.packed_io import YB, pack_state

    g = params.ghost_width
    bz, by = _pick_tiles(params)
    fused = make_fused_mhd_packed_io(params, tiles=(bz, by))
    P = jax.jit(lambda u: pack_state(params, u[:, g:-g, g:-g, g:-g]))(U)
    jdt = jax.jit(lambda p: params.cfl / compute_inv_dt_mhd_packed(params, p, y0=YB))
    dt = jdt(P)

    timeit("dt (slice-based)", jdt, P)
    timeit("packed-io kernel", jax.jit(fused), P, dt)

    def step(P):
        d = params.cfl / compute_inv_dt_mhd_packed(params, P, y0=YB)
        return fused(P, d)

    timeit("composed step", jax.jit(step), P, iters=10)
    print(f"tiles=({bz},{by})  n={n}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
