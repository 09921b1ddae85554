"""Phase attribution for the NON-periodic 3D hydro step on the real TPU.

Round-4 PERF.md: implode (reflective BCs, 256^3) ran at 76 ms/step while
periodic MHD with ~3x the per-cell work ran at 34.9 ms — this script
times the ghosted-path phases in isolation to find the sink:
dt reduction, boundary fill, the ghosted-window fused kernel, the pad
of the ghosted input, the interior merge, and the composed step/advance.

Usage: python scripts/hydro_phase_timing.py [n]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.timestep import compute_dt
from ramsesgpu_tpu.utils.platform import honor_platform_env


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:8]))


def _timeit(fn, *args, iters=10):
    best = float("inf")
    for _ in range(2):
        _sync(fn(*args))
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main() -> int:
    honor_platform_env()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256

    config = ConfigMap(
        os.path.join(os.path.dirname(__file__), "..", "data",
                     "implode3d.ini")
    )
    for k in ("nx", "ny", "nz"):
        config.set_integer("mesh", k, n)
    config.set_float("run", "tend", 1e9)
    params = params_from_config(config)
    print(f"backend: {jax.default_backend()}, grid {n}^3, "
          f"BCs {tuple(int(b) for b in params.boundary_types)}")

    g = params.ghost_width
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)
    dt = jnp.asarray(1e-4, U.dtype)
    interior = (slice(None),) + (slice(g, -g),) * 3

    from ramsesgpu_tpu.pallas.fused_hydro3d import make_fused_hydro_update

    fused = make_fused_hydro_update(params, tiles=params.pallas_tiles)

    t_dt = _timeit(jax.jit(lambda u: compute_dt(params, u)), U)
    t_bc = _timeit(jax.jit(lambda u: make_boundaries(params, u)), U)
    t_kern = _timeit(jax.jit(fused), U, dt)

    merge = jax.jit(lambda u, i: u.at[interior].set(i))
    new_int = jax.jit(fused)(U, dt)
    t_merge = _timeit(merge, U, new_int)

    from ramsesgpu_tpu.solvers.step import make_step_fn, make_advance_n

    step = jax.jit(make_step_fn(params, config))
    t0 = jnp.asarray(0.0, U.dtype)
    t_step = _timeit(step, U, t0)

    adv = make_advance_n(params, config)
    for _ in range(2):
        _sync(adv(U, t0, jnp.array(2, jnp.int32))[0])
    best = float("inf")
    for _ in range(3):
        w0 = time.perf_counter()
        out = adv(U, t0, jnp.array(10, jnp.int32))
        _sync(out[0])
        best = min(best, (time.perf_counter() - w0) / 10)
    t_adv = best * 1e3

    print(f"dt reduction      : {t_dt:7.2f} ms")
    print(f"boundary fill     : {t_bc:7.2f} ms")
    print(f"fused ghosted kern: {t_kern:7.2f} ms")
    print(f"interior merge    : {t_merge:7.2f} ms")
    print(f"sum of phases     : {t_dt + t_bc + t_kern + t_merge:7.2f} ms")
    print(f"composed step     : {t_step:7.2f} ms")
    print(f"advance loop      : {t_adv:7.2f} ms/step "
          f"({n ** 3 / t_adv * 1e3:.3g} cells/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
