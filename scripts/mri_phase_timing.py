"""Per-phase timing of the MRI shearing-box step on the real TPU."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.godunov_mhd import godunov_unsplit_mhd
from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
from ramsesgpu_tpu.solvers.step import make_step_fn
from ramsesgpu_tpu.solvers.timestep import compute_dt


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


def timeit(name, fn, *args, iters=10):
    for _ in range(2):
        _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:26s}: {best * 1e3:8.3f} ms", flush=True)
    return best


def main() -> int:
    nx, ny, nz = (map(int, sys.argv[1:4]) if len(sys.argv) >= 4
                  else (128, 256, 128))
    config = ConfigMap("data/mhd_mri_3d.ini")
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    params = params_from_config(config)
    print("kernel param:", params.kernel, " omega0:", params.omega0,
          " nu:", params.nu, " eta:", params.eta, flush=True)

    from ramsesgpu_tpu.pallas.fused_mhd3d import (
        make_fused_mhd_shear, make_pallas_shear_step_fn, pallas_shear_supported,
    )

    print("pallas_shear_supported:", pallas_shear_supported(params),
          " backend:", jax.default_backend(), flush=True)

    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    t = jnp.asarray(0.0, U.dtype)
    dt = jax.jit(lambda u: compute_dt(params, u))(U)

    timeit("compute_dt", jax.jit(lambda u: compute_dt(params, u)), U)
    timeit("shear boundary fill",
           jax.jit(lambda u, tt: make_all_boundaries_shear(params, u, tt)), U, t)
    timeit("whole-array update",
           jax.jit(lambda u, d: godunov_unsplit_mhd(params, u, d, t=0.0)), U, dt)
    fused = make_fused_mhd_shear(params)
    timeit("fused shear kernel", jax.jit(fused), U, dt)
    step = make_pallas_shear_step_fn(params)
    timeit("pallas step (total)", jax.jit(step), U, t)
    step_wa = make_step_fn(params.replace(kernel="jnp"))
    timeit("whole-array step (total)", jax.jit(step_wa), U, t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
