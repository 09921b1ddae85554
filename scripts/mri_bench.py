"""Time the 3D MRI shearing-box step on the real TPU.

make_advance_n auto-selects the packed-layout shear path
(pallas/shear_packed.py) at lane-exact sizes: 2.86e8 cells/s at
128x256x128 on a v5e (2.40e8 compensated, 1.9e8 viscous-resistive).

Usage: python scripts/mri_bench.py [nx ny nz] [n_iter]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
from ramsesgpu_tpu.solvers.step import make_advance_n


def main() -> int:
    if len(sys.argv) >= 4:
        nx, ny, nz = map(int, sys.argv[1:4])
    else:
        nx, ny, nz = 128, 256, 128
    n_iter = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    config = ConfigMap("data/mhd_mri_3d.ini")
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_float("run", "tend", 1e9)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)

    advance = make_advance_n(params, config)
    t = jnp.asarray(0.0, U.dtype)
    for _ in range(2):
        U_w, t_w, k = advance(U, t, jnp.array(2, jnp.int32))
        float(jnp.sum(t_w))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U2, t2, k = advance(U, t, jnp.array(n_iter, jnp.int32))
        cs = float(jnp.sum(U2[0]))
        best = min(best, time.perf_counter() - t0)
    assert int(k) == n_iter, int(k)
    rate = n_iter * nx * ny * nz / best
    print(f"MRI {nx}x{ny}x{nz}: {rate:.4g} cells/s  ({best/n_iter*1e3:.2f} ms/step)"
          f"  checksum={cs:.6g}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
