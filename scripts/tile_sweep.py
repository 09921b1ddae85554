"""Sweep fused-MHD3D kernel tile sizes on the real TPU; print cells/s each.

Usage: python scripts/tile_sweep.py [n] [bz,by ...]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries

_INI = """
[run]
tend=100.0
[mesh]
nx={n}
ny={n}
nz={n}
xmin=-0.5
xmax=0.5
ymin=-0.5
ymax=0.5
zmin=-0.5
zmax=0.5
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


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tiles = [tuple(map(int, a.split(","))) for a in sys.argv[2:]] or [
        (8, 32), (16, 32), (8, 64), (16, 64), (32, 32), (8, 128), (16, 128)
    ]
    config = ConfigMap(text=_INI.format(n=n))
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)

    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_advance_n

    n_iter = 10
    for bz, by in tiles:
        try:
            p = params.replace(pallas_tiles=(bz, by))
            advance = make_pallas_advance_n(p)
            t = jnp.asarray(0.0, U.dtype)
            Uw, tw, k = advance(U, t, jnp.array(2, jnp.int32))
            float(jnp.sum(tw))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                U2, t2, k = advance(U, t, jnp.array(n_iter, jnp.int32))
                cs = float(jnp.sum(U2[0]))
                best = min(best, time.perf_counter() - t0)
            rate = n_iter * n**3 / best
            print(f"tiles=({bz},{by}): {rate:.4g} cells/s  checksum={cs:.6g}",
                  flush=True)
        except Exception as exc:
            msg = str(exc).splitlines()[0][:160]
            print(f"tiles=({bz},{by}): FAILED {type(exc).__name__}: {msg}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
