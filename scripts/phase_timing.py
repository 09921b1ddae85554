"""Time the packed-advance loop's phases in isolation on the real TPU:
dt reduction, ghost re-pack, fused kernel, and the composed step.
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
from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd

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
    # value-forcing sync: a device->host scalar cannot complete before the
    # compute chain has run (block_until_ready is unreliable through the
    # remote-TPU tunnel — see bench.py)
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
    print(f"{name:18s}: {best * 1e3:8.3f} ms", flush=True)
    return best


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = ConfigMap(text=_INI.format(n=n))
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)

    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_update, _pick_tiles

    g = params.ghost_width
    ny = params.ny
    bz, by = _pick_tiles(params)
    wy_pad = (-(-(by + 2 * g) // 8) * 8) - (by + 2 * g)
    fused = make_fused_mhd_update(params, tiles=(bz, by), packed_input=True)

    def pack(interior):
        P = jnp.pad(interior, ((0, 0), (g, g), (g, g), (0, 0)), mode="wrap")
        if wy_pad:
            P = jnp.pad(P, ((0, 0), (0, 0), (0, wy_pad), (0, 0)))
        return P

    def dt_of(P):
        Pv = P[:, :, : ny + 2 * g, :] if wy_pad else P
        return params.cfl / compute_inv_dt_mhd(params, Pv, ghost=(g, g, 0))

    interior = U[:, g:-g, g:-g, g:-g]
    P = jax.jit(pack)(interior)
    jpack = jax.jit(pack)
    jdt = jax.jit(dt_of)
    jfused = jax.jit(fused)
    dt = jdt(P)

    timeit("dt reduction", jdt, P)
    timeit("pack (ghost pad)", jpack, interior)
    timeit("fused kernel", jfused, P, dt)

    def step(P):
        d = dt_of(P)
        return pack(fused(P, d))

    timeit("composed step", jax.jit(step), P, iters=10)
    print(f"tiles=({bz},{by})  n={n}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
