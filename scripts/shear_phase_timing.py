"""Per-phase timing of the PACKED shearing-box (MRI) step.

Attributes the step's wall time to its components so optimization effort
lands where the milliseconds are:
  - streaming shear CFL kernel vs the XLA slice reduction
  - MAIN kernel: packed-IO vs zcarry (z-block streaming)
  - transposed border-strip kernel (with a prebuilt input)
  - strip_pass total (slab build + transpose glue + kernel + extraction)
  - full step, packed-main and zcarry-main

Usage: python scripts/shear_phase_timing.py [nx ny nz]   (default flagship)
Works on CPU with interpret-mode kernels for a smoke run
(JAX_PLATFORMS=cpu), but the numbers only mean something on the TPU.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ramsesgpu_tpu.utils.platform import honor_platform_env  # noqa: E402

honor_platform_env()


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:8]))


def timeit(name, fn, *args, iters=10):
    for _ in range(2):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:30s}: {best * 1e3:8.3f} ms", flush=True)
    return best


def main() -> int:
    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.shear_packed import (
        _make_main_kernel,
        _make_strip_kernel,
        make_shear_cfl_kernel,
        make_shear_packed_step,
        pack_shear,
    )
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import make_zcarry_mhd_packed_io
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    if jax.default_backend() != "tpu":
        import ramsesgpu_tpu.pallas as _pk

        _pk.INTERPRET = True
        print("WARNING: CPU interpret-mode smoke — numbers not meaningful")

    nx, ny, nz = (map(int, sys.argv[1:4]) if len(sys.argv) >= 4
                  else (128, 256, 128))
    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d.ini"))
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    from ramsesgpu_tpu.pallas.fused_mhd3d import _pick_tiles

    params = params_from_config(config)
    tiles = params.pallas_tiles or _pick_tiles(params)
    ncells = nx * ny * nz
    print(f"grid {nx}x{ny}x{nz}  tiles {tiles}  "
          f"backend {jax.default_backend()}", flush=True)

    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    P, kept = pack_shear(params, U)
    dt = jnp.asarray(1e-4, P.dtype)

    # --- CFL ---
    cfl_k = make_shear_cfl_kernel(params)
    if cfl_k is not None:
        timeit("CFL streaming kernel", jax.jit(cfl_k), P, kept)

    from ramsesgpu_tpu.core.constants import IA, IB, IC, ID, IP, IU, IV, IW
    from ramsesgpu_tpu.pallas.packed_io import YB
    from ramsesgpu_tpu.solvers.timestep import _inv_dt_mhd_fields

    g = params.ghost_width

    @jax.jit
    def cfl_xla(P, kept):
        zi, yi = slice(g, g + nz), slice(YB, YB + ny)
        rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
        ia = P[IA, zi, yi, :]
        ia_p = jnp.concatenate([ia[..., 1:], kept[..., None]], axis=-1)
        return _inv_dt_mhd_fields(
            params, P[ID, zi, yi, :], P[IP, zi, yi, :],
            P[IU, zi, yi, :] / rho, P[IV, zi, yi, :] / rho,
            P[IW, zi, yi, :] / rho,
            0.5 * (ia + ia_p),
            0.5 * (P[IB, zi, yi, :] + P[IB, zi, YB + 1 : YB + ny + 1, :]),
            0.5 * (P[IC, zi, yi, :] + P[IC, g + 1 : g + nz + 1, yi, :]),
        )

    timeit("CFL XLA slice reduction", cfl_xla, P, kept)

    # --- main kernels ---
    main_pk = jax.jit(_make_main_kernel(params, tiles, False))
    timeit("main kernel (packed-io)", main_pk, P, dt)
    main_zc = jax.jit(make_zcarry_mhd_packed_io(params, tiles=tiles))
    timeit("main kernel (zcarry)", main_zc, P, dt)

    # --- strip kernel with a prebuilt input ---
    from ramsesgpu_tpu.pallas.shear_packed import _strip_geometry

    gy, wy = _strip_geometry(params)
    xw = 8 * g
    St = jnp.zeros((params.nb_var, nz + 2 * g, xw, wy), P.dtype)
    St = St.at[:, :, : 2 * g, : ny + 2 * gy].set(
        jnp.swapaxes(P[: params.nb_var, :, YB - gy : YB + ny + gy,
                       : 2 * g], -1, -2)
    )
    strip_k = _make_strip_kernel(params, tiles[0], False)
    timeit("strip kernel (prebuilt in)", jax.jit(strip_k), St, dt)

    # --- full steps ---
    step_pk = make_shear_packed_step(params, tiles=tiles)
    timeit("full step (packed main)",
           jax.jit(lambda P, k, t: step_pk(P, k, t)), P, kept, 0.0)
    step_zc = make_shear_packed_step(
        params.replace(kernel="zcarry"), tiles=tiles
    )
    t_step = timeit("full step (zcarry main)",
                    jax.jit(lambda P, k, t: step_zc(P, k, t)),
                    P, kept, 0.0)
    print(f"zcarry-main step throughput: {ncells / t_step:.4g} cells/s",
          flush=True)

    from ramsesgpu_tpu.pallas.shear_packed import strip_fused_supported

    if strip_fused_supported(params.replace(pallas_tiles=tiles)):
        step_f = make_shear_packed_step(
            params.replace(kernel="zcarry", strip_fused=True), tiles=tiles
        )
        t_f = timeit("full step (zcarry + fused strip)",
                     jax.jit(lambda P, k, t: step_f(P, k, t)),
                     P, kept, 0.0)
        print(f"zcarry + fused-strip throughput: {ncells / t_f:.4g} "
              "cells/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
