"""Per-phase timing of the STRATIFIED packed MRI step.

PERF.md (round 4) measured the stratified row at 125 ms/step vs 15.6 for
plain MRI at the same grid — an 8x anomaly that routing alone does not
explain (make_advance_n provably selects the packed stratified path on
TPU). This probe attributes the time: CFL variant in use, main kernel
with/without the in-kernel gravity, stratified strip kernel, refill_z,
and the full step.

Usage: python scripts/stratified_phase_timing.py [nx ny nz]
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
    print(f"{name:34s}: {best * 1e3:8.3f} ms", flush=True)
    return best


def main() -> int:
    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.fused_mhd3d import _pick_tiles
    from ramsesgpu_tpu.pallas.shear_packed import (
        _make_main_kernel,
        _make_strip_kernel,
        make_shear_cfl_kernel,
        make_shear_packed_step,
        pack_shear,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
    from ramsesgpu_tpu.solvers.step import _mri_gz_profile, make_gravity_field

    if jax.default_backend() != "tpu":
        import ramsesgpu_tpu.pallas as _pk

        _pk.INTERPRET = True
        print("WARNING: CPU interpret-mode smoke — numbers not meaningful")

    nx, ny, nz = (map(int, sys.argv[1:4]) if len(sys.argv) >= 4
                  else (128, 256, 128))
    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d_stratified.ini"))
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config)
    tiles = params.pallas_tiles or _pick_tiles(params)
    print(f"grid {nx}x{ny}x{nz}  tiles {tiles}  nu={params.nu} "
          f"eta={params.eta}  backend {jax.default_backend()}", flush=True)

    gravity = make_gravity_field(params, config)
    gz = _mri_gz_profile(params, config, gravity)
    assert gz is not None, "not the analytic stratified profile"

    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    P, kept = pack_shear(params, U, stratified=True)
    dt = jnp.asarray(1e-4, P.dtype)

    cfl_k = make_shear_cfl_kernel(params)
    print("streaming CFL kernel available:", cfl_k is not None, flush=True)
    if cfl_k is not None:
        timeit("CFL streaming kernel", jax.jit(cfl_k), P, kept)

    timeit("main kernel (no gravity)",
           jax.jit(_make_main_kernel(params, tiles, False)), P, dt)
    timeit("main kernel (in-kernel gravity)",
           jax.jit(_make_main_kernel(params, tiles, False, gravity_z=gz)),
           P, dt)

    g = params.ghost_width
    from ramsesgpu_tpu.pallas.shear_packed import _strip_geometry

    _gy, wy = _strip_geometry(params)
    St = jnp.zeros((params.nb_var, nz + 2 * g, 8 * g, wy), P.dtype)
    timeit("strip kernel (plain, prebuilt)",
           jax.jit(_make_strip_kernel(params, tiles[0], False)), St, dt)
    timeit("strip kernel (stratified, prebuilt)",
           jax.jit(_make_strip_kernel(params, tiles[0], False,
                                      gravity_z=gz)), St, dt)

    # refill_z in isolation (re-created inline: the hydrostatic z-band
    # rebuild the stratified step runs after each phase)
    from ramsesgpu_tpu.solvers.shear import _stratified_ghost_slabs

    nv = params.nb_var
    from ramsesgpu_tpu.pallas.packed_io import YB

    @jax.jit
    def refill_z(Pn):
        interior = Pn[:nv, g : g + nz, YB : YB + ny, :]
        zlo, zhi = _stratified_ghost_slabs(params, interior)
        pady = ((0, 0), (0, 0), (YB, YB), (0, 0))
        return jnp.concatenate(
            [
                jnp.pad(zlo, pady, mode="wrap"),
                Pn[:, g : g + nz],
                jnp.pad(zhi, pady, mode="wrap"),
            ],
            axis=1,
        )

    timeit("refill_z (hydrostatic bands)", refill_z, P)

    step_plain = make_shear_packed_step(
        params.replace(gravity=""), tiles=tiles
    ) if False else None  # plain comparison comes from shear_phase_timing
    step_strat = make_shear_packed_step(params, tiles=tiles, gravity_z=gz)
    t_s = timeit("full stratified step",
                 jax.jit(lambda P, k, t: step_strat(P, k, t)),
                 P, kept, 0.0)
    print(f"stratified step throughput: {nx * ny * nz / t_s:.4g} cells/s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
