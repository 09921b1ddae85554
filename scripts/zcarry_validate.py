"""Staged TPU validation of the z-block-streaming (zcarry) kernels.

Executes the STATUS.md zcarry checklist as one resumable command: every
stage runs in a SUBPROCESS with its own timeout (a TPU-side kernel crash
wedges this box's device tunnel — the parent stays alive and records the
failure), stages are ordered smallest-first (64^3 before 256^3 before
any timing loop), and a short device-liveness probe runs between stages
so a wedged tunnel stops the ladder immediately instead of hanging every
later stage.  Results append to ZCARRY_VALIDATION.json.

Usage:
  python scripts/zcarry_validate.py              # run the whole ladder
  python scripts/zcarry_validate.py --stage zc64 # one stage, in-process
  python scripts/zcarry_validate.py --list

Reference analogue of the kernel being validated: the CUDA 4-plane
shared-memory ring (godunov_unsplit_mhd.cuh:753-800), generalized to
bz-plane blocks.
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

_ANSI = re.compile(r"\x1b\[[0-9;]*m")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "ZCARRY_VALIDATION.json"

OT_INI = """
[run]
tend=100.0
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
"""


def _setup_periodic(shape, compensated=False):
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    nx, ny, nz = (shape, shape, shape) if isinstance(shape, int) else shape
    config = ConfigMap(text=OT_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(compensated=compensated)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width
    interior = U[:, g:-g, g:-g, g:-g]
    if compensated:
        interior = jnp.concatenate(
            [interior, jnp.zeros_like(interior)], axis=0
        )
    P = pack_state(params, interior)
    return params, P


def _sync(x):
    import jax.numpy as jnp

    # block_until_ready is unreliable through the device tunnel; force a
    # device->host scalar instead (memory: tpu-env-quirks)
    return float(jnp.sum(jnp.ravel(x)[:8]))


def _timeit(fn, *args, iters=5):
    best = float("inf")
    for _ in range(2):
        _sync(fn(*args))
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _parity(n, with_inv_dt=False, compensated=False, time_it=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import (
        make_zcarry_mhd_packed_io,
        zcarry_supported,
    )

    params, P = _setup_periodic(n, compensated=compensated)
    # zcarry's manual HBM DMAs need lane-aligned x slices (Mosaic rejects
    # sub-128 lane slices of a padded tile, seen at 64^3 on hardware) —
    # the support gate (nx % 128 == 0) is authoritative; never probe
    # below it.
    assert zcarry_supported(params), (
        f"grid {n} outside zcarry support envelope (need nx%128==0, "
        "tile-divisible ny/nz)"
    )
    dt = jnp.asarray(1e-3, P.dtype)
    ref = jax.jit(make_fused_mhd_packed_io(params))
    zc = jax.jit(make_zcarry_mhd_packed_io(params, with_inv_dt=with_inv_dt))
    print(f"  [{n}^3] packed reference call...", flush=True)
    P_ref = ref(P, dt)
    _sync(P_ref)
    print(f"  [{n}^3] zcarry call...", flush=True)
    out = zc(P, dt)
    P_zc = out[0] if with_inv_dt else out
    _sync(P_zc)
    err = float(jnp.max(jnp.abs(P_zc - P_ref)))
    rec = {"max_abs_err": err, "ok": bool(err < 1e-5)}
    if with_inv_dt:
        from ramsesgpu_tpu.pallas.packed_io import YB
        from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd_packed

        inv_ref = float(compute_inv_dt_mhd_packed(params, P_zc, y0=YB))
        inv = float(out[1])
        rec["inv_dt"] = inv
        rec["inv_dt_ref"] = inv_ref
        # different fusion context -> allow FMA-contraction ULPs
        rec["ok"] = rec["ok"] and abs(inv - inv_ref) <= 1e-5 * abs(inv_ref)
    if time_it:
        def zc_state(P_, dt_):
            o = zc(P_, dt_)
            return o[0] if with_inv_dt else o

        rec["ms_packed"] = _timeit(ref, P, dt) * 1e3
        t_zc = _timeit(zc_state, P, dt)
        rec["ms_zcarry"] = t_zc * 1e3
        rec["cells_per_s_zcarry"] = n ** 3 / t_zc
    return rec


# ------------------------------------------------------------------ #
# stages
# ------------------------------------------------------------------ #

def stage_probe():
    from ramsesgpu_tpu.utils.platform import probe_device_alive

    alive, detail = probe_device_alive(timeout_s=240.0)
    return {"ok": alive, "detail": detail}


def stage_zc_min():
    """Smallest SUPPORTED grid (nx must be a lane multiple of 128)."""
    return _parity((128, 32, 32))


def stage_zc128():
    return _parity(128)


def stage_zc256():
    return _parity(256, time_it=True)


def stage_zc_invdt():
    return _parity(256, with_inv_dt=True, time_it=True)


def stage_zc_comp():
    return _parity(128, compensated=True)


def stage_advance():
    """advance_n loop with kernel=zcarry at 256^3 (the bench path)."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries
    from ramsesgpu_tpu.solvers.step import make_advance_n

    n = 256
    config = ConfigMap(text=OT_INI.format(nx=n, ny=n, nz=n))
    params = params_from_config(config).replace(kernel="zcarry")
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    adv = make_advance_n(params, config)
    t = jnp.asarray(0.0, U.dtype)
    n_iter = 10
    U1, t1, k = adv(U, t, jnp.array(2, jnp.int32))
    _sync(U1)
    # parity vs the packed advance over the same 2 steps
    adv_ref = make_advance_n(params.replace(kernel="pallas"), config)
    U1r, t1r, kr = adv_ref(U, t, jnp.array(2, jnp.int32))
    err = float(jnp.max(jnp.abs(U1 - U1r)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U2, t2, k2 = adv(U, t, jnp.array(n_iter, jnp.int32))
        _sync(U2)
        best = min(best, time.perf_counter() - t0)
    cps = n ** 3 * n_iter / best
    return {
        "max_abs_err_2steps": err,
        "ms_per_step": best / n_iter * 1e3,
        "cells_per_s": cps,
        "ok": bool(err < 2e-4 and int(k2) == n_iter),
    }


def stage_shear_small():
    """zcarry MAIN kernel vs packed main on a small MRI grid + the shear
    CFL kernel bitwise check."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.shear_packed import (
        _make_main_kernel,
        make_shear_cfl_kernel,
        pack_shear,
    )
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import make_zcarry_mhd_packed_io
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d.ini"))
    for k, v in (("nx", 128), ("ny", 64), ("nz", 32)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    P, kept = pack_shear(params, U)
    from ramsesgpu_tpu.solvers.timestep import compute_dt

    dt = jnp.asarray(float(compute_dt(params, U)), P.dtype)
    tiles = params.pallas_tiles or (8, 32)
    main = jax.jit(_make_main_kernel(params, tiles, False))
    zc = jax.jit(make_zcarry_mhd_packed_io(params, tiles=tiles))
    P_m = main(P, dt)
    _sync(P_m)
    P_z = zc(P, dt)
    _sync(P_z)
    err = float(jnp.max(jnp.abs(P_z - P_m)))
    cfl = make_shear_cfl_kernel(params)
    rec = {"max_abs_err": err, "ok": bool(err < 1e-5)}
    if cfl is not None:
        from ramsesgpu_tpu.core.constants import (
            IA, IB, IC, ID, IP, IU, IV, IW,
        )
        from ramsesgpu_tpu.pallas.packed_io import YB
        from ramsesgpu_tpu.solvers.timestep import _inv_dt_mhd_fields

        g = params.ghost_width
        nz, ny = params.nz, params.ny
        zi, yi = slice(g, g + nz), slice(YB, YB + ny)
        rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
        ia = P[IA, zi, yi, :]
        ia_p = jnp.concatenate([ia[..., 1:], kept[..., None]], axis=-1)
        inv_ref = float(_inv_dt_mhd_fields(
            params, P[ID, zi, yi, :], P[IP, zi, yi, :],
            P[IU, zi, yi, :] / rho, P[IV, zi, yi, :] / rho,
            P[IW, zi, yi, :] / rho,
            0.5 * (ia + ia_p),
            0.5 * (P[IB, zi, yi, :] + P[IB, zi, YB + 1 : YB + ny + 1, :]),
            0.5 * (P[IC, zi, yi, :] + P[IC, g + 1 : g + nz + 1, yi, :]),
        ))
        inv = float(cfl(P, kept))
        rec["inv_dt"], rec["inv_dt_ref"] = inv, inv_ref
        rec["ok"] = rec["ok"] and abs(inv - inv_ref) <= 1e-5 * abs(inv_ref)
    return rec


def stage_shear_flagship():
    """Full packed MRI step, packed-main vs zcarry-main, flagship grid,
    with timing."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_pallas_shear_advance_n,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    nx, ny, nz = 128, 256, 128
    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d.ini"))
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    t = jnp.asarray(0.0, U.dtype)
    n_iter = 10
    rec = {}
    for name, p in (("packed", params),
                    ("zcarry", params.replace(kernel="zcarry"))):
        adv = make_pallas_shear_advance_n(p)
        U1, t1, k1 = adv(U, t, jnp.array(2, jnp.int32))
        _sync(U1)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            U2, t2, k2 = adv(U, t, jnp.array(n_iter, jnp.int32))
            _sync(U2)
            best = min(best, time.perf_counter() - t0)
        rec[f"ms_per_step_{name}"] = best / n_iter * 1e3
        rec[f"cells_per_s_{name}"] = nx * ny * nz * n_iter / best
        rec[f"state_{name}"] = U2
    err = float(jnp.max(jnp.abs(rec.pop("state_zcarry")
                                - rec.pop("state_packed"))))
    rec["max_abs_err_10steps"] = err
    rec["ok"] = bool(err < 1e-3)
    return rec


def stage_hydro_zcarry():
    """Hydro z-block-streaming kernel: 64^3 parity, then 256^3 timing."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_fused_hydro_packed_io,
    )
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.pallas.zcarry_hydro3d import (
        make_zcarry_hydro_packed_io,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    ini = """
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
problem=blast
riemannSolver=hllc
[blast]
radius=0.2
"""
    from ramsesgpu_tpu.pallas.zcarry_hydro3d import zcarry_hydro_supported

    rec = {}
    for (nx, ny, nz), time_it in (((128, 32, 32), False),
                                  ((256, 256, 256), True)):
        n = nx  # label + cells/s below use the cube size when cubic
        config = ConfigMap(text=ini.format(nx=nx, ny=ny, nz=nz))
        params = params_from_config(config)
        assert zcarry_hydro_supported(params), (nx, ny, nz)
        U = make_boundaries(params,
                            jnp.asarray(init_problem(params, config)))
        g = params.ghost_width
        P = pack_state(params, U[:, g:-g, g:-g, g:-g])
        dt = jnp.asarray(1e-3, P.dtype)
        ref = jax.jit(make_fused_hydro_packed_io(params))
        zc = jax.jit(make_zcarry_hydro_packed_io(params))
        P_r = ref(P, dt)
        _sync(P_r)
        P_z = zc(P, dt)
        _sync(P_z)
        err = float(jnp.max(jnp.abs(P_z - P_r)))
        rec[f"max_abs_err_{n}"] = err
        if time_it:
            rec["ms_packed"] = _timeit(ref, P, dt) * 1e3
            t_zc = _timeit(zc, P, dt)
            rec["ms_zcarry"] = t_zc * 1e3
            rec["cells_per_s_zcarry"] = n ** 3 / t_zc
        if err > 1e-5:
            rec["ok"] = False
            return rec
    rec["ok"] = True
    return rec


def stage_strip_fused():
    """Fused-borders strip kernel (dynamic Mosaic lane rolls) vs the v1
    strip + XLA glue, one step on a small MRI grid."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        strip_fused_supported,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d.ini"))
    for k, v in (("nx", 128), ("ny", 128), ("nz", 16)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    assert strip_fused_supported(params)
    U0 = jnp.asarray(init_problem(params, config))
    U0 = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U0)
    t0 = jnp.asarray(0.0, U0.dtype)
    step_v1 = jax.jit(make_shear_packed_step_fn(params))
    step_v2 = jax.jit(make_shear_packed_step_fn(
        params.replace(strip_fused=True)
    ))
    U1, dt1 = step_v1(U0, t0)
    _sync(U1)
    U2, dt2 = step_v2(U0, t0)
    _sync(U2)
    err = float(jnp.max(jnp.abs(U2 - U1)))
    return {"max_abs_err": err, "dt_rel": abs(float(dt2) - float(dt1)),
            "ok": bool(err < 1e-5)}


def stage_shear_flagship_fused():
    """Flagship MRI with zcarry main + fused strip, timed."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_pallas_shear_advance_n,
    )
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    nx, ny, nz = 128, 256, 128
    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d.ini"))
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config).replace(
        kernel="zcarry", strip_fused=True
    )
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    t = jnp.asarray(0.0, U.dtype)
    n_iter = 10
    adv = make_pallas_shear_advance_n(params)
    adv_ref = make_pallas_shear_advance_n(
        params.replace(kernel="pallas", strip_fused=False)
    )
    U1, t1, k1 = adv(U, t, jnp.array(2, jnp.int32))
    _sync(U1)
    U1r, t1r, k1r = adv_ref(U, t, jnp.array(2, jnp.int32))
    err = float(jnp.max(jnp.abs(U1 - U1r)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U2, t2, k2 = adv(U, t, jnp.array(n_iter, jnp.int32))
        _sync(U2)
        best = min(best, time.perf_counter() - t0)
    return {
        "max_abs_err_2steps": err,
        "ms_per_step": best / n_iter * 1e3,
        "cells_per_s": nx * ny * nz * n_iter / best,
        "ok": bool(err < 1e-3),
    }


def _strat_setup(nx, ny, nz):
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    config = ConfigMap(str(REPO / "data" / "mhd_mri_3d_stratified.ini"))
    for k, v in (("nx", nx), ("ny", ny), ("nz", nz)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_all_boundaries_shear(params, u, 0.0))(U)
    return config, params, U


def stage_strat_small():
    """HARDWARE compile of the stratified shear kernels, round-5 redesign:
    gz is evaluated on HOST and DMA'd in as an aux input plane
    (packed_io aux / strip gz channel) — the round-4 in-kernel 3D-iota
    construction SIGABRTed the remote Mosaic AOT compiler
    ("Check failed: limits[i] <= dim(i)") and wedged the tunnel. Small
    grid; the parity reference is the SAME packed step in interpret mode —
    a Mosaic-miscompile detector (the whole-array comparison, with its
    per-step legitimate divergence, is the CPU tests' job:
    tests/test_pallas_shear.py:296)."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        shear_packed_supported,
    )
    from ramsesgpu_tpu.solvers.step import (
        _mri_gz_profile,
        make_gravity_field,
    )

    config, params, U0 = _strat_setup(128, 64, 32)
    assert shear_packed_supported(params, stratified=True)
    prof = _mri_gz_profile(
        params, config, make_gravity_field(params, config)
    )
    assert prof is not None
    step_hw = jax.jit(make_shear_packed_step_fn(params, gravity_z=prof))
    step_in = make_shear_packed_step_fn(params, interpret=True,
                                        gravity_z=prof)
    t = jnp.asarray(0.0, U0.dtype)
    print("  stratified packed step: Mosaic compile + 2 steps...",
          flush=True)
    Uh = Ui = U0
    th = ti = t
    err = dt_rel = 0.0
    for _ in range(2):
        Uh, dth = step_hw(Uh, th)
        _sync(Uh)
        Ui, dti = step_in(Ui, ti)
        th, ti = th + dth, ti + dti
        err = max(err, float(jnp.max(jnp.abs(Uh - Ui))))
        dt_rel = max(dt_rel,
                     abs(float(dth) - float(dti)) / abs(float(dti)))
    return {"max_abs_err_2steps": err, "dt_rel": dt_rel,
            "ok": bool(err < 1e-5 and dt_rel < 1e-5)}


def stage_strat_flagship():
    """Stratified MRI at the flagship grid, packed advance (kernel=pallas)
    timed — the candidate replacement for the current whole-array PERF.md
    row (125 ms/step). Correctness is strat_small's job; here we guard
    finiteness and measure."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.solvers.step import make_advance_n

    nx, ny, nz = 128, 256, 128
    config, params, U = _strat_setup(nx, ny, nz)
    t = jnp.asarray(0.0, U.dtype)
    adv = make_advance_n(params.replace(kernel="pallas"), config)
    U1, t1, k1 = adv(U, t, jnp.array(2, jnp.int32))
    _sync(U1)
    n_iter = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U2, t2, k2 = adv(U, t, jnp.array(n_iter, jnp.int32))
        _sync(U2)
        best = min(best, time.perf_counter() - t0)
    return {
        "ms_per_step": best / n_iter * 1e3,
        "cells_per_s": nx * ny * nz * n_iter / best,
        "finite": bool(jnp.all(jnp.isfinite(U2))),
        "ok": bool(jnp.all(jnp.isfinite(U2)) and int(k2) == n_iter),
    }


def _bc_setup(n):
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    config = ConfigMap(str(REPO / "data" / "implode3d.ini"))
    for k in ("nx", "ny", "nz"):
        config.set_integer("mesh", k, n)
    params = params_from_config(config)
    U = jax.jit(lambda u: make_boundaries(params, u))(
        jnp.asarray(init_problem(params, config))
    )
    return config, params, U


def stage_bc_small():
    """HARDWARE compile + Mosaic-miscompile check of the padded-carry
    non-periodic hydro loop (pallas/packed_bc.py: in-kernel ghost-band
    rebuild + streaming hydro CFL) at implode 64^3: the jitted advance on
    the chip vs the same advance in interpret mode, 3 steps. Whole-array
    parity is the CPU tests' job (tests/test_pallas.py::
    test_packed_bc_advance_matches_step)."""
    import jax.numpy as jnp

    import ramsesgpu_tpu.pallas as pallas_pkg
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_pallas_hydro_bc_advance_n,
    )
    from ramsesgpu_tpu.pallas.packed_bc import packed_bc_supported

    _config, params, U0 = _bc_setup(64)
    assert packed_bc_supported(params)
    adv_hw = make_pallas_hydro_bc_advance_n(params)
    pallas_pkg.INTERPRET = True
    try:
        adv_in = make_pallas_hydro_bc_advance_n(params)
    finally:
        pallas_pkg.INTERPRET = False
    t = jnp.asarray(0.0, U0.dtype)
    n = jnp.array(3, jnp.int32)
    print("  packed-BC advance: Mosaic compile + 3 steps...", flush=True)
    Uh, th, kh = adv_hw(U0, t, n)
    _sync(Uh)
    Ui, ti, ki = adv_in(U0, t, n)
    err = float(jnp.max(jnp.abs(Uh - Ui)))
    t_rel = abs(float(th) - float(ti)) / max(abs(float(ti)), 1e-30)
    return {"max_abs_err_3steps": err, "t_rel": t_rel,
            "steps": int(kh),
            "ok": bool(err < 1e-5 and t_rel < 1e-6 and int(kh) == 3)}


def stage_bc_flagship():
    """Implode 256^3 (approx solver, 6 reflecting walls) through
    make_advance_n's auto routing — the candidate replacement for the
    57.2 ms/step ghosted-path PERF row. Guards finiteness + routing."""
    import jax.numpy as jnp

    from ramsesgpu_tpu.pallas.fused_hydro3d import hydro_packed_supported
    from ramsesgpu_tpu.pallas.packed_bc import packed_bc_supported
    from ramsesgpu_tpu.solvers.step import make_advance_n

    config, params, U = _bc_setup(256)
    assert packed_bc_supported(params) and not hydro_packed_supported(
        params
    )
    adv = make_advance_n(params.replace(kernel="pallas"), config)
    t = jnp.asarray(0.0, U.dtype)
    U1, t1, k1 = adv(U, t, jnp.array(2, jnp.int32))
    _sync(U1)
    n_iter = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U2, t2, k2 = adv(U, t, jnp.array(n_iter, jnp.int32))
        _sync(U2)
        best = min(best, time.perf_counter() - t0)
    return {
        "ms_per_step": best / n_iter * 1e3,
        "cells_per_s": 256 ** 3 * n_iter / best,
        "finite": bool(jnp.all(jnp.isfinite(U2))),
        "ok": bool(jnp.all(jnp.isfinite(U2)) and int(k2) == n_iter),
    }


STAGES = [
    ("probe", stage_probe, 300),
    ("zc_min", stage_zc_min, 900),
    ("zc128", stage_zc128, 900),
    ("zc256", stage_zc256, 1500),
    ("zc_invdt", stage_zc_invdt, 1500),
    ("zc_comp", stage_zc_comp, 1200),
    ("advance", stage_advance, 1800),
    ("shear_small", stage_shear_small, 1200),
    ("hydro_zcarry", stage_hydro_zcarry, 1500),
    ("strip_fused", stage_strip_fused, 1200),
    ("shear_flagship", stage_shear_flagship, 2400),
    ("shear_flagship_fused", stage_shear_flagship_fused, 2400),
    ("strat_small", stage_strat_small, 1800),
    ("strat_flagship", stage_strat_flagship, 2400),
    ("bc_small", stage_bc_small, 1500),
    ("bc_flagship", stage_bc_flagship, 2400),
]


def _record(name, rec):
    hist = []
    if OUT.exists():
        try:
            hist = json.loads(OUT.read_text())
        except Exception:
            hist = []
    if isinstance(rec.get("error"), str):
        rec["error"] = _ANSI.sub("", rec["error"])
    hist.append({"stage": name, "ts": time.time(), **rec})
    OUT.write_text(json.dumps(hist, indent=1) + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", help="run ONE stage in-process")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--from", dest="from_stage",
                    help="start the ladder at this stage")
    args = ap.parse_args()

    if args.list:
        for n, _, to in STAGES:
            print(f"{n}  (timeout {to}s)")
        return 0

    if args.stage:
        from ramsesgpu_tpu.utils.platform import honor_platform_env

        honor_platform_env()  # JAX_PLATFORMS=cpu smoke runs work
        if args.stage != "probe":
            # jax.default_backend() INITIALIZES the backend — the probe
            # stage must not hold a tunnel client while its inner
            # liveness subprocess inits its own (the tunnel serializes
            # clients; holding one here deadlocks the probe into a
            # false "wedged" verdict).
            import jax

            if jax.default_backend() != "tpu":
                import ramsesgpu_tpu.pallas as _pk

                _pk.INTERPRET = True  # CPU smoke: interpret-mode kernels
        fn = dict((n, f) for n, f, _ in STAGES)[args.stage]
        rec = fn()
        print(json.dumps({"stage": args.stage, **rec}))
        return 0 if rec.get("ok") else 1

    started = args.from_stage is None
    for name, _fn, to in STAGES:
        if not started:
            if name == args.from_stage:
                started = True
            else:
                continue
        print(f"=== stage {name} (timeout {to}s) ===", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--stage", name],
                capture_output=True, text=True, timeout=to,
            )
        except subprocess.TimeoutExpired:
            rec = {"ok": False, "error": f"timeout after {to}s "
                   "(tunnel wedged?)"}
            _record(name, rec)
            print(f"  FAILED: {rec['error']} — stopping the ladder")
            return 1
        tail = proc.stdout.strip().splitlines()
        rec = None
        for line in reversed(tail):
            try:
                rec = json.loads(line)
                break
            except Exception:
                continue
        if rec is None:
            rec = {"ok": False,
                   "error": (proc.stderr or "no output")[-1500:]}
        rec["wall_s"] = round(time.time() - t0, 1)
        _record(name, rec)
        print(f"  -> {json.dumps(rec)[:400]}", flush=True)
        if not rec.get("ok"):
            print("  stage failed — stopping the ladder "
                  "(fix, then resume with --from)", flush=True)
            return 1
    print("ALL STAGES GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
