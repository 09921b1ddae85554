"""Capability-scale single-chip run: the biggest 3D MHD grid a v5e fits.

The reference's identity is big runs (MRI 800x1600x800 on 256 GPUs,
/root/reference/README.md:5-7; 2000^3 via z-slab,
/root/reference/ChangeLog:34-38, memory model memory_footprint.py:10-21).
This script proves the single-chip end of that story on real hardware:

  1. asks the memory planner for the prediction at the target grid,
  2. runs the packed advance loop (the production path — the fused
     kernel never materializes the intermediate pipeline, so the state
     dominates) for a few steps, reports measured cells/s and the
     device-memory high-water mark,
  3. optionally (--zslab N) also runs the whole-array z-slab step, the
     path whose O(nz/zSlabNb) scratch bound the planner models — this is
     the memory-capacity mechanism, expected slow (no Pallas), run at a
     reduced step count.

Appends to PERF_CAPABILITY.json. Run alone on the TPU (single-client
tunnel).

Usage: python scripts/capability_run.py [n] [--steps K] [--zslab N]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / "PERF_CAPABILITY.json"

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


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:8]))


def _packed_ot_init(params):
    """Orszag-Tang initial condition built ON DEVICE directly in the
    kernel's packed layout [nvar, nz+2g, ny+2*YB, nx] (one jit, no host
    array): at 512^3 the host-numpy init + 5.5 GiB tunnel transfer took
    ~20 min and the ghosted+filled+packed transients peaked ~13-15 GiB
    (measured RESOURCE_EXHAUSTED twice). Same formulas as
    problems/mhd_inits.init_orszag_tang (MHDRunBase.cpp:1378-1520),
    evaluated in f32 on the interior; the wrap pad IS the periodic
    ghost fill."""
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.core.constants import IA, IB, IC, ID, IP, IU, IV, IW
    from ramsesgpu_tpu.pallas.packed_io import YB

    g = params.ghost_width
    nz, ny, nx = params.nz, params.ny, params.nx
    two_pi = 2.0 * float(jnp.pi)
    B0 = 1.0 / (2.0 * two_pi) ** 0.5
    p0 = params.gamma0 / (2.0 * two_pi)
    d0 = params.gamma0 * p0

    @jax.jit
    def build():
        dt = jnp.float32
        i = jax.lax.broadcasted_iota(dt, (nz, ny, nx), 2)
        j = jax.lax.broadcasted_iota(dt, (nz, ny, nx), 1)
        x = params.xmin + params.dx / 2 + i * params.dx
        y = params.ymin + params.dy / 2 + j * params.dy
        rho = jnp.full((nz, ny, nx), d0, dt)
        mu = -d0 * jnp.sin(y * two_pi)
        mv = d0 * jnp.sin(x * two_pi)
        zero = jnp.zeros((nz, ny, nx), dt)
        bx = -B0 * jnp.sin(y * two_pi)
        by = B0 * jnp.sin(2.0 * x * two_pi)
        bxc = 0.5 * (bx + jnp.roll(bx, -1, -1))
        byc = 0.5 * (by + jnp.roll(by, -1, -2))
        ekin = 0.5 * (mu**2 + mv**2) / rho
        emag = 0.5 * (bxc**2 + byc**2)
        e = p0 / (params.gamma0 - 1.0) + ekin + emag
        ch = [zero] * params.nb_var
        ch[ID], ch[IP], ch[IU], ch[IV], ch[IW] = rho, e, mu, mv, zero
        ch[IA], ch[IB], ch[IC] = bx, by, zero
        interior = jnp.stack(ch)
        return jnp.pad(
            interior, ((0, 0), (g, g), (YB, YB), (0, 0)), mode="wrap"
        )

    return build()


def device_mem_stats():
    import jax

    try:
        s = jax.devices()[0].memory_stats()
        if s:
            return {
                "bytes_in_use": int(s.get("bytes_in_use", -1)),
                "peak_bytes_in_use": int(s.get("peak_bytes_in_use", -1)),
                "bytes_limit": int(s.get("bytes_limit", -1)),
            }
    except Exception as e:  # tunnel device may not expose stats
        return {"error": str(e)}
    return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=512)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--zslab", type=int, default=0)
    # (bz, by) override: at nx=512 the default (8,32) tile spills 193M of
    # vmem (128M budget) in the Mosaic register allocator and (8,16) is
    # 2.2M over; (8,8) is the measured fit (see PERF_CAPABILITY.json)
    ap.add_argument("--tiles", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.utils.memory_footprint import estimate

    n = args.n
    config = ConfigMap(text=_INI.format(n=n))
    params = params_from_config(config)
    if args.tiles:
        bz, by = (int(v) for v in args.tiles.split(","))
        params = params.replace(pallas_tiles=(bz, by))
    rec = {"ts": time.time(), "n": n, "device": str(jax.devices()[0]),
           "tiles": params.pallas_tiles}

    plan = estimate(params)
    print(f"== memory planner at {n}^3 ==")
    for k, v in plan.items():
        print(f"  {k:28s}: {v:8.2f}")
    rec["planner"] = plan

    print("device-side packed init...", flush=True)
    P = _packed_ot_init(params)
    _sync(P)

    # ---- packed advance (production path) ----
    from ramsesgpu_tpu.pallas.fused_mhd3d import (
        make_pallas_advance_n, pallas_packed_supported,
    )

    assert pallas_packed_supported(params), "grid outside the packed path"
    # packed-form entry: at 512^3 the ghosted lane-padded external state
    # (~5.5 GiB) cannot coexist with the loop's packed double buffer
    # (~9 GiB) plus the unpacked output — measured RESOURCE_EXHAUSTED with
    # the standard advance_n. packed_form keeps only the packed state
    # alive across the run (donated buffers; timing calls chain).
    t0j = jnp.asarray(0.0, P.dtype)
    _, advp, unpack = make_pallas_advance_n(params, packed_form=True)
    print("compile + 2 warmup steps...", flush=True)
    t0 = time.perf_counter()
    P, t1, k1 = advp(P, t0j, jnp.array(2, jnp.int32))
    _sync(P)
    rec["compile_plus_2steps_s"] = time.perf_counter() - t0
    print(f"  done in {rec['compile_plus_2steps_s']:.1f} s", flush=True)
    rec["mem_after_warmup"] = device_mem_stats()

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        P, t1, k1 = advp(P, t1, jnp.array(args.steps, jnp.int32))
        _sync(P)
        best = min(best, (time.perf_counter() - t0) / args.steps)
    cps = n**3 / best
    rec.update(ms_per_step_packed=best * 1e3, cells_per_s_packed=cps,
               steps=args.steps)
    print(f"packed advance: {best * 1e3:.1f} ms/step = {cps:.3e} cells/s")
    print(f"mem stats: {rec['mem_after_warmup']}")

    # sanity: state stays finite (first 8 z-planes of every channel)
    rec["finite"] = bool(jnp.all(jnp.isfinite(P[:, :8])))

    if args.zslab > 0:
        from ramsesgpu_tpu.solvers.step import make_step_fn

        U = unpack(P)
        del P
        _sync(U)
        p_z = params.replace(z_slab_nb=args.zslab, kernel="jnp")
        plan_z = estimate(p_z)
        rec["planner_zslab"] = plan_z
        print(f"== z-slab whole-array step, zSlabNb={args.zslab} ==")
        print(f"  planner zslab_pipeline_GiB: "
              f"{plan_z['zslab_pipeline_GiB']:.2f}")
        step = jax.jit(make_step_fn(p_z))
        t0 = time.perf_counter()
        Uz, dtz = step(U, jnp.asarray(0.0, U.dtype))
        _sync(Uz)
        rec["zslab_compile_plus_1step_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        Uz, dtz = step(Uz, dtz)
        _sync(Uz)
        rec["ms_per_step_zslab"] = (time.perf_counter() - t0) * 1e3
        rec["mem_after_zslab"] = device_mem_stats()
        print(f"  zslab step: {rec['ms_per_step_zslab']:.0f} ms "
              f"(mem {rec['mem_after_zslab']})")

    hist = []
    if OUT.exists():
        try:
            hist = json.loads(OUT.read_text())
        except Exception:
            hist = []
    hist.append(rec)
    OUT.write_text(json.dumps(hist, indent=1) + "\n")
    print(f"recorded -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
