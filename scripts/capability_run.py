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
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries
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

    print("init + boundary fill...", flush=True)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)
    _sync(U)

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
    t0j = jnp.asarray(0.0, U.dtype)
    pack, advp, unpack = make_pallas_advance_n(params, packed_form=True)
    P = pack(U)
    del U
    _sync(P)
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
