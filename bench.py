"""Flagship benchmark: 3D MHD+CT cell-updates/s per chip.

Mirrors the reference's built-in throughput metric ("cell updates per
seconds (based on wall time)", MHDRunGodunov.cpp:4063-4068) on the
north-star workload (BASELINE.md): 3D MHD+CT at 256^3 per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e9 (the >=1 Gcell-update/s/chip target).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_step_fn

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
[implementation]
zSlabNb={slabs}
"""


def bench_size(n: int, slabs: int, n_warmup: int = 2, n_iter: int = 10):
    config = ConfigMap(text=_INI.format(n=n, slabs=slabs))
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = jax.jit(lambda u: make_boundaries(params, u))(U)

    from ramsesgpu_tpu.solvers.step import (
        make_advance_n,
        make_packed_advance_chain,
    )

    # one device dispatch per measured chunk (the production path): the
    # while_loop advance amortizes host->TPU dispatch latency exactly like a
    # real run does. Chain the packed form across chunks when available so
    # the ghosted<->packed conversion happens once, not per chunk — the
    # steady state of a production run with one long output interval.
    chain = make_packed_advance_chain(params)
    if chain is not None:
        pack, advance, _unpack = chain
        U = pack(U)  # donates the ghosted state
    else:
        advance = make_advance_n(params)
    t = jnp.asarray(0.0, U.dtype)

    # warmup / compile. TWO warmup chunks: the first post-compile execution
    # through the remote-TPU tunnel is anomalously slow (~10x), the second
    # reaches steady state.
    for _ in range(2):
        U, t, k = advance(U, t, jnp.array(n_warmup, jnp.int32))
        # value-forcing sync: a device->host scalar cannot complete before
        # the compute chain has actually run (block_until_ready alone proved
        # unreliable through the remote-TPU tunnel)
        float(jnp.sum(t))

    # best of 3 chunks: the remote-TPU tunnel occasionally injects one slow
    # dispatch; steady-state throughput is what the metric means
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        U, t, k = advance(U, t, jnp.array(n_iter, jnp.int32))
        checksum = float(jnp.sum(U[0]))
        best = min(best, time.perf_counter() - t0)
        if int(k) != n_iter:
            raise RuntimeError(f"advance stopped early: {int(k)}/{n_iter}")
        if not (checksum == checksum):  # NaN guard
            raise RuntimeError("non-finite state during benchmark")

    cells = n**3
    return n_iter * cells / best


def _emit_error(detail: str) -> None:
    print(json.dumps({
        "metric": f"error: {detail}",
        "value": 0, "unit": "cells/s", "vs_baseline": 0,
    }), flush=True)


def main() -> int:
    import os
    import threading

    from ramsesgpu_tpu.utils.platform import (
        classify_bench_error,
        honor_platform_env,
        probe_device_alive,
    )

    honor_platform_env()

    # A TPU-side kernel crash wedges this box's device tunnel: every later
    # backend init HANGS (no error).  Probe in a killable subprocess first
    # so a dead tunnel yields the honest-zero JSON in minutes, not a
    # harness timeout (round-2 lesson: rc=124, no scoreboard number).
    # A healthy-but-cold tunnel can take minutes of client init (measured
    # 65/104/294 s on 2026-08-20) — and killing a slow probe appears to
    # serialize the NEXT client behind the server-side teardown, making a
    # short probe timeout self-defeating. One long attempt + one retry:
    # a genuinely wedged tunnel never answers either.
    probe_timeout = float(os.environ.get("RAMSES_PROBE_TIMEOUT", "480"))
    alive, detail = probe_device_alive(timeout_s=probe_timeout)
    if not alive:
        print(f"first device probe failed ({detail}); retrying",
              file=sys.stderr)
        alive, detail = probe_device_alive(timeout_s=probe_timeout / 2)
    if not alive:
        _emit_error(detail)
        return 1
    print(f"device probe ok: {detail}", file=sys.stderr)

    # watchdog backstop: if the tunnel wedges mid-bench, emit the honest
    # zero before the harness kills us. 20 min (post-probe) >> healthy-path
    # worst case (remote compile ~8 min + warmup).
    def _too_long():
        _emit_error("device unresponsive within 1200s (tunnel wedged mid-run?)")
        os._exit(1)

    watchdog = threading.Timer(1200.0, _too_long)
    watchdog.daemon = True
    watchdog.start()

    value = None
    used_n = None
    # z-slab count bounds the live scratch of the whole-array pipeline
    # (solvers/zslab.py) so 256^3 fits one chip's HBM
    for n, slabs in ((256, 16), (192, 8), (128, 4), (64, 1)):
        try:
            value = bench_size(n, slabs)
            used_n = n
            break
        except Exception as exc:
            kind = classify_bench_error(exc)
            print(f"bench at {n}^3 failed ({kind}): "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            if kind == "fatal":
                # backend dead/unreachable: smaller grids cannot succeed,
                # and each retry costs ~25 min against a wedged tunnel
                watchdog.cancel()
                _emit_error(f"backend dead at {n}^3: {type(exc).__name__}")
                return 1
            continue  # OOM (or unclassified): retry smaller
    watchdog.cancel()
    if value is None:
        _emit_error("all grid sizes failed")
        return 1

    print(
        json.dumps(
            {
                "metric": f"cell-updates/s/chip (3D MHD+CT HLLD, {used_n}^3, float32)",
                "value": round(value, 1),
                "unit": "cells/s",
                "vs_baseline": round(value / 1e9, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
