"""On-chip A/B of the pinned MHD trace (traceMerged) on the flagship.

Times the packed 3D MHD kernel (OT 256^3, HLLD) with and without
[implementation] traceMerged — the round-5 candidate for the flagship
flop cut (see scripts/trace_dup_probe.py for the XLA-cost-model
motivation). Parity is bitwise by construction (barriers only); this
script answers the only open question: does Mosaic inherit the
18-fusion-root duplication (merged wins big) or not (merged pays
materialization traffic for nothing).

Run on the TPU: python scripts/trace_merged_bench.py [n]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.problems import init_problem
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    sys.path.insert(0, str(REPO / "scripts"))
    from zcarry_validate import OT_INI, _sync

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    config = ConfigMap(text=OT_INI.format(nx=n, ny=n, nz=n))
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width
    P = pack_state(params, U[:, g:-g, g:-g, g:-g])
    dt = jnp.float32(1e-4)

    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io

    rec = {"grid": n}
    ref = None
    for name, pm in (
        ("plain", params),
        ("merged", params.replace(trace_merged=True)),
    ):
        k = jax.jit(make_fused_mhd_packed_io(pm))
        out = k(P, dt)
        _sync(out)
        if ref is None:
            ref = out
        else:
            rec["max_abs_diff"] = float(jnp.max(jnp.abs(out - ref)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = k(P, dt)
            _sync(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        rec[name + "_ms"] = best * 1e3
        rec[name + "_cells_per_s"] = n ** 3 / best
        print(json.dumps({name: rec[name + "_ms"]}), flush=True)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
