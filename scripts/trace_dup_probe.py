"""Measure fusion-duplication of the 3D MHD trace on the XLA cost model.

Each of the 18 face/edge state stacks the trace emits
(ops/trace_mhd3d.trace_mhd3d_state_parts) is a separate fusion root;
XLA duplicates the shared half-step chain into every root it feeds, and
`cost_analysis()` counts the duplicated flops (verified with a
micro-probe: a 100-flop chain consumed by two 2-stacks counts ~206, by
one 3-stack ~104). This script quantifies the effect on the real trace
and the effect of the ``traceMerged`` knob (one concatenate, builders
slice), which is the round-5 candidate for the flagship flop cut
(PERF_ANALYSIS.md "what could still move the flagship number" #3).

Run on CPU: python scripts/trace_dup_probe.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


OT_INI = """
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


def main() -> int:
    jax.config.update("jax_platforms", "cpu")
    from ramsesgpu_tpu.config.configmap import ConfigMap
    from ramsesgpu_tpu.config.params import params_from_config

    n = 64
    cells = n ** 3
    params = params_from_config(ConfigMap(text=OT_INI.format(n=n)))

    def cost(fn, *args):
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        return float(ca.get("flops", 0.0)) / cells

    from ramsesgpu_tpu.ops.trace_mhd3d import trace_unsplit_mhd_3d_parts

    Q = jnp.ones((8, n, n, n), jnp.float32) * 0.4
    U = jnp.ones((8, n, n, n), jnp.float32) * 0.5
    dt = jnp.float32(1e-3)

    def all_states(q, u, merged):
        P = trace_unsplit_mhd_3d_parts(
            params, q, u[5], u[6], u[7], dt, None, merged=merged
        )
        return [P[k]() for k in P]

    rec = {
        "grid": n,
        "trace_18_stacks_flops_per_cell": cost(
            lambda q, u: all_states(q, u, False), Q, U
        ),
        "trace_merged_flops_per_cell": cost(
            lambda q, u: all_states(q, u, True), Q, U
        ),
    }
    rec["duplication_factor"] = (
        rec["trace_18_stacks_flops_per_cell"]
        / rec["trace_merged_flops_per_cell"]
    )
    print(json.dumps(rec, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
