"""Probe: compile + time the z-streaming MHD kernel on the real chip vs the
packed-IO tiled kernel (256^3 Orszag-Tang, float32). Run on the TPU."""
import sys
import time

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.timestep import compute_dt
from ramsesgpu_tpu.pallas.packed_io import pack_state

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
INI = f"""
[run]
tend=10.0
[mesh]
nx={N}
ny={N}
nz={N}
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

config = ConfigMap(text=INI)
params = params_from_config(config)
print("backend:", jax.default_backend())

U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
dt = compute_dt(params, U)
g = params.ghost_width
P = pack_state(params, U[:, g:-g, g:-g, g:-g])
print("packed shape:", P.shape, "dt:", float(dt))

def timeit(name, step, P, dt, iters=10):
    t0 = time.time()
    out = step(P, dt)
    f = float(jnp.sum(out[0]))
    print(f"{name}: compiled+first in {time.time()-t0:.1f}s sum={f:.6g}")
    # warm
    out = step(out, dt)
    float(jnp.sum(out[0]))
    t0 = time.time()
    cur = out
    for _ in range(iters):
        cur = step(cur, dt)
    float(jnp.sum(cur[0]))
    el = (time.time() - t0) / iters
    cells = params.nx * params.ny * params.nz
    print(f"{name}: {el*1e3:.2f} ms/step  {cells/el/1e9:.3f} Gcell/s")
    return cur

which = sys.argv[2] if len(sys.argv) > 2 else "both"

if which in ("both", "zstream"):
    from ramsesgpu_tpu.pallas.zstream_mhd3d import (
        make_zstream_mhd_packed_io,
        pallas_zstream_supported,
        zstream_vmem_bytes,
    )
    print("zstream supported:", pallas_zstream_supported(params),
          "ring bytes:", zstream_vmem_bytes(params) / 1e6, "MB")
    zs = jax.jit(make_zstream_mhd_packed_io(params))
    try:
        Pz = timeit("zstream", zs, P, dt)
    except Exception as e:
        print("ZSTREAM FAILED:", type(e).__name__, str(e)[:500])
        Pz = None
else:
    Pz = None

if which in ("both", "packed"):
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io
    pk = jax.jit(make_fused_mhd_packed_io(params))
    Pp = timeit("packed ", pk, P, dt)
    if Pz is not None:
        d = jnp.max(jnp.abs(Pz - Pp))
        print("max |zstream-packed| after equal steps: N/A (different # steps)")
