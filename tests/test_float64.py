"""Double-precision runs (the reference's USE_DOUBLE build flavor,
[implementation] dtype=float64).

jax_enable_x64 is process-global, so the run happens in a subprocess to
keep the rest of the suite on default float32 semantics.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

SCRIPT = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_advance_n

INI = '''
[run]
tend=10.0
[mesh]
nx=32
ny=32
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=Orszag-Tang
gamma0=1.666
riemannSolver=hlld
cfl=0.4
slope_type=2.0
[MHD]
enable=true
magRiemannSolver=hlld
[implementation]
dtype=float64
'''
config = ConfigMap(text=INI)
params = params_from_config(config)
jax.config.update("jax_enable_x64", True)
U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
assert U.dtype == jnp.float64, U.dtype
adv = make_advance_n(params, config)
U, t, k = adv(U, jnp.asarray(0.0, U.dtype), jnp.array(10, jnp.int32))
U = np.asarray(U)
g = params.ghost_width
bx, by = U[5], U[6]
div = (np.roll(bx, -1, -1) - bx) / params.dx + (np.roll(by, -1, -2) - by) / params.dy
out = {
    "dtype": str(U.dtype),
    "finite": bool(np.isfinite(U).all()),
    "steps": int(k),
    # f64 CT should hold divB near 1e-15 scale, far below f32 roundoff
    "divb": float(np.abs(div[g:-g-1, g:-g-1]).max()),
}
print("RESULT " + json.dumps(out))
"""


def test_float64_mhd_run():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # make the child work in a plain checkout (no editable install)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        env=env, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("RESULT ")][0]
    out = json.loads(line[len("RESULT "):])
    assert out["dtype"] == "float64"
    assert out["finite"]
    assert out["steps"] == 10
    assert out["divb"] < 1e-12
