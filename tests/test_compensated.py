"""Kahan-compensated f32 state accumulation ([implementation] compensated).

The TPU-native double-precision story (VERDICT round-2 item 4): the
reference's flagship runs are double precision (reference: README.md:5-7,
real_type.h:1-105), but TPU vector units have no f64 — emulated f64 via XLA
measures ~5.5e6 cells/s on this chip vs 4.3e8 for the compensated f32 packed
kernel (STATUS.md "Double precision" section). The dominant f32 error in
long runs is the ``U += dU`` accumulation loss (~eps*|U| per step, a random
walk), which a carried Kahan compensation channel removes at ~8% (periodic)
/ ~16% (MRI) cost. Measured on 100 steps of Orszag-Tang 32^3: L2 error vs
the f64 oracle drops 2.45e-7 -> 5.9e-8 (4.1x), and the gap widens as
sqrt(n_steps).

jax_enable_x64 is process-global, so the f64 oracle runs in a subprocess
(same pattern as test_float64.py).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries

OT_INI = """
[run]
tend=100.0
[mesh]
nx=32
ny=32
nz=32
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
"""

N_STEPS = 60

ORACLE_SCRIPT = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_advance_n

ini, n_steps, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
config = ConfigMap(text=open(ini).read())
config.set_string("implementation", "dtype", "float64")
params = params_from_config(config)
U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
adv = make_advance_n(params.replace(kernel="jnp"))
U2, t2, k = adv(U, jnp.asarray(0.0, U.dtype),
                jnp.array(n_steps, jnp.int32))
g = params.ghost_width
np.save(out_path, np.asarray(U2[:, g:-g, g:-g, g:-g], np.float64))
print(json.dumps({"t": float(t2), "k": int(k)}))
"""


def _run_packed(params, config, n_steps):
    import ramsesgpu_tpu.pallas as pk
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_advance_n

    pk.INTERPRET = True
    try:
        adv = make_pallas_advance_n(params.replace(kernel="pallas"))
        U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
        U2, t2, k = adv(U, jnp.asarray(0.0, U.dtype),
                        jnp.array(n_steps, jnp.int32))
    finally:
        pk.INTERPRET = False
    g = params.ghost_width
    return np.asarray(U2[:, g:-g, g:-g, g:-g], np.float64), float(t2)


def test_compensated_first_step_matches_plain():
    """With zero initial carry, one compensated step equals the plain step
    up to XLA fusion noise (the extra carry ops shift FMA-contraction
    boundaries by ~1 ULP on <1% of elements; y = dU - 0 is exact)."""
    config = ConfigMap(text=OT_INI)
    params = params_from_config(config)
    plain, t_p = _run_packed(params, config, 1)
    comp, t_c = _run_packed(params.replace(compensated=True), config, 1)
    assert t_p == t_c
    np.testing.assert_allclose(comp, plain, rtol=0, atol=5e-7)


def test_compensated_reduces_accumulation_error(tmp_path):
    """Over N_STEPS steps the compensated state lands measurably closer to
    the f64 oracle than the plain f32 state (reference tolerance model:
    test/computeL2relatif.py.in:44-50)."""
    ini = tmp_path / "ot3d.ini"
    ini.write_text(OT_INI)
    oracle_npy = tmp_path / "oracle.npy"
    script = tmp_path / "oracle.py"
    script.write_text(ORACLE_SCRIPT)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # make the child work in a plain checkout (no editable install)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    out = subprocess.run(
        [sys.executable, str(script), str(ini), str(N_STEPS),
         str(oracle_npy)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.splitlines()[-1])["k"] == N_STEPS
    oracle = np.load(oracle_npy)

    config = ConfigMap(text=OT_INI)
    params = params_from_config(config)
    plain, _ = _run_packed(params, config, N_STEPS)
    comp, _ = _run_packed(params.replace(compensated=True), config, N_STEPS)

    norm = np.sqrt((oracle ** 2).sum())
    err_plain = np.sqrt(((plain - oracle) ** 2).sum()) / norm
    err_comp = np.sqrt(((comp - oracle) ** 2).sum()) / norm
    # measured at 100 steps: 2.45e-7 vs 5.9e-8; require a robust 40% cut
    assert err_comp < 0.6 * err_plain, (err_plain, err_comp)
    assert err_plain < 1e-5


def test_compensated_mri_matches_whole_array():
    """Compensated packed MRI step stays within the plain parity envelope
    vs the (uncompensated) whole-array path over 2 steps."""
    from ramsesgpu_tpu.core.constants import IA
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        shear_packed_supported,
    )
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
    from ramsesgpu_tpu.solvers.step import make_step_fn

    MRI_INI = (
        open(os.path.join(os.path.dirname(__file__), "test_pallas_shear.py"))
        .read().split('MRI_INI = """')[1].split('"""')[0]
    )

    nx, ny, nz = 128, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(
        pallas_tiles=(4, 8), compensated=True
    )
    assert shear_packed_supported(params)
    U0 = make_all_boundaries_shear(
        params, jnp.asarray(init_problem(params, config)), 0.0
    )
    step_ref = make_step_fn(params.replace(kernel="jnp", compensated=False))
    step_ker = make_shear_packed_step_fn(params, interpret=True)
    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-6, 1e-5)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol,
        )
        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, nx + g],
            np.asarray(Ur)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol,
        )
