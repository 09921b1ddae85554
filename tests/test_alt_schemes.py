"""Alternative schemes: split Godunov vs exact Sod, KT / Lax-Liu /
relaxing-TVD sanity on standard problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exact_riemann import sod_exact
from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import ID, IP, IU, IV
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.timestep import compute_dt

SOD_INI = """
[run]
tend=0.2
[mesh]
nx=128
ny=16
boundary_xmin=2
boundary_xmax=2
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=sod
iorder=2
slope_type=1.0
scheme=muscl
riemannSolver=hllc
cfl=0.41
XLAMBDA=0.1
YLAMBDA=0.1
ALPHA_KT=1.4
"""


def _setup(ghost_width=None):
    config = ConfigMap(text=SOD_INI)
    params = params_from_config(config)
    if ghost_width:
        params = params.replace(ghost_width=ghost_width)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    return config, params, U


def _sod_l1(params, U, t):
    g = params.ghost_width
    rho = np.asarray(U)[ID, g:-g, g:-g].mean(axis=0)
    x = (np.arange(params.nx) + 0.5) / params.nx
    x0 = (params.isize / 2 - g) / params.nx
    rho_e, _, _ = sod_exact(x, t, gamma=params.gamma0, x0=x0)
    return np.mean(np.abs(rho - rho_e))


def test_split_godunov_sod():
    from ramsesgpu_tpu.solvers.alt_schemes import godunov_split_step

    config, params, U = _setup()
    t = 0.0
    for k in range(400):
        if t >= 0.2:
            break
        dt = float(compute_dt(params, U))
        U = godunov_split_step(params, U, jnp.asarray(dt, U.dtype), k)
        t += dt
    l1 = _sod_l1(params, U, t)
    assert np.isfinite(np.asarray(U)).all()
    assert l1 < 1.2e-2, l1


def test_kurganov_tadmor_sod():
    from ramsesgpu_tpu.solvers.alt_schemes import kt_step

    config, params, U = _setup()
    dt = params.xlambda * params.dx
    t = 0.0
    step_odd = jax.jit(lambda u: kt_step(params, u, True, params.xlambda, params.ylambda))
    step_even = jax.jit(lambda u: kt_step(params, u, False, params.xlambda, params.ylambda))
    for k in range(int(0.2 / dt) + 1):
        U = step_odd(U) if k % 2 else step_even(U)
        t += dt
    assert np.isfinite(np.asarray(U)).all()
    # KT is dissipative first-order-ish at this lambda: loose tolerance
    l1 = _sod_l1(params, U, t)
    assert l1 < 4e-2, l1


def test_laxliu_sod():
    from ramsesgpu_tpu.solvers.alt_laxliu import laxliu_step

    config, params, U = _setup()
    dt = params.xlambda * params.dx
    step = jax.jit(lambda u: laxliu_step(params, u))
    t = 0.0
    for k in range(int(0.2 / dt) + 1):
        U = step(U)
        t += dt
    assert np.isfinite(np.asarray(U)).all()
    l1 = _sod_l1(params, U, t)
    assert l1 < 4e-2, l1


def test_relaxing_tvd_sod():
    from ramsesgpu_tpu.solvers.alt_schemes import relaxing_tvd_step

    config, params, U = _setup(ghost_width=3)
    t = 0.0
    for k in range(400):
        if t >= 0.2:
            break
        dt = float(compute_dt(params, U))
        U = relaxing_tvd_step(params, U, jnp.asarray(dt, U.dtype), k)
        t += dt
    assert np.isfinite(np.asarray(U)).all()
    l1 = _sod_l1(params, U, t)
    assert l1 < 4e-2, l1
