"""End-to-end validation of the 2D unsplit Godunov scheme on the Sod tube.

The moral successor of the reference's golden-comparison harness
(reference: test/test_run.sh.in + test/computeL2relatif.py.in): here the
oracle is the exact Riemann solution.
"""
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
from ramsesgpu_tpu.solvers.step import make_advance_n

SOD_INI = """
[run]
tend=0.2
nstepmax=2000
noutput=0

[mesh]
nx={nx}
ny=16
nz=1
boundary_xmin=2
boundary_xmax=2
boundary_ymin=3
boundary_ymax=3

[hydro]
problem=sod
iorder=2
slope_type=1.0
scheme=muscl
riemannSolver={solver}
cfl=0.41
"""


def run_sod(nx=128, solver="hllc"):
    config = ConfigMap(text=SOD_INI.format(nx=nx, solver=solver))
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = make_boundaries(params, U)
    advance = make_advance_n(params)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(2000, jnp.int32))
    return params, np.asarray(U), float(t), int(k)


@pytest.mark.parametrize("solver", ["hllc", "hll", "approx"])
def test_sod_vs_exact(solver):
    nx = 128
    params, U, t, k = run_sod(nx=nx, solver=solver)
    assert t >= 0.2
    assert 50 < k < 2000

    g = params.ghost_width
    rho = U[ID, g:-g, g:-g].mean(axis=0)  # average over y (flow is 1D in x)
    mom = U[IU, g:-g, g:-g].mean(axis=0)
    ene = U[IP, g:-g, g:-g].mean(axis=0)
    u = mom / rho
    p = (params.gamma0 - 1.0) * (ene - 0.5 * rho * u * u)

    x = (np.arange(nx) + 0.5) / nx
    # the initial discontinuity sits at i = isize/2 (index space, ghost incl.)
    x0 = (params.isize / 2 - g) / nx
    rho_e, u_e, p_e = sod_exact(x, t, gamma=params.gamma0, x0=x0)

    l1_rho = np.mean(np.abs(rho - rho_e))
    l1_u = np.mean(np.abs(u - u_e))
    l1_p = np.mean(np.abs(p - p_e))
    # 2nd-order MUSCL at 128 cells: L1 errors of a few 1e-3
    assert l1_rho < 8e-3, f"L1(rho)={l1_rho}"
    assert l1_u < 2e-2, f"L1(u)={l1_u}"
    assert l1_p < 8e-3, f"L1(p)={l1_p}"

    # y-invariance: the 2D solver must keep a 1D problem 1D
    rho_2d = U[ID, g:-g, g:-g]
    assert np.max(np.std(rho_2d, axis=0)) < 1e-5


def test_conservation_periodic():
    """Mass/momentum/energy exactly conserved with periodic boundaries."""
    ini = """
[run]
tend=10.0
nstepmax=50
[mesh]
nx=64
ny=64
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=implode
riemannSolver=hllc
cfl=0.4
[implode]
amplitude=0.1
"""
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_boundaries(params, U0)
    advance = make_advance_n(params)
    U1, t, k = advance(U0, jnp.asarray(0.0, U0.dtype), jnp.array(50, jnp.int32))
    assert int(k) == 50

    g = params.ghost_width
    sl = (slice(None), slice(g, -g), slice(g, -g))
    tot0 = np.asarray(U0)[sl].sum(axis=(1, 2))
    tot1 = np.asarray(U1)[sl].sum(axis=(1, 2))
    # float32 accumulation: relative drift should be at roundoff level
    np.testing.assert_allclose(tot1, tot0, rtol=2e-5, atol=2e-5)


def test_dirichlet_reflection_symmetry():
    """A centered blast in a reflecting box must stay symmetric."""
    ini = """
[run]
tend=10.0
nstepmax=30
[mesh]
nx=64
ny=64
boundary_xmin=1
boundary_xmax=1
boundary_ymin=1
boundary_ymax=1
[hydro]
problem=blast
riemannSolver=hllc
cfl=0.4
[blast]
radius=0.1
center_x=0.5
center_y=0.5
"""
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = make_boundaries(params, U)
    advance = make_advance_n(params)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(30, jnp.int32))
    g = params.ghost_width
    rho = np.asarray(U)[ID, g:-g, g:-g]
    np.testing.assert_allclose(rho, rho[::-1, :], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rho, rho[:, ::-1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rho, rho.T, rtol=1e-5, atol=1e-6)
