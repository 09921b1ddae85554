"""MHD solver validation: HLLD vs exact hydro oracle, CT divB preservation,
conservation, and the classic 2D MHD test problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exact_riemann import sod_exact
from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_advance_n


def run_problem(ini: str, n_steps: int):
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = make_boundaries(params, U)
    advance = make_advance_n(params)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(n_steps, jnp.int32))
    return params, np.asarray(U), float(t), int(k)


def div_b(params, U):
    bx, by = U[IA], U[IB]
    d = (np.roll(bx, -1, axis=-1) - bx) / params.dx + (
        np.roll(by, -1, axis=-2) - by
    ) / params.dy
    if params.dim == 3:
        bz = U[IC]
        d = d + (np.roll(bz, -1, axis=-3) - bz) / params.dz
    g = params.ghost_width
    sl = (slice(g, -g - 1),) * params.dim
    return d[sl]


MHD_SOD_INI = """
[run]
tend=0.2
[mesh]
nx=128
ny=8
boundary_xmin=2
boundary_xmax=2
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=sod
riemannSolver=hlld
cfl=0.4
[MHD]
enable=true
magRiemannSolver=hlld
"""


def test_mhd_sod_vs_exact():
    """With B=0 the HLLD MHD path must reproduce the exact hydro solution —
    the moral successor of the reference's CPU/GPU cross-check."""
    params, U, t, k = run_problem(MHD_SOD_INI, 2000)
    assert t >= 0.2
    g = params.ghost_width
    rho = U[ID, g:-g, g:-g].mean(axis=0)
    mom = U[IU, g:-g, g:-g].mean(axis=0)
    u = mom / rho
    x = (np.arange(params.nx) + 0.5) / params.nx
    x0 = (params.isize / 2 - g) / params.nx
    rho_e, u_e, p_e = sod_exact(x, t, gamma=params.gamma0, x0=x0)
    l1 = np.mean(np.abs(rho - rho_e))
    assert l1 < 8e-3, f"L1(rho)={l1}"
    # B must remain exactly zero
    assert np.abs(U[IA]).max() == 0.0
    assert np.abs(U[IB]).max() == 0.0


OT_INI = """
[run]
tend=0.5
[mesh]
nx=64
ny=64
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
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


def test_orszag_tang_divb_and_conservation():
    params, U0_j, _, _ = run_problem(OT_INI, 0)
    params, U, t, k = run_problem(OT_INI, 80)
    assert k == 80
    assert np.isfinite(U).all()

    # divB stays at float32 roundoff (CT property)
    b_over_dx = np.abs(U[IA]).max() / params.dx
    assert np.abs(div_b(params, U)).max() < 1e-4 * b_over_dx

    # mass and energy conserved (periodic box)
    g = params.ghost_width
    sl = (slice(g, -g),) * 2
    mass0 = U0_j[ID][sl].sum()
    mass1 = U[ID][sl].sum()
    np.testing.assert_allclose(mass1, mass0, rtol=1e-5)
    e0 = U0_j[IP][sl].sum()
    e1 = U[IP][sl].sum()
    np.testing.assert_allclose(e1, e0, rtol=1e-4)


@pytest.mark.parametrize("solver", ["hlld", "llf"])
def test_orszag_tang_solvers_stable(solver):
    ini = OT_INI.replace("riemannSolver=hlld", f"riemannSolver={solver}")
    params, U, t, k = run_problem(ini, 40)
    assert np.isfinite(U).all()
    g = params.ghost_width
    assert U[ID][g:-g, g:-g].min() > 0


FIELD_LOOP_INI = """
[run]
tend=1.0
[mesh]
nx=64
ny=64
xmin=-0.5
xmax=0.5
ymin=-0.5
ymax=0.5
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=FieldLoop
cfl=0.4
gamma0=1.666
slope_type=2.0
riemannSolver=hlld
smallr=1e-7
smallc=1e-7
[MHD]
enable=true
magRiemannSolver=hlld
[FieldLoop]
radius=0.3
amplitude=0.001
vflow=1.0
"""


def test_field_loop_advection():
    """Advected field loop: divB = 0 to roundoff and magnetic energy decays
    only slightly (no spurious amplification)."""
    params, U0, _, _ = run_problem(FIELD_LOOP_INI, 0)
    params, U, t, k = run_problem(FIELD_LOOP_INI, 100)
    assert np.isfinite(U).all()
    b_over_dx = max(np.abs(U[IA]).max(), 1e-10) / params.dx
    assert np.abs(div_b(params, U)).max() < 1e-3 * b_over_dx

    g = params.ghost_width
    sl = (slice(g, -g),) * 2
    em0 = (U0[IA][sl] ** 2 + U0[IB][sl] ** 2).sum()
    em1 = (U[IA][sl] ** 2 + U[IB][sl] ** 2).sum()
    assert em1 <= em0 * 1.01          # no spurious growth
    assert em1 >= em0 * 0.5           # not wiped out by diffusion


BRIOWU_INI = """
[run]
tend=0.1
[mesh]
nx=256
ny=8
boundary_xmin=2
boundary_xmax=2
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=BrioWu
riemannSolver=hlld
gamma0=2.0
cfl=0.4
[MHD]
enable=true
magRiemannSolver=hlld
"""


def test_briowu_structure():
    """Brio-Wu shock tube: check the well-known structural features at t~0.1
    (compound wave, contact, right densities)."""
    params, U, t, k = run_problem(BRIOWU_INI, 4000)
    assert t >= 0.1
    g = params.ghost_width
    rho = U[ID, g:-g, g:-g].mean(axis=0)
    # left state intact near boundary, right state intact near the other
    np.testing.assert_allclose(rho[0], 1.0, atol=1e-3)
    np.testing.assert_allclose(rho[-1], 0.125, atol=1e-3)
    # density stays within physical bracket and has the characteristic
    # intermediate plateau (max intermediate density < 0.9, > 0.6)
    assert rho.min() > 0.05 and rho.max() < 1.05
    interior = rho[params.nx // 4 : 3 * params.nx // 4]
    assert interior.max() > 0.5
    # Bx must remain constant (CT: no update of the normal field in 1D flow)
    bx = U[IA, g:-g, g:-g]
    np.testing.assert_allclose(bx, 0.75, atol=2e-3)


MHD3D_INI = """
[run]
tend=1.0
[mesh]
nx=16
ny=16
nz=16
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
problem=FieldLoop
cfl=0.4
gamma0=1.666
slope_type=2.0
riemannSolver=hlld
smallr=1e-7
smallc=1e-7
[MHD]
enable=true
magRiemannSolver=hlld
[FieldLoop]
radius=0.3
amplitude=0.001
vflow=1.0
amp=0.0
"""


def test_mhd_3d_divb_and_conservation():
    params, U0, _, _ = run_problem(MHD3D_INI, 0)
    params, U, t, k = run_problem(MHD3D_INI, 25)
    assert k == 25
    assert np.isfinite(U).all()
    b_over_dx = max(np.abs(U[IA]).max(), 1e-10) / params.dx
    assert np.abs(div_b(params, U)).max() < 1e-3 * b_over_dx
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    np.testing.assert_allclose(U[ID][sl].sum(), U0[ID][sl].sum(), rtol=1e-5)
    np.testing.assert_allclose(U[IP][sl].sum(), U0[IP][sl].sum(), rtol=1e-4)


def test_resistivity_decays_field():
    """With eta > 0 the current sheet's magnetic energy must decay."""
    ini = OT_INI + "\neta=0.05\n"
    # note: eta lives in the [MHD] section; append there
    ini = OT_INI.replace("magRiemannSolver=hlld", "magRiemannSolver=hlld\neta=0.05")
    params, U0, _, _ = run_problem(ini, 0)
    params, U, t, k = run_problem(ini, 30)
    assert params.eta == 0.05
    assert np.isfinite(U).all()
    g = params.ghost_width
    sl = (slice(g, -g),) * 2
    em0 = (U0[IA][sl] ** 2 + U0[IB][sl] ** 2).sum()
    em1 = (U[IA][sl] ** 2 + U[IB][sl] ** 2).sum()
    assert em1 < em0 * 0.95
    # resistive CT keeps divB at roundoff
    b_over_dx = np.abs(U[IA]).max() / params.dx
    assert np.abs(div_b(params, U)).max() < 1e-4 * b_over_dx
