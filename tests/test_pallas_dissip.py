"""Fused dissipation kernel correctness (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

import ramsesgpu_tpu.pallas as pallas_pkg
from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.dissipation import (
    apply_dissipation_mhd,
    mhd_dissipation_interior_update,
)
from ramsesgpu_tpu.solvers.step import make_step_fn

OT3D_DISSIP_INI = """
[run]
tend=1.0
[mesh]
nx={nx}
ny={ny}
nz={nz}
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
nu={nu}
[MHD]
enable=true
magRiemannSolver=hlld
eta={eta}
"""


def _setup(nx=32, ny=16, nz=8, nu=2e-3, eta=1e-3):
    config = ConfigMap(
        text=OT3D_DISSIP_INI.format(nx=nx, ny=ny, nz=nz, nu=nu, eta=eta)
    )
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    return params, U


def test_dissipation_interior_update_matches_whole_array():
    """The scatter-free interior form (JNP mode) == apply_dissipation_mhd on
    the interior, including the CT-then-energy-flux sequencing."""
    params, U = _setup()
    g = params.ghost_width
    dt = jnp.asarray(3e-3, U.dtype)
    ref = np.asarray(apply_dissipation_mhd(params, U, dt))
    out = np.asarray(mhd_dissipation_interior_update(params, U, dt))
    np.testing.assert_allclose(
        out, ref[:, g:-g, g:-g, g:-g], rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("nu,eta", [(2e-3, 1e-3), (0.0, 1e-3), (2e-3, 0.0)])
def test_pallas_dissipative_step_matches_whole_array(nu, eta):
    """Godunov kernel + dissipation kernel composition (all-periodic fast
    path, interpret mode) vs the whole-array step."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_step_fn

    params, U = _setup(nu=nu, eta=eta)
    step_ref = make_step_fn(params.replace(kernel="jnp"))
    pallas_pkg.INTERPRET = True
    try:
        step_ker = make_pallas_step_fn(params.replace(pallas_tiles=(4, 8)))
        Ur = Uk = U
        t = jnp.asarray(0.0, U.dtype)
        for n, atol in enumerate((2e-6, 1e-5)):
            Ur, dt_r = step_ref(Ur, t)
            Uk, dt_k = step_ker(Uk, t)
            np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
            g = params.ghost_width
            np.testing.assert_allclose(
                np.asarray(Uk)[:, g:-g, g:-g, g:-g],
                np.asarray(Ur)[:, g:-g, g:-g, g:-g],
                rtol=0, atol=atol, err_msg=f"step {n}",
            )
            t = t + dt_r
    finally:
        pallas_pkg.INTERPRET = False


def test_packed_dissipative_advance_matches_whole_array():
    """Packed-IO loop with the dissipative second launch vs the whole-array
    advance (both all-periodic)."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import (
        make_pallas_advance_n,
        pallas_packed_supported,
    )
    from ramsesgpu_tpu.solvers.step import make_advance_n

    params, U = _setup(nx=128, ny=16, nz=8)
    assert pallas_packed_supported(params.replace(pallas_tiles=(4, 8)))
    adv_ref = make_advance_n(params.replace(kernel="jnp"))
    t0 = jnp.asarray(0.0, U.dtype)
    n = jnp.asarray(3, jnp.int32)
    Ur, tr, kr = adv_ref(U, t0, n)
    pallas_pkg.INTERPRET = True
    try:
        adv_ker = make_pallas_advance_n(params.replace(pallas_tiles=(4, 8)))
        Uk, tk, kk = adv_ker(U, t0, n)
    finally:
        pallas_pkg.INTERPRET = False
    assert int(kr) == int(kk)
    g = params.ghost_width
    np.testing.assert_allclose(
        np.asarray(Uk)[:, g:-g, g:-g, g:-g],
        np.asarray(Ur)[:, g:-g, g:-g, g:-g],
        rtol=0, atol=2e-5,
    )
