"""Turbulence forcing tests: static-spectrum injection and OU driving."""
import jax.numpy as jnp
import numpy as np

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import ID, IP, IU, IV, IW
from ramsesgpu_tpu.ops import forcing as fz
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_forced_advance_n

TURB_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=16
nz=16
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=turbulence
riemannSolver=hllc
cfl=0.5
[turbulence]
density=1.0
pressure=1.0
machNumber=1.0
edot=0.5
"""

OU_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=16
nz=16
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=turbulence-Ornstein-Uhlenbeck
riemannSolver=hllc
cfl=0.5
cIso=1.0
[turbulence-Ornstein-Uhlenbeck]
density=1.0
pressure=1.0
timeScaleTurb=0.12
amplitudeTurb=0.5
ksi=1.0
init_random=600
"""


def test_turbulence_static_field_properties():
    params = params_from_config(ConfigMap(text=TURB_INI))
    F = fz.turbulence_init_field(params, 1.0)
    assert F.shape == (3,) + params.shape[1:]
    # rms 3D Mach should equal the requested Mach number (interior)
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    rms = np.sqrt((F[0][sl] ** 2 + F[1][sl] ** 2 + F[2][sl] ** 2).mean())
    assert 0.5 < rms < 2.0  # normalization of turbulenceInit.cpp:193-196
    # near-solenoidal: mean of each component ~ 0
    assert abs(F[0][sl].mean()) < 0.05 * rms


def test_turbulence_energy_injection():
    config = ConfigMap(text=TURB_INI)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    advance, fstate = make_forced_advance_n(params, config)
    U1, _, t1, k1 = advance(U, fstate, jnp.asarray(0.0, U.dtype), jnp.array(10, jnp.int32))
    assert int(k1) == 10
    U1 = np.asarray(U1)
    assert np.isfinite(U1).all()
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    e0 = np.asarray(U)[IP][sl].sum()
    e1 = U1[IP][sl].sum()
    # energy injected at rate edot*nbCells: after 10 steps expect growth
    assert e1 > e0
    # mass conserved (forcing does not touch density)
    np.testing.assert_allclose(
        U1[ID][sl].sum(), np.asarray(U)[ID][sl].sum(), rtol=1e-5
    )


def test_ou_forcing_spins_up_from_rest():
    config = ConfigMap(text=OU_INI)
    params = params_from_config(config)
    assert params.c_iso == 1.0
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    # starts at rest
    assert float(jnp.abs(U[IU]).max()) == 0.0
    advance, fstate = make_forced_advance_n(params, config)
    U1, fstate1, t1, k1 = advance(
        U, fstate, jnp.asarray(0.0, U.dtype), jnp.array(30, jnp.int32)
    )
    assert int(k1) == 30
    U1 = np.asarray(U1)
    assert np.isfinite(U1).all()
    ke = (U1[IU] ** 2 + U1[IV] ** 2 + U1[IW] ** 2).sum()
    assert ke > 0.0  # the OU force has put the gas in motion
    # forcing state evolved away from zero
    assert float(jnp.abs(fstate1["forcingField"]).max()) > 0.0


def test_ou_forcing_checkpoint_roundtrip(tmp_path):
    fp = fz.OUForcingParams(timescale=0.12, amplitude=0.5, ksi=1.0)
    state = fz.init_ou_forcing(fp, seed=7)
    params = params_from_config(ConfigMap(text=OU_INI))
    state = fz.update_forcing_field_mode(params, fp, state, jnp.asarray(0.01))
    path = tmp_path / "forcing_check.npz"
    fz.save_ou_forcing(state, path)
    state2 = fz.load_ou_forcing(path)
    np.testing.assert_allclose(
        np.asarray(state["forcingField"]), np.asarray(state2["forcingField"])
    )
    np.testing.assert_allclose(np.asarray(state["mode"]), np.asarray(state2["mode"]))
    np.testing.assert_allclose(
        np.asarray(state["projTens"]), np.asarray(state2["projTens"])
    )


def test_ou_projection_tensor_solenoidal():
    """ksi=0 must give a purely solenoidal projector: P.k = 0... note the
    reference's convention P = (1-2ksi) k k^T / |k|^2 + ksi I; for ksi=0 the
    projector is k k^T/|k|^2 (compressive!), matching DUMSES where ksi is the
    solenoidal/compressive mix weight. Check P k = k for ksi=0."""
    fp = fz.OUForcingParams(ksi=0.0)
    state = fz.init_ou_forcing(fp, seed=3)
    proj = np.asarray(state["projTens"])  # [3,3,31]
    mode = np.asarray(state["mode"])
    for m in range(fz.N_MODE_OU):
        Pk = proj[:, :, m].T @ mode[:, m]
        np.testing.assert_allclose(Pk, mode[:, m], rtol=1e-6, atol=1e-6)
