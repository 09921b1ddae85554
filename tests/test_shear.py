"""Shearing-box boundary and MRI problem tests."""
import jax
import jax.numpy as jnp
import numpy as np

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import IA, IB, IC, ID, IP, IU, IV, IW
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear, make_boundaries_shear
from ramsesgpu_tpu.solvers.step import make_advance_n

MRI_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=32
nz=16
xmin=-0.5
xmax=0.5
ymin=0.0
ymax=2.0
zmin=-0.5
zmax=0.5
boundary_xmin=4
boundary_xmax=4
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=MRI
cfl=0.4
gamma0=1.001
cIso=1.0
slope_type=2.0
riemannSolver=hlld
smallr=1e-8
smallc=1e-8
[MHD]
enable=true
magRiemannSolver=hlld
omega0=1.0
[MRI]
density=1.0
beta=400.0
type=noflux
amp=0.01
seed=3
"""


def _setup():
    config = ConfigMap(text=MRI_INI)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    return config, params, U


def test_shear_fill_at_t0_is_periodic():
    """At t=0 the shear remap has zero y-shift: ghost fill must equal the
    plain periodic fill in x."""
    config, params, U = _setup()
    periodic = params.replace(
        boundary_xmin=3, boundary_xmax=3  # BC_PERIODIC
    )
    U_per = make_boundaries(periodic, U)
    U_shear = make_all_boundaries_shear(params, U, jnp.asarray(0.0, U.dtype))
    g = params.ghost_width
    nx = params.nx
    # x ghost zones must match exactly (By uses the 1st-order+slope form
    # which at eps=0 is the plain copy)
    np.testing.assert_allclose(
        np.asarray(U_shear[..., 0:g]), np.asarray(U_per[..., 0:g]), atol=1e-6
    )
    # XMAX: all vars except the first Bx ghost column (deliberately kept)
    np.testing.assert_allclose(
        np.asarray(U_shear[:5, ..., nx + g :]),
        np.asarray(U_per[:5, ..., nx + g :]),
        atol=1e-6,
    )


def test_shear_fill_shifts_in_y():
    """At t with deltay = 3.5*dy, the ghost values must be the opposite
    border shifted by jplus cells with eps interpolation."""
    config, params, U = _setup()
    dy = params.dy
    Ly = dy * params.ny
    Lx = params.dx * params.nx
    # pick t so deltay = 3.5*dy exactly
    t = 3.5 * dy / (1.5 * params.omega0 * Lx)
    U_shear = make_boundaries_shear(params, U, jnp.asarray(t, U.dtype))
    g = params.ghost_width
    nx, ny = params.nx, params.ny

    # check density in the XMIN ghost: formula with jplus=3, epsi=0.5*dy
    bmax = np.asarray(U[..., nx : nx + g])
    got = np.asarray(U_shear[ID, ..., 0:g])
    j = np.arange(U.shape[-2])
    jr = j - 3 - 1
    jrp1 = jr + 1
    jr = np.where(jr < g, jr + ny, jr)
    jrp1 = np.where(jrp1 < g, jrp1 + ny, jrp1)
    eps = 1.0 - 0.5
    expected = (1 - eps) * bmax[ID][:, jr, :] + eps * bmax[ID][:, jrp1, :]
    interior_j = slice(g, -g)
    # slope (lambda) correction is bounded by the local variation; compare
    # against the linear part with a loose tolerance
    np.testing.assert_allclose(
        got[:, interior_j, :], expected[:, interior_j, :], rtol=0.2, atol=0.05
    )


def test_mri_runs_stable_with_divb():
    config, params, U = _setup()
    advance = make_advance_n(params)
    U1, t1, k1 = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(20, jnp.int32))
    assert int(k1) == 20
    U1 = np.asarray(U1)
    assert np.isfinite(U1).all()
    g = params.ghost_width
    rho = U1[ID][(slice(g, -g),) * 3]
    assert rho.min() > 0
    # divB stays small in the interior away from the shear borders
    bx, by, bz = U1[IA], U1[IB], U1[IC]
    div = (
        (np.roll(bx, -1, -1) - bx) / params.dx
        + (np.roll(by, -1, -2) - by) / params.dy
        + (np.roll(bz, -1, -3) - bz) / params.dz
    )
    # full interior INCLUDING the shear border columns: the emfY remap keeps
    # CT exact there too
    inner = div[g : -g - 1, g : -g - 1, g : -g - 1]
    scale = max(np.abs(bz).max(), 1e-10) / params.dx
    assert np.abs(inner).max() < 2e-3 * scale


def test_shear_flux_remap_conserves_mass():
    """The conservative density-flux remap at the sheared x-faces keeps total
    mass constant to float32 roundoff (measured 4e-10 over 30 steps; the
    unremapped step drifts ~8e-7 on the same run — reference:
    shearingBox_utils.cuh kernel_remapping_mhd_3d +
    kernel_update_shear_borders_3d)."""
    config, params, U = _setup()
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    m0 = np.asarray(U)[ID][sl].astype(np.float64).sum()
    advance = make_advance_n(params)
    U1, t1, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(30, jnp.int32))
    assert int(k) == 30
    m1 = np.asarray(U1)[ID][sl].astype(np.float64).sum()
    assert abs(m1 - m0) / m0 < 5e-9


def test_mri_history_has_stresses():
    from ramsesgpu_tpu.io.history import compute_history

    config, params, U = _setup()
    advance = make_advance_n(params)
    U1, t1, _ = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(5, jnp.int32))
    sample = compute_history(params, U1, float(t1), 0.0)
    assert "maxwellStress" in sample
    assert "reynoldsStress" in sample
    assert "alpha" in sample
    assert np.isfinite(sample["alpha"])


def test_fast_fill_matches_sequential():
    """The periodic-y/z one-pass fill (concat + wrap pad) must reproduce the
    sequential Y -> shear-X -> Z -> Y fill exactly, at several shear phases."""
    from ramsesgpu_tpu.solvers.boundary import _fill_side

    config, params, U = _setup()
    U = make_all_boundaries_shear(params, U, 0.0)  # consistent starting ghosts
    bts = params.boundary_types

    def sequential(U, t):
        V = _fill_side(params, U, -2, False, bts[2])
        V = _fill_side(params, V, -2, True, bts[3])
        V = make_boundaries_shear(params, V, t)
        V = _fill_side(params, V, -3, False, bts[4])
        V = _fill_side(params, V, -3, True, bts[5])
        V = _fill_side(params, V, -2, False, bts[2])
        V = _fill_side(params, V, -2, True, bts[3])
        return V

    for t in (0.0, 0.1234, 0.77, 3.5):
        t = jnp.asarray(t, U.dtype)
        fast = np.asarray(make_all_boundaries_shear(params, U, t))
        seq = np.asarray(sequential(U, t))
        np.testing.assert_array_equal(fast, seq)
