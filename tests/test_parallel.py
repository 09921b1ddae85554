"""Distributed (shard_map) correctness: sharded runs must reproduce the
single-device runs bit-for-bit (hydro) / to roundoff (MHD).

The moral successor of the reference's MPI test suite
(test/mpiHydro/testCopyBorderBuffer.cpp etc.), run on the 8-device virtual
CPU mesh from conftest.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_advance_n
from ramsesgpu_tpu.parallel.mesh import make_mesh, validate_decomposition
from ramsesgpu_tpu.parallel.sharded_step import (
    make_sharded_advance_n,
    shard_global_state,
)

HYDRO_INI = """
[run]
tend=10.0
[mesh]
nx=64
ny=64
boundary_xmin=3
boundary_xmax=3
boundary_ymin=2
boundary_ymax=1
[hydro]
problem=blast
riemannSolver=hllc
cfl=0.4
[blast]
radius=0.1
center_x=0.4
center_y=0.6
"""

MHD3D_INI = """
[run]
tend=10.0
[mesh]
nx=32
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


def _single_device_reference(ini: str, n_steps: int):
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U0 = init_problem(params, config)
    U = make_boundaries(params, jnp.asarray(U0))
    advance = make_advance_n(params, config)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(n_steps, jnp.int32))
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    return params, config, U0, np.asarray(U)[sl], float(t), int(k)


def _sharded(params, config, U0, mesh, n_steps):
    Ug = shard_global_state(params, mesh, U0)
    advance = make_sharded_advance_n(params, mesh, config)
    U, t, k = advance(Ug, jnp.asarray(0.0, Ug.dtype), jnp.array(n_steps, jnp.int32))
    return np.asarray(jax.device_get(U)), float(t), int(k)


@pytest.mark.parametrize("topo", [(8, 1, 1), (4, 2, 1), (2, 4, 1), (1, 8, 1), (2, 2, 1)])
def test_hydro_2d_sharded_parity(topo):
    """2D hydro: sharded result must be bitwise identical across any mesh
    shape, with mixed periodic/neumann/dirichlet physical BCs."""
    mx, my, _ = topo
    params, config, U0, ref, t1, k1 = _single_device_reference(HYDRO_INI, 20)
    validate_decomposition(params, mx, my, 1)
    mesh = make_mesh(mx=mx, my=my)
    out, t2, k2 = _sharded(params, config, U0, mesh, 20)
    assert k1 == k2
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-5)


def test_mhd_3d_sharded_parity():
    """3D MHD+CT across a 2x2x2 mesh matches the single-device run."""
    params, config, U0, ref, t1, k1 = _single_device_reference(MHD3D_INI, 8)
    mesh = make_mesh(mx=2, my=2, mz=2)
    out, t2, k2 = _sharded(params, config, U0, mesh, 8)
    assert k1 == k2
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


HYDRO3D_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=16
nz=16
boundary_xmin=3
boundary_xmax=3
boundary_ymin=2
boundary_ymax=2
boundary_zmin=1
boundary_zmax=1
[hydro]
problem=blast
riemannSolver=hllc
cfl=0.4
[blast]
radius=0.15
center_x=0.4
center_y=0.6
center_z=0.5
"""


def test_mhd_3d_halo_overlap_parity():
    """[implementation] haloOverlap: the deep/shell overlapped step matches
    the synchronous sharded step to FMA-reassociation roundoff (different
    window shapes vectorize differently; single-step diff is ~1e-10 on the
    CT fields, dt is bit-identical) and the single-device run to the same
    tolerance as the plain sharded path."""
    params, config, U0, ref, t1, k1 = _single_device_reference(MHD3D_INI, 8)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 8)
    over, to, ko = _sharded(
        params.replace(halo_overlap=True), config, U0, mesh, 8
    )
    assert kp == ko == k1
    np.testing.assert_allclose(over, plain, rtol=0, atol=1e-6)
    np.testing.assert_allclose(over, ref, rtol=0, atol=5e-6)


def test_hydro_3d_halo_overlap_parity():
    """Hydro overlap with mixed periodic/neumann/dirichlet BCs (the shells on
    domain-edge shards see physical BC fills, the deep region never does)."""
    params, config, U0, ref, t1, k1 = _single_device_reference(HYDRO3D_INI, 10)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 10)
    over, to, ko = _sharded(
        params.replace(halo_overlap=True), config, U0, mesh, 10
    )
    assert kp == ko == k1
    # blast energies are O(25): ULP-level FMA divergence needs rtol framing
    np.testing.assert_allclose(over, plain, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(over, ref, rtol=1e-5, atol=1e-5)


def test_mhd_3d_halo_overlap_pallas_deep_parity():
    """Overlap + fused kernel composition: the Pallas kernel computes the
    deep region (padded to tile multiples, junk rows never consumed by kept
    cells) while the shells stay whole-array. Must match the plain sharded
    path to roundoff (interpret-mode kernels on the virtual mesh)."""
    import ramsesgpu_tpu.pallas as pallas_pkg

    params, config, U0, ref, t1, k1 = _single_device_reference(MHD3D_INI, 6)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 6)
    pallas_pkg.INTERPRET = True
    try:
        over, to, ko = _sharded(
            params.replace(halo_overlap=True, kernel="pallas"),
            config, U0, mesh, 6,
        )
    finally:
        pallas_pkg.INTERPRET = False
    assert kp == ko
    np.testing.assert_allclose(over, plain, rtol=0, atol=1e-5)
    np.testing.assert_allclose(over, ref, rtol=0, atol=1e-5)


def test_hydro_3d_halo_overlap_pallas_deep_parity():
    import ramsesgpu_tpu.pallas as pallas_pkg

    params, config, U0, ref, t1, k1 = _single_device_reference(HYDRO3D_INI, 8)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 8)
    pallas_pkg.INTERPRET = True
    try:
        over, to, ko = _sharded(
            params.replace(halo_overlap=True, kernel="pallas"),
            config, U0, mesh, 8,
        )
    finally:
        pallas_pkg.INTERPRET = False
    assert kp == ko
    np.testing.assert_allclose(over, plain, rtol=1e-5, atol=1e-5)


def test_hydro_3d_sharded_gravity_parity():
    """Per-shard ghosted gravity windows: uniform [gravity] field, sharded
    vs single-device (predictor kick + conservative source term)."""
    ini = HYDRO3D_INI + "\n[gravity]\nstatic_field_z=-0.5\n"
    params, config, U0, ref, t1, k1 = _single_device_reference(ini, 10)
    assert params.gravity_z == -0.5
    mesh = make_mesh(mx=2, my=2, mz=2)
    out, t2, k2 = _sharded(params, config, U0, mesh, 10)
    assert k1 == k2
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_mhd_3d_sharded_dissipation_parity():
    """Distributed dissipation: the resistive+viscous sub-step gets its own
    halo exchange; sharded matches single-device."""
    ini = MHD3D_INI.replace("enable=true", "enable=true\neta=0.005").replace(
        "cfl=0.4", "cfl=0.4\nnu=0.003"
    )
    params, config, U0, ref, t1, k1 = _single_device_reference(ini, 6)
    assert params.eta == 0.005 and params.nu == 0.003
    mesh = make_mesh(mx=2, my=2, mz=2)
    out, t2, k2 = _sharded(params, config, U0, mesh, 6)
    assert k1 == k2
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-6)


def test_mhd_3d_sharded_dissipation_pallas_parity():
    """Sharded Godunov + dissipation kernels per shard (interpret mode)
    match the whole-array sharded path."""
    import ramsesgpu_tpu.pallas as pallas_pkg

    ini = MHD3D_INI.replace("enable=true", "enable=true\neta=0.005").replace(
        "cfl=0.4", "cfl=0.4\nnu=0.003"
    )
    params, config, U0, ref, t1, k1 = _single_device_reference(ini, 4)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 4)
    pallas_pkg.INTERPRET = True
    try:
        kern, tk, kk = _sharded(
            params.replace(kernel="pallas"), config, U0, mesh, 4
        )
    finally:
        pallas_pkg.INTERPRET = False
    assert kp == kk
    np.testing.assert_allclose(kern, plain, rtol=0, atol=1e-5)


@pytest.mark.parametrize("problem_block", [
    "problem=turbulence\nriemannSolver=hllc\ncfl=0.5\n"
    "[turbulence]\ndensity=1.0\npressure=1.0\nmachNumber=1.0\nedot=0.5",
    "problem=turbulence-Ornstein-Uhlenbeck\nriemannSolver=hllc\ncfl=0.5\n"
    "cIso=1.0\n[turbulence-Ornstein-Uhlenbeck]\ndensity=1.0\npressure=1.0\n"
    "timeScaleTurb=0.12\namplitudeTurb=0.5\nksi=1.0\ninit_random=600",
])
def test_forced_turbulence_sharded_parity(problem_block):
    """Distributed turbulence forcing: per-shard static field / OU basis
    slices + psum normalization; replicated OU mode evolution (identical
    PRNG streams on every shard)."""
    from ramsesgpu_tpu.solvers.step import make_forced_advance_n
    from ramsesgpu_tpu.parallel.sharded_step import (
        make_sharded_forced_advance_n)

    ini = f"""
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
{problem_block}
"""
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U0 = init_problem(params, config)
    U = make_boundaries(params, jnp.asarray(U0))
    adv, f0 = make_forced_advance_n(params, config)
    Ur, fr, tr, kr = adv(U, f0, jnp.asarray(0.0, U.dtype),
                         jnp.array(6, jnp.int32))
    g = params.ghost_width
    ref = np.asarray(Ur)[(slice(None),) + (slice(g, -g),) * 3]

    mesh = make_mesh(mx=2, my=2, mz=2)
    Us = shard_global_state(params, mesh, U0)
    adv_s, f0s = make_sharded_forced_advance_n(params, mesh, config)
    Uo, fo, to, ko = adv_s(Us, f0s, jnp.asarray(0.0, U.dtype),
                           jnp.array(6, jnp.int32))
    assert int(kr) == int(ko) == 6
    np.testing.assert_allclose(np.asarray(Uo), ref, rtol=1e-5, atol=2e-5)


def test_forced_gravity_sharded_parity():
    """Forcing + static gravity compose under sharding (the reference
    composes them freely through the HydroRunBase wrapper hierarchy,
    HydroRunBase.h:80-359; this was a NotImplementedError until round 5):
    gravity windows thread through the forced advance exactly like the
    unforced sharded advance."""
    from ramsesgpu_tpu.solvers.step import make_forced_advance_n
    from ramsesgpu_tpu.parallel.sharded_step import (
        make_sharded_forced_advance_n)

    ini = """
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
[gravity]
static_field_z=-0.1
"""
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U0 = init_problem(params, config)
    U = make_boundaries(params, jnp.asarray(U0))
    adv, f0 = make_forced_advance_n(params, config)
    Ur, fr, tr, kr = adv(U, f0, jnp.asarray(0.0, U.dtype),
                         jnp.array(6, jnp.int32))
    g = params.ghost_width
    ref = np.asarray(Ur)[(slice(None),) + (slice(g, -g),) * 3]

    mesh = make_mesh(mx=2, my=2, mz=2)
    Us = shard_global_state(params, mesh, U0)
    adv_s, f0s = make_sharded_forced_advance_n(params, mesh, config)
    Uo, fo, to, ko = adv_s(Us, f0s, jnp.asarray(0.0, U.dtype),
                           jnp.array(6, jnp.int32))
    assert int(kr) == int(ko) == 6
    np.testing.assert_allclose(np.asarray(Uo), ref, rtol=1e-5, atol=2e-5)


def test_overlap_supported_gating():
    from ramsesgpu_tpu.parallel.overlap import overlap_supported

    params = params_from_config(ConfigMap(text=MHD3D_INI))
    assert overlap_supported(params, (8, 8, 16))
    assert not overlap_supported(params, (8, 8, 6))      # degenerate deep
    assert not overlap_supported(params.replace(eta=0.1), (8, 8, 16))
    assert not overlap_supported(params.replace(omega0=1.0), (8, 8, 16))
    # MHD thin dt exchange assumes periodic rings
    assert not overlap_supported(params.replace(boundary_zmax=1), (8, 8, 16))
    hp = params_from_config(ConfigMap(text=HYDRO3D_INI))
    assert overlap_supported(hp, (8, 8, 8))              # mixed BCs fine


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


@pytest.mark.parametrize("topo", [(2, 2, 2), (4, 1, 2)])
def test_mri_3d_sharded_shear_parity(topo):
    """Distributed shearing box (SURVEY 'hardest part #1'): sharded MRI
    matches the single-device run; total mass is conserved through the
    distributed conservative flux remap; divB stays at roundoff including
    the shear borders."""
    from ramsesgpu_tpu.core.constants import IA, IB, IC, ID

    mx, my, mz = topo
    params, config, U0, ref, t1, k1 = _single_device_reference(MRI_INI, 8)
    validate_decomposition(params, mx, my, mz)
    mesh = make_mesh(mx=mx, my=my, mz=mz)
    out, t2, k2 = _sharded(params, config, U0, mesh, 8)
    assert k1 == k2
    # the t=0 initial sheared fill differs from the plain periodic fill by
    # the conservative-By slope form (~1e-6); allow that plus growth
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)

    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    m0 = np.asarray(U0)[ID][sl].astype(np.float64).sum()
    m1 = out[ID].astype(np.float64).sum()
    assert abs(m1 - m0) / m0 < 1e-8

    # divB on the full interior of the sharded result (re-frame with the
    # sheared ghost fill at the final time)
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear

    Ug = np.pad(out, ((0, 0),) + ((g, g),) * 3)
    Ug = np.asarray(make_all_boundaries_shear(params, jnp.asarray(Ug),
                                              jnp.asarray(t2)))
    bx, by, bz = Ug[IA], Ug[IB], Ug[IC]
    div = (
        (np.roll(bx, -1, -1) - bx) / params.dx
        + (np.roll(by, -1, -2) - by) / params.dy
        + (np.roll(bz, -1, -3) - bz) / params.dz
    )
    inner = div[g : -g - 1, g : -g - 1, g : -g - 1]
    scale = max(np.abs(bz).max(), 1e-10) / params.dx
    assert np.abs(inner).max() < 2e-3 * scale


STRAT_MRI_INI = """
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
zmin=-1.0
zmax=1.0
boundary_xmin=4
boundary_xmax=4
boundary_ymin=3
boundary_ymax=3
boundary_zmin=6
boundary_zmax=6
[hydro]
problem=MRI
cfl=0.4
gamma0=1.001
cIso=0.3
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
beta=100.0
type=none
amp=0.01
seed=12
smoothGravity=true
zFloor=4.0
[gravity]
static=yes
"""


@pytest.mark.parametrize("topo", [(2, 2, 2), (2, 1, 4)])
def test_mri_stratified_sharded_parity(topo):
    """Distributed STRATIFIED MRI: static vertical gravity windows + the
    BC_Z_STRATIFIED fill on the z-edge shards + the sheared x borders, all
    under shard_map, must match the single-device stratified run."""
    mx, my, mz = topo
    params, config, U0, ref, t1, k1 = _single_device_reference(
        STRAT_MRI_INI, 6
    )
    validate_decomposition(params, mx, my, mz)
    mesh = make_mesh(mx=mx, my=my, mz=mz)
    out, t2, k2 = _sharded(params, config, U0, mesh, 6)
    assert k1 == k2
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-5)


def test_mri_3d_sharded_shear_pallas_parity():
    """Sharded MRI with the fused shear kernel per shard (remap corrections
    through the comm collectives) matches the whole-array sharded path.
    Small drift allowed: the kernel path's carried ghosts skip the border
    CT touches the whole-array update applies (next fill rebuilds them),
    so the one-fill-stale dt differs at roundoff."""
    import ramsesgpu_tpu.pallas as pallas_pkg

    params, config, U0, ref, t1, k1 = _single_device_reference(MRI_INI, 4)
    mesh = make_mesh(mx=2, my=2, mz=2)
    plain, tp, kp = _sharded(params, config, U0, mesh, 4)
    pallas_pkg.INTERPRET = True
    try:
        kern, tk, kk = _sharded(
            params.replace(kernel="pallas"), config, U0, mesh, 4
        )
    finally:
        pallas_pkg.INTERPRET = False
    assert kp == kk
    np.testing.assert_allclose(kern, plain, rtol=1e-4, atol=5e-5)


def test_distributed_run_driver(tmp_path):
    """DistributedRun: INI-driven ([mpi] mx/my/mz) end-to-end loop with
    gathered I/O + history matches the single-device Run."""
    from ramsesgpu_tpu.solvers.run import Run
    from ramsesgpu_tpu.solvers.run_distributed import DistributedRun

    extra = f"""
[mpi]
mx=2
my=2
mz=1
[output]
outputDir={tmp_path}
outputPrefix=dist
outputVtk=no
outputHdf5=yes
[history]
enabled=yes
[run]
nstepmax=6
noutput=3
"""
    config = ConfigMap(text=HYDRO_INI + extra)
    run_d = DistributedRun(config)
    run_d.start()
    single = ConfigMap(text=HYDRO_INI + extra.replace("mx=2", "mx=1").replace(
        "my=2", "my=1").replace("outputPrefix=dist", "outputPrefix=single"))
    run_s = Run(single)
    run_s.start()
    np.testing.assert_allclose(
        run_d.interior(), run_s.interior(), rtol=0, atol=1e-5
    )
    assert (tmp_path / "dist_0000006.h5").exists()
    assert (tmp_path / "dist.history").exists()


def test_decomposition_validation():
    params = params_from_config(ConfigMap(text=HYDRO_INI))
    with pytest.raises(ValueError):
        validate_decomposition(params, 3, 1, 1)  # 64 % 3 != 0
