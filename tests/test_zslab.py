"""Z-slab pipelining must be bit-for-bit equivalent to the monolithic update
on the interior (ghosts may differ by the CT extra layer; they are refilled
every step)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.step import make_advance_n

MHD3D_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=16
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

HYDRO3D_INI = """
[run]
tend=10.0
[mesh]
nx=16
ny=16
nz=32
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=2
boundary_zmax=2
[hydro]
problem=blast
riemannSolver=hllc
cfl=0.4
[blast]
radius=0.2
"""


# resistive+viscous variant: the dissipative sub-step must be applied once
# globally, not per z-window (window-local boundary fills would corrupt seams)
MHD3D_DISS_INI = MHD3D_INI.replace(
    "enable=true", "enable=true\neta=0.005"
).replace("cfl=0.4", "cfl=0.4\nnu=0.003")


@pytest.mark.parametrize("ini,n_slabs", [
    (MHD3D_INI, 4), (MHD3D_INI, 8), (HYDRO3D_INI, 4), (MHD3D_DISS_INI, 4),
])
def test_zslab_interior_parity(ini, n_slabs):
    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))

    adv_mono = make_advance_n(params)
    adv_slab = make_advance_n(params.replace(z_slab_nb=n_slabs))
    Ua, ta, ka = adv_mono(U, jnp.asarray(0.0, U.dtype), jnp.array(8, jnp.int32))
    Ub, tb, kb = adv_slab(U, jnp.asarray(0.0, U.dtype), jnp.array(8, jnp.int32))
    assert int(ka) == int(kb)
    assert float(ta) == float(tb)

    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    # distinct XLA programs may differ by ~1 ULP per step in fused fp order;
    # the single-step bitwise check below pins the actual numerics
    np.testing.assert_allclose(
        np.asarray(Ua)[sl], np.asarray(Ub)[sl], rtol=0, atol=1e-6
    )


@pytest.mark.parametrize("ini,n_slabs", [
    (MHD3D_INI, 4), (HYDRO3D_INI, 4), (MHD3D_DISS_INI, 4),
])
def test_zslab_single_step_bitwise(ini, n_slabs):
    from ramsesgpu_tpu.solvers.step import make_step_fn

    config = ConfigMap(text=ini)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U.dtype)
    Ua, _ = jax.jit(make_step_fn(params))(U, t0)
    Ub, _ = jax.jit(make_step_fn(params.replace(z_slab_nb=n_slabs)))(U, t0)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_array_equal(np.asarray(Ua)[sl], np.asarray(Ub)[sl])


def test_zslab_invalid_count():
    config = ConfigMap(text=MHD3D_INI)
    params = params_from_config(config).replace(z_slab_nb=5)  # 32 % 5 != 0
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    with pytest.raises(ValueError):
        make_advance_n(params)(U, jnp.asarray(0.0, U.dtype), jnp.array(1, jnp.int32))


# --------------------------------------------------------------------- #
# z-slab UNDER DISTRIBUTION (the reference's Zslab+Mpi quartet,
# MHDRunGodunovZslabMpi.cpp:479-805: halo exchange outside, slab loop
# inside). Sharded+zslab must match plain sharded bit-for-bit.

def _run_sharded(ini_extra, topo, n_steps, n_slabs):
    from ramsesgpu_tpu.parallel.mesh import make_mesh, validate_decomposition
    from ramsesgpu_tpu.parallel.sharded_step import (
        make_sharded_advance_n,
        shard_global_state,
    )

    config = ConfigMap(text=ini_extra)
    config.set_integer("implementation", "zSlabNb", n_slabs)
    params = params_from_config(config)
    assert params.z_slab_nb == n_slabs
    mx, my, mz = topo
    validate_decomposition(params, mx, my, mz)
    U0 = init_problem(params, config)
    mesh = make_mesh(mx=mx, my=my, mz=mz)
    Ug = shard_global_state(params, mesh, U0)
    advance = make_sharded_advance_n(params, mesh, config)
    U, t, k = advance(Ug, jnp.asarray(0.0, Ug.dtype), jnp.array(n_steps, jnp.int32))
    return np.asarray(jax.device_get(U)), int(k)


@pytest.mark.parametrize("topo", [(2, 2, 2), (1, 2, 4)])
def test_zslab_sharded_parity_mhd(topo):
    # single step: bitwise; multiple steps: the two programs (windowed vs
    # monolithic XLA code) may round reductions differently once fields
    # roughen, so roundoff tolerance (same policy as the single-device
    # multi-step parity test above)
    plain1, _ = _run_sharded(MHD3D_INI, topo, 1, 1)
    slab1, _ = _run_sharded(MHD3D_INI, topo, 1, 2)
    np.testing.assert_array_equal(slab1, plain1)

    plain, k1 = _run_sharded(MHD3D_INI, topo, 6, 1)
    slabbed, k2 = _run_sharded(MHD3D_INI, topo, 6, 2)
    assert k1 == k2
    np.testing.assert_allclose(slabbed, plain, rtol=0, atol=1e-9)


def test_zslab_sharded_parity_hydro_gravity():
    """zSlabNb composes with per-shard gravity windows (the aux-slicing
    path of zslab_apply)."""
    ini = HYDRO3D_INI + "\n[gravity]\nstatic_field_z=-0.5\n"
    plain, k1 = _run_sharded(ini, (2, 2, 2), 6, 1)
    slabbed, k2 = _run_sharded(ini, (2, 2, 2), 6, 4)
    assert k1 == k2
    np.testing.assert_array_equal(slabbed, plain)


def test_zslab_sharded_indivisible_raises():
    with pytest.raises(ValueError, match="zSlabNb"):
        _run_sharded(MHD3D_INI, (1, 1, 4), 1, 3)  # local nz=8, 3 slabs


def test_memory_planner_sharded_zslab_entry():
    """The planner predicts the per-shard z-slab saving (VERDICT item 7)."""
    from ramsesgpu_tpu.utils.memory_footprint import estimate_sharded

    config = ConfigMap(text=MHD3D_INI)
    config.set_integer("mesh", "nx", 256)
    config.set_integer("mesh", "ny", 256)
    config.set_integer("mesh", "nz", 256)
    config.set_integer("implementation", "zSlabNb", 8)
    params = params_from_config(config)
    est = estimate_sharded(params, (2, 2, 2))
    assert est["per_shard_zslab_pipeline_GiB"] < est[
        "per_shard_whole_array_pipeline_GiB"
    ]
