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
    advance = make_advance_n(params)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(n_steps, jnp.int32))
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    return params, config, U0, np.asarray(U)[sl], float(t), int(k)


def _sharded(params, config, U0, mesh, n_steps):
    Ug = shard_global_state(params, mesh, U0)
    advance = make_sharded_advance_n(params, mesh)
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


def test_decomposition_validation():
    params = params_from_config(ConfigMap(text=HYDRO_INI))
    with pytest.raises(ValueError):
        validate_decomposition(params, 3, 1, 1)  # 64 % 3 != 0
