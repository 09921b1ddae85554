"""Sharded snapshot I/O: per-shard VTI pieces + .pvti master, HDF5
hyperslab streaming — written WITHOUT materializing the global array
(successor of the reference's per-rank VTK + PHDF5 parallel output,
HydroRunBaseMpi.cpp:4206-4227, 4835-5557)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import var_names
from ramsesgpu_tpu.io.sharded import output_hdf5_sharded, output_vtk_pieces
from ramsesgpu_tpu.io.vtk import read_pvti, read_vti
from ramsesgpu_tpu.parallel.mesh import make_mesh, state_sharding
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries

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
problem=Orszag-Tang
riemannSolver=hlld
[MHD]
enable=true
"""


@pytest.fixture(scope="module")
def sharded_state():
    config = ConfigMap(text=MHD3D_INI)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width
    interior = np.asarray(U)[(slice(None),) + (slice(g, -g),) * params.dim]
    mesh = make_mesh(mx=2, my=2, mz=2)
    Us = jax.device_put(interior, state_sharding(params, mesh))
    return params, Us, interior


def test_vtk_pieces_roundtrip(sharded_state, tmp_path):
    params, Us, interior = sharded_state
    master = output_vtk_pieces(params, Us, 5, output_dir=str(tmp_path),
                               prefix="ot3d")
    assert master.name == "ot3d_0000005.pvti"
    pieces = sorted(tmp_path.glob("ot3d_0000005_p*.vti"))
    assert len(pieces) == 8  # one per device shard
    fields = read_pvti(master)
    for i, name in enumerate(var_names(params.nb_var)):
        np.testing.assert_array_equal(fields[name], interior[i])


def test_single_piece_extent(sharded_state, tmp_path):
    params, Us, interior = sharded_state
    master = output_vtk_pieces(params, Us, 0, output_dir=str(tmp_path),
                               prefix="x")
    # each piece's own extent must be its global-offset window
    _, extent = read_vti(sorted(tmp_path.glob("x_0000000_p*.vti"))[-1])
    assert extent[1] - extent[0] == params.nx // 2
    assert any(e > 0 for e in extent[::2])  # not all pieces at the origin


def test_hdf5_sharded_matches_serial_and_restarts(sharded_state, tmp_path):
    from ramsesgpu_tpu.io.hdf5 import input_hdf5

    params, Us, interior = sharded_state
    path = output_hdf5_sharded(params, Us, 3, total_time=0.75,
                               output_dir=str(tmp_path), prefix="ot3d")
    U2, t2, step2 = input_hdf5(params, path)
    assert (t2, step2) == (0.75, 3)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    np.testing.assert_array_equal(U2[sl], interior)
    # xdmf sidecar exists
    assert path.with_suffix(".xmf").exists()


def test_zarr_sharded_roundtrip(sharded_state, tmp_path):
    """Collective single-artifact zarr output (the reference's shared-file
    PHDF5/PNetCDF role, HydroRunBaseMpi.cpp:4835-5557, 6046-6503): shards
    write disjoint whole chunks of ONE store; the reader and the restart
    dispatch recover the exact state."""
    from ramsesgpu_tpu.io.sharded import input_zarr, output_zarr_sharded

    params, Us, interior = sharded_state
    path = output_zarr_sharded(params, Us, 7, total_time=0.5,
                               output_dir=str(tmp_path), prefix="ot3d")
    assert path.name == "ot3d_0000007.zarr"
    # chunk layout is shard-aligned: 8 chunks + metadata + attrs sidecar
    assert (path / ".zarray").exists() and (path / "attrs.json").exists()
    U2, t2, step2 = input_zarr(params, path)
    assert (t2, step2) == (0.5, 7)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    np.testing.assert_array_equal(U2[sl], interior)

    # restart dispatch on the .zarr suffix
    from ramsesgpu_tpu.io.restart import load_restart

    config = ConfigMap(text=MHD3D_INI + f"""
[run]
restart=1
restart_filename={path.name}
[output]
outputDir={tmp_path}
""")
    U3, t3, step3 = load_restart(params, config)
    np.testing.assert_array_equal(np.asarray(U3)[sl], interior)
    assert (float(t3), int(step3)) == (0.5, 7)


def test_distributed_run_writes_pieces(tmp_path):
    """DistributedRun.output() streams pieces by default and the converter
    (read_pvti) reassembles them to the gathered interior."""
    config = ConfigMap(text=MHD3D_INI)
    config.set_string("output", "outputDir", str(tmp_path))
    config.set_string("output", "outputPrefix", "dist")
    config.set_bool("output", "outputHdf5", True)
    config.set_integer("mpi", "mx", 2)
    config.set_integer("mpi", "my", 2)
    config.set_integer("mpi", "mz", 2)
    from ramsesgpu_tpu.solvers.run_distributed import DistributedRun

    run = DistributedRun(config)
    run.start(max_steps=2)
    masters = sorted(tmp_path.glob("dist_*.pvti"))
    assert masters, "no .pvti master written"
    fields = read_pvti(masters[-1])
    interior = run.interior()
    for i, name in enumerate(var_names(run.params.nb_var)):
        np.testing.assert_array_equal(fields[name], interior[i])
    assert sorted(tmp_path.glob("dist_*.h5"))


def test_distributed_profile_reports_overlap():
    """profile_step_distributed emits halo/sync timings and a measured
    overlap fraction when supported (VERDICT round 1, item 8)."""
    # 3D hydro: same distributed code path as MHD at a fraction of the
    # compile cost (this test times three separately-jitted step variants)
    config = ConfigMap(text=MHD3D_INI)
    config.set_string("hydro", "problem", "blast")
    config.set_string("hydro", "riemannSolver", "hllc")
    config.set_bool("MHD", "enable", False)
    config.set_integer("mesh", "nx", 32)
    config.set_integer("mesh", "ny", 32)
    config.set_integer("mesh", "nz", 32)
    config.set_integer("mpi", "mx", 2)
    config.set_integer("mpi", "my", 2)
    config.set_integer("mpi", "mz", 2)
    params = params_from_config(config)
    from ramsesgpu_tpu.utils.profile import (
        format_profile_distributed,
        profile_step_distributed,
    )

    phases = profile_step_distributed(params, config, reps=2)
    assert phases["halo exchange"] > 0
    assert phases["sync step"] > 0
    text = format_profile_distributed(phases, 8)
    assert "halo" in text
    if "overlap %" in phases:
        assert 0.0 <= phases["overlap %"] <= 1.0


def test_sf_sharded_matches_host(sharded_state):
    """The SPMD structure-function accumulation (no host gather) matches
    the host-side path bit-for-bit in inputs: same seed, same reference
    points, same binned reductions (reference cross-rank reduction:
    structureFunctionsMpi.cpp)."""
    from ramsesgpu_tpu.analysis.structure_functions import (
        compute_structure_functions,
        compute_structure_functions_sharded,
    )

    params, Us, interior = sharded_state
    g = params.ghost_width
    U_ghosted = np.pad(interior, ((0, 0),) + ((g, g),) * params.dim)
    host = compute_structure_functions(params, U_ghosted,
                                       n_samples=20, max_q=3, seed=7)
    dist = compute_structure_functions_sharded(params, Us,
                                               n_samples=20, max_q=3, seed=7)
    np.testing.assert_array_equal(host["counts"], dist["counts"])
    np.testing.assert_allclose(host["sf_long"], dist["sf_long"],
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(host["sf_tran"], dist["sf_tran"],
                               rtol=2e-5, atol=1e-7)


def test_streamed_png_and_faces(sharded_state, tmp_path):
    """PNG + face dumps extracted as SPMD slices from the sharded state
    match the host-side writers' content."""
    from ramsesgpu_tpu.io.sharded import (
        output_faces_sharded,
        output_png_sharded,
    )

    params, Us, interior = sharded_state
    png = output_png_sharded(params, Us, 3, output_dir=str(tmp_path),
                             prefix="st")
    # byte-identical to the host-side writer on the gathered state
    from ramsesgpu_tpu.io.png import output_png

    g = params.ghost_width
    U_ghosted = np.pad(interior, ((0, 0),) + ((g, g),) * params.dim)
    host_png = output_png(params, U_ghosted, 3, output_dir=str(tmp_path),
                          prefix="host")
    assert png.read_bytes() == open(host_png, "rb").read()

    paths = output_faces_sharded(params, Us, 3, output_dir=str(tmp_path),
                                 prefix="st")
    assert len(paths) == 6
    names = var_names(params.nb_var)
    data = np.load(str(tmp_path / "st_face_xmin_0000003.npz"))
    for i, n in enumerate(names):
        np.testing.assert_array_equal(data[n], interior[i][..., 0])
    data = np.load(str(tmp_path / "st_face_zmax_0000003.npz"))
    for i, n in enumerate(names):
        np.testing.assert_array_equal(data[n], interior[i][-1])


def test_distributed_run_streams_long_tail(tmp_path):
    """DistributedRun writes PNG/faces/online-SF through the SPMD
    streamed paths (never gathering) when gatherOutput=no."""
    from ramsesgpu_tpu.solvers.run_distributed import DistributedRun

    ini = MHD3D_INI + f"""
[mpi]
mx=2
my=2
mz=1
[run]
nstepmax=2
noutput=2
[output]
outputDir={tmp_path}
outputPrefix=lt
outputVtk=no
outputHdf5=no
outputPng=yes
outputFaces=yes
[structureFunctions]
enabled=yes
nSampleTotal=5
max_q=2
"""
    config = ConfigMap(text=ini)
    run = DistributedRun(config)
    run.start(max_steps=2, do_output=True)
    assert (tmp_path / "lt_0000002.png").exists()
    faces = sorted(tmp_path.glob("lt_face_*_0000002.npz"))
    assert len(faces) == 6
    sf = np.load(str(tmp_path / "lt_sf_0000002.npz"))
    assert sf["counts"].sum() > 0
