"""Multi-process (multi-host) execution tests.

Spawns a real 2-process JAX CPU cluster (4 virtual devices per process,
Gloo collectives) — the single-host stand-in for a multi-host TPU pod —
and checks that the distributed run produces bitwise the same state as
the single-process sharded run, and that the per-process snapshot
writers produce a consistent piece set (reference analogue: the
`mpirun -np N` tests, /root/reference/test/CMakeLists.txt:8-19, and the
per-rank VTK + PHDF5 writers, HydroRunBaseMpi.cpp:4206-4227, 4835-5557).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries

MHD3D_INI = """
[run]
tend=10.0
nstepmax=4
noutput=4
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
[mpi]
mx=2
my=2
mz=2
[output]
outputDir={outdir}
outputPrefix=mp
outputVtk=yes
outputHdf5=yes
outputZarr=yes
[history]
enabled=yes
"""

CHILD_CODE = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.solvers.run_distributed import DistributedRun

ini_path = sys.argv[1]
run = DistributedRun(ConfigMap(ini_path))
run.start(max_steps=4, do_output=True)
print(f"child done pid={jax.process_index()} t={run.t:.6e}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_single_process(tmp_path):
    outdir = tmp_path / "out"
    ini = tmp_path / "mp.ini"
    ini.write_text(MHD3D_INI.format(outdir=outdir))
    child = tmp_path / "child.py"
    child.write_text(CHILD_CODE)

    port = _free_port()
    procs = []
    repo_root = str(Path(__file__).resolve().parent.parent)
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            RAMSES_COORDINATOR=f"localhost:{port}",
            RAMSES_NUM_PROCESSES="2",
            RAMSES_PROCESS_ID=str(pid),
            # children must import ramsesgpu_tpu from a plain checkout
            # (no `pip install -e .` assumed)
            PYTHONPATH=os.pathsep.join(
                p for p in (repo_root, env.get("PYTHONPATH")) if p
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(child), str(ini)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"
    assert "child done pid=0" in outs[0]
    assert "child done pid=1" in outs[1]

    # --- single-process reference over the same 2x2x2 mesh (8 local
    # virtual devices), bitwise the same SPMD program
    from ramsesgpu_tpu.parallel.mesh import make_mesh
    from ramsesgpu_tpu.parallel.sharded_step import (
        make_sharded_advance_n,
        shard_global_state,
    )

    config = ConfigMap(str(ini))
    params = params_from_config(config)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    mesh = make_mesh(mx=2, my=2, mz=2)
    U = shard_global_state(params, mesh, np.asarray(U0))
    advance = make_sharded_advance_n(params, mesh, config)
    U, t, k = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(4, jnp.int32))
    ref = np.asarray(jax.device_get(U))
    assert int(k) == 4

    # --- the HDF5 piece set assembles to the bitwise-identical state
    from ramsesgpu_tpu.io.sharded import input_hdf5_pieces

    manifest = outdir / "mp_0000004.pieces.json"
    assert manifest.exists(), sorted(os.listdir(outdir))
    meta = json.loads(manifest.read_text())
    assert len(meta["pieces"]) == 8
    files = {e["file"] for e in meta["pieces"]}
    assert files == {"mp_0000004_r0000.h5", "mp_0000004_r0001.h5"}

    U_pieces, t_pieces, step_pieces = input_hdf5_pieces(params, manifest)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_array_equal(U_pieces[sl], ref)
    assert step_pieces == 4
    np.testing.assert_allclose(t_pieces, float(t), rtol=1e-7)

    # --- the .pvti master references all 8 pieces and each file exists,
    # written by whichever process owned it
    master = outdir / "mp_0000004.pvti"
    text = master.read_text()
    for k_piece in range(8):
        name = f"mp_0000004_p{k_piece:04d}.vti"
        assert name in text
        assert (outdir / name).exists(), name

    # --- the collective SINGLE zarr store: both processes wrote disjoint
    # chunks of one logical dataset (the reference's shared-file PHDF5 /
    # PNetCDF role without MPI-IO); it assembles bitwise
    from ramsesgpu_tpu.io.sharded import input_zarr

    store = outdir / "mp_0000004.zarr"
    assert store.is_dir(), sorted(os.listdir(outdir))
    U_zarr, t_zarr, step_zarr = input_zarr(params, store)
    np.testing.assert_array_equal(U_zarr[sl], ref)
    assert step_zarr == 4
    np.testing.assert_allclose(t_zarr, float(t), rtol=1e-7)

    # --- exactly one history file, written by process 0 only, with
    # one header + (t=0 sample is cadence-dependent) >= 1 data line
    hist = outdir / "mp.history"
    lines = hist.read_text().strip().splitlines()
    assert lines[0].startswith("# totalTime")
    assert len(lines) >= 2


def test_netcdf_piece_restart_roundtrip_single_process(tmp_path):
    """NetCDF piece set (the reference's PNetCDF output+restart role,
    HydroRunBaseMpi.cpp:6046-6503, 7505-7862): write with the piece
    writer, assemble with input_netcdf_pieces, and check load_restart
    dispatches on the manifest's format field."""
    from ramsesgpu_tpu.io.sharded import (
        _output_netcdf_pieces,
        input_netcdf_pieces,
    )
    from ramsesgpu_tpu.parallel.mesh import make_mesh
    from ramsesgpu_tpu.parallel.sharded_step import shard_global_state

    config = ConfigMap(text=MHD3D_INI.format(outdir=tmp_path))
    params = params_from_config(config)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    mesh = make_mesh(mx=2, my=2, mz=2)
    U = shard_global_state(params, mesh, np.asarray(U0))

    manifest = _output_netcdf_pieces(
        params, U, 9, total_time=0.25, output_dir=str(tmp_path),
        prefix="nc")
    assert manifest.name == "nc_0000009.nc.pieces.json"
    U_back, t_back, step_back = input_netcdf_pieces(params, manifest)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_array_equal(
        U_back[sl], np.asarray(jax.device_get(U)))
    assert (t_back, step_back) == (0.25, 9)

    from ramsesgpu_tpu.io.restart import load_restart

    config.set_bool("run", "restart", True)
    config.set_string("run", "restart_filename", str(manifest))
    config.set_string("output", "outputDir", str(tmp_path))
    U_r, t_r, step_r = load_restart(params, config)
    np.testing.assert_array_equal(np.asarray(U_r)[sl],
                                  np.asarray(jax.device_get(U)))
    assert (t_r, step_r) == (0.25, 9)


def test_netcdf_sharded_single_process_global_file(tmp_path):
    """Single-process sharded NetCDF output streams shard hyperslabs into
    ONE global .nc that the serial reader accepts as a restart."""
    from ramsesgpu_tpu.io.netcdf import input_netcdf
    from ramsesgpu_tpu.io.sharded import output_netcdf_sharded
    from ramsesgpu_tpu.parallel.mesh import make_mesh
    from ramsesgpu_tpu.parallel.sharded_step import shard_global_state

    config = ConfigMap(text=MHD3D_INI.format(outdir=tmp_path))
    params = params_from_config(config)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    mesh = make_mesh(mx=2, my=2, mz=2)
    U = shard_global_state(params, mesh, np.asarray(U0))

    path = output_netcdf_sharded(
        params, U, 3, total_time=0.125, output_dir=str(tmp_path),
        prefix="ncg")
    assert path.name == "ncg_0000003.nc"
    U_back, t_back, step_back = input_netcdf(params, path)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_array_equal(
        U_back[sl], np.asarray(jax.device_get(U)))
    assert (t_back, step_back) == (0.125, 3)


def test_piece_restart_roundtrip_single_process(tmp_path):
    """input_hdf5_pieces assembles a single-process piece write too, and
    load_restart dispatches on the .pieces.json suffix."""
    from ramsesgpu_tpu.io.sharded import _output_hdf5_pieces, input_hdf5_pieces
    from ramsesgpu_tpu.parallel.mesh import make_mesh
    from ramsesgpu_tpu.parallel.sharded_step import shard_global_state

    config = ConfigMap(text=MHD3D_INI.format(outdir=tmp_path))
    params = params_from_config(config)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    mesh = make_mesh(mx=2, my=2, mz=2)
    U = shard_global_state(params, mesh, np.asarray(U0))

    manifest = _output_hdf5_pieces(
        params, U, 7, total_time=0.5, output_dir=str(tmp_path), prefix="pp")
    U_back, t_back, step_back = input_hdf5_pieces(params, manifest)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_array_equal(
        U_back[sl], np.asarray(jax.device_get(U)))
    assert (t_back, step_back) == (0.5, 7)

    from ramsesgpu_tpu.io.restart import load_restart

    config.set_bool("run", "restart", True)
    config.set_string("run", "restart_filename", str(manifest))
    config.set_string("output", "outputDir", str(tmp_path))
    U_r, t_r, step_r = load_restart(params, config)
    np.testing.assert_array_equal(np.asarray(U_r)[sl],
                                  np.asarray(jax.device_get(U)))
    assert (t_r, step_r) == (0.5, 7)
