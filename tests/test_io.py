"""I/O subsystem tests: HDF5 round trip, XDMF wrapper, restart (+upscale),
VTK writer, history file."""
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import ID
from ramsesgpu_tpu.io.hdf5 import input_hdf5, output_hdf5, upscale
from ramsesgpu_tpu.io.vtk import output_vtk
from ramsesgpu_tpu.problems import init_problem

SOD_INI = """
[run]
tend=0.2
[mesh]
nx=32
ny=16
boundary_xmin=2
boundary_xmax=2
boundary_ymin=3
boundary_ymax=3
[hydro]
problem=sod
riemannSolver=hllc
"""


@pytest.fixture
def sod_state():
    config = ConfigMap(text=SOD_INI)
    params = params_from_config(config)
    U = init_problem(params, config)
    return params, config, U


def test_hdf5_roundtrip_ghosted(sod_state, tmp_path):
    params, config, U = sod_state
    path = output_hdf5(
        params, U, 42, total_time=1.25, output_dir=str(tmp_path),
        prefix="t", ghost_included=True,
    )
    assert path.exists()
    assert path.with_suffix(".xmf").exists()
    U2, t, step = input_hdf5(params, path)
    assert t == 1.25
    assert step == 42
    np.testing.assert_array_equal(U2, U)


def test_hdf5_roundtrip_interior(sod_state, tmp_path):
    params, config, U = sod_state
    path = output_hdf5(params, U, 0, output_dir=str(tmp_path), prefix="t")
    U2, t, step = input_hdf5(params, path)
    g = params.ghost_width
    sl = (slice(None), slice(g, -g), slice(g, -g))
    np.testing.assert_array_equal(U2[sl], U[sl])


def test_hdf5_compression(sod_state, tmp_path):
    import h5py

    params, config, U = sod_state
    p1 = output_hdf5(
        params, U, 1, output_dir=str(tmp_path), prefix="gz", compression_level=9
    )
    with h5py.File(p1) as f:
        assert f["density"].compression == "gzip"
    U2, _, _ = input_hdf5(params, p1)
    g = params.ghost_width
    sl = (slice(None), slice(g, -g), slice(g, -g))
    np.testing.assert_array_equal(U2[sl], U[sl])


def test_upscale_doubles_resolution(sod_state):
    params, config, U = sod_state
    fine_params = params.replace(nx=params.nx * 2, ny=params.ny * 2)
    fine = upscale(fine_params, U)
    assert fine.shape == fine_params.shape
    g = params.ghost_width
    # each coarse interior cell value appears in a 2x2 block
    np.testing.assert_array_equal(
        fine[ID, g, g : g + 2], np.repeat(U[ID, g, g : g + 1], 2)
    )
    # total "mass" scales by 4 in cell count (2D)
    coarse_sum = U[ID, g:-g, g:-g].sum()
    fine_sum = fine[ID, g:-g, g:-g].sum()
    np.testing.assert_allclose(fine_sum, 4 * coarse_sum, rtol=1e-6)


def test_restart_resume_matches_straight_run(tmp_path):
    """Run 20 steps, checkpoint, resume 10 more — must match a straight
    30-step run exactly (the reference's checkpoint/restart contract)."""
    import jax.numpy as jnp

    from ramsesgpu_tpu.solvers.boundary import make_boundaries
    from ramsesgpu_tpu.solvers.step import make_advance_n

    config = ConfigMap(text=SOD_INI)
    params = params_from_config(config)
    U = jnp.asarray(init_problem(params, config))
    U = make_boundaries(params, U)
    advance = make_advance_n(params)

    U20, t20, _ = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(20, jnp.int32))
    path = output_hdf5(
        params, np.asarray(U20), 20, total_time=float(t20),
        output_dir=str(tmp_path), prefix="ckpt", ghost_included=True,
    )

    # resume
    config.set_bool("run", "restart", True)
    config.set_string("run", "restart_filename", str(path))
    config.set_string("output", "outputDir", str(tmp_path))
    from ramsesgpu_tpu.io.restart import load_restart

    U_r, t_r, step_r = load_restart(params, config)
    assert step_r == 20
    np.testing.assert_allclose(float(t_r), float(t20), rtol=1e-7)
    U30_resumed, _, _ = advance(U_r, jnp.asarray(t_r, U.dtype), jnp.array(10, jnp.int32))

    U30_straight, _, _ = advance(U, jnp.asarray(0.0, U.dtype), jnp.array(30, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(U30_resumed), np.asarray(U30_straight), atol=1e-6
    )


def test_vtk_ascii_and_binary(sod_state, tmp_path):
    params, config, U = sod_state
    p_bin = output_vtk(params, U, 0, output_dir=str(tmp_path), prefix="b")
    p_asc = output_vtk(
        params, U, 1, output_dir=str(tmp_path), prefix="a", binary=False
    )
    assert b"appended" in p_bin.read_bytes()[:600]
    assert "ascii" in p_asc.read_text()[:600]


def test_history_writer(sod_state, tmp_path):
    import jax.numpy as jnp

    from ramsesgpu_tpu.io.history import HistoryWriter, compute_history

    params, config, U = sod_state
    writer = HistoryWriter(params, str(tmp_path), "hist")
    sample = compute_history(params, jnp.asarray(U), 0.5, 0.01)
    writer.append(sample)
    writer.append(sample)
    lines = writer.path.read_text().strip().splitlines()
    assert lines[0].startswith("# totalTime dt mass totalEnergy")
    assert len(lines) == 3
    assert sample["mass"] > 0


def test_netcdf_roundtrip(sod_state, tmp_path):
    """NetCDF writer/reader round trip — works without the netCDF4 package
    via the scipy NC3 fallback (VERDICT round 1, item 9)."""
    from ramsesgpu_tpu.io.netcdf import input_netcdf, output_netcdf

    params, config, U = sod_state
    path = str(tmp_path / "snap_0000007.nc")
    output_netcdf(params, np.asarray(U), 7, path, total_time=0.5)
    U2, t2, step2 = input_netcdf(params, path)
    g = params.ghost_width
    interior = (slice(None),) + (slice(g, -g),) * params.dim
    np.testing.assert_array_equal(np.asarray(U)[interior], U2[interior])
    assert t2 == 0.5
    assert step2 == 7


def test_netcdf_restart(sod_state, tmp_path):
    """A .nc snapshot is a valid restart input (suffix-dispatched reader)."""
    from ramsesgpu_tpu.io.netcdf import output_netcdf
    from ramsesgpu_tpu.io.restart import load_restart

    params, config, U = sod_state
    path = str(tmp_path / "snap_0000012.nc")
    output_netcdf(params, np.asarray(U), 12, path, total_time=0.25,
                  ghost_included=True)
    config.set_string("run", "restart_filename", path)
    config.set_string("output", "outputDir", str(tmp_path))
    U2, t2, step2 = load_restart(params, config)
    np.testing.assert_array_equal(np.asarray(U), np.asarray(U2))
    assert (t2, step2) == (0.25, 12)


def _small_config_from(data_dir, name, nx=16, ny=16, nz=16):
    import os

    config = ConfigMap(os.path.join(data_dir, name))
    config.set_integer("mesh", "nx", nx)
    config.set_integer("mesh", "ny", ny)
    if nz:
        config.set_integer("mesh", "nz", nz)
    return config


def test_history_turbulence_channels(data_dir):
    """Turbulence runs emit the reference's extra history columns
    (history_turbulence, reference: src/hydro/MHDRunBase.cpp:3626-3810):
    Mach numbers, helicity, mean fields, forcing-scale Fourier tracer."""
    import jax.numpy as jnp

    from ramsesgpu_tpu.io.history import compute_history
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    config = _small_config_from(data_dir, "turbulence_mhd.ini")
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    sample = compute_history(params, U, 0.1, 1e-3)
    for key in (
        "eKin", "eMag", "helicity", "divB_sum", "mean_rho", "mean_B",
        "mean_Bx", "mean_rhovx", "Ma_s", "Ma_alfven",
        "coef_x", "coef_y", "coef_z",
    ):
        assert key in sample, key
        assert np.isfinite(sample[key]), key
    # cross-check eKin against a direct numpy reduction
    g = params.ghost_width
    from ramsesgpu_tpu.core.constants import IU, IV, IW

    Un = np.asarray(U)[:, g:-g, g:-g, g:-g]
    lx = params.xmax - params.xmin
    dtau = params.dx * params.dy * params.dz / (
        lx * (params.ymax - params.ymin) * (params.zmax - params.zmin))
    ekin = ((Un[IU] ** 2 + Un[IV] ** 2 + Un[IW] ** 2) / Un[ID]).sum() * dtau
    np.testing.assert_allclose(sample["eKin"], ekin, rtol=1e-5)
    assert sample["mean_rho"] > 0 and sample["Ma_s"] >= 0


def test_history_inertial_wave_probe(data_dir):
    """Inertial-wave runs log the reference's single-point wave probe
    (history_inertial_wave, reference: src/hydro/MHDRunBase.cpp:3414-3470)."""
    import jax.numpy as jnp

    from ramsesgpu_tpu.core.constants import IU
    from ramsesgpu_tpu.io.history import compute_history
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    config = _small_config_from(data_dir, "mhd_inertialWave_2d.ini", nz=0)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    sample = compute_history(params, U, 0.0, 1e-3)
    assert {"rho_probe", "dvx_over_cIso", "dvy_over_cIso"} <= set(sample)
    g = params.ghost_width
    i = g + params.nx // 2
    expect_dvx = float(U[IU, g, i] / U[ID, g, i]) / params.c_iso
    np.testing.assert_allclose(sample["dvx_over_cIso"], expect_dvx, rtol=1e-6)


def test_restart_extra_work_mri(data_dir, tmp_path):
    """The per-problem post-restart fixup registry runs for MRI restarts
    (restart_run_extra_work, reference: src/hydro/MHDRunBase.cpp:3215-3228):
    the stratified gravity field is re-derived after load."""
    import jax.numpy as jnp

    from ramsesgpu_tpu.io import restart as restart_mod
    from ramsesgpu_tpu.solvers.boundary import make_boundaries

    config = _small_config_from(
        data_dir, "mhd_mri_3d_stratified.ini", nx=16, ny=16, nz=16)
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    path = output_hdf5(
        params, np.asarray(U), 5, total_time=0.5,
        output_dir=str(tmp_path), prefix="mri", ghost_included=True)

    calls = []
    orig = restart_mod.RESTART_EXTRA_WORK["mri"]

    def recording(p, c, u):
        calls.append(p.problem)
        return orig(p, c, u)

    restart_mod.RESTART_EXTRA_WORK["mri"] = recording
    try:
        config.set_bool("run", "restart", True)
        config.set_string("run", "restart_filename", str(path))
        config.set_string("output", "outputDir", str(tmp_path))
        U2, t2, step2 = restart_mod.load_restart(params, config)
    finally:
        restart_mod.RESTART_EXTRA_WORK["mri"] = orig
    assert calls == ["MRI"]
    assert (t2, step2) == (0.5, 5)
    np.testing.assert_array_equal(np.asarray(U), np.asarray(U2))
