"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-device
sharding paths (parallel/) are exercised without TPU hardware — the moral
successor of the reference's `mpirun -np 4` single-host tests
(reference: test/CMakeLists.txt:8-19, test/mpiHydro/*).
"""
import os

# must be set before jax initializes its backends; force CPU even when the
# session environment points JAX at a TPU (tests exercise sharding on a
# virtual 8-device CPU mesh). The environment's TPU plugin re-writes
# jax_platforms at import time, so we override the config *after* import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------- #
# Quick smoke tier: `pytest -m quick` runs one fast representative test
# per subsystem (<5 min total on the CPU backend) so every commit can
# afford a full smoke pass; the unmarked remainder is the thorough tier
# (~55 min).  Centralized here instead of per-file decorators.
_QUICK = {
    ("test_configmap.py", "test_typed_getters"),
    ("test_configmap.py", "test_params_derivation"),
    ("test_configmap.py", "test_reference_ini_corpus"),
    ("test_godunov_sod.py", "test_conservation_periodic"),
    ("test_mhd.py", "test_orszag_tang_divb_and_conservation"),
    ("test_io.py", "test_hdf5_roundtrip_ghosted"),
    ("test_io.py", "test_netcdf_roundtrip"),
    ("test_native.py", "test_vti_blob_layout"),
    ("test_pallas.py", "test_pallas_supported_guards"),
    ("test_parallel.py", "test_hydro_2d_sharded_parity[topo2]"),
    ("test_shear.py", "test_shear_fill_at_t0_is_periodic"),
    ("test_zslab.py", "test_zslab_invalid_count"),
    ("test_forcing.py", "test_turbulence_static_field_properties"),
    ("test_utils.py", "test_randomgen"),
    ("test_utils.py", "test_memory_planner"),
    ("test_analysis.py", "test_power_spectrum_single_mode"),
    ("test_alt_schemes.py", "test_kurganov_tadmor_sod"),
    ("test_ini_sweep.py", "test_corpus_is_self_contained"),
    ("test_ini_sweep.py", "test_shipped_ini_runs[hydro_sod2d.ini]"),
    ("test_ini_sweep.py", "test_shipped_ini_runs[orszag-tang.ini]"),
}


# Medium tier: `pytest -m "quick or medium"` adds ONE representative
# Pallas-kernel parity test per kernel family (packed IO, zcarry, shear,
# strip, dissipation, advance loops) at its cheapest parametrization —
# the interpret-mode compile dominates these (~2-6 min each), so the full
# parametrized sweeps stay in the thorough tier while every commit can
# still afford a parity net over each kernel family (~25 min on CPU).
_MEDIUM = {
    ("test_pallas.py", "test_packed_io_step_matches_whole_array[tiles0]"),
    ("test_pallas.py", "test_zcarry_step_matches_packed[dims1]"),
    ("test_pallas.py", "test_packed_advance_loop_no_buffer_aliasing[False]"),
    ("test_pallas.py", "test_zcarry_hydro_step_matches_packed[dims1]"),
    ("test_pallas_dissip.py",
     "test_packed_dissipative_advance_matches_whole_array"),
    ("test_pallas_shear.py",
     "test_shear_packed_matches_whole_array_multistep[dims0-tiles0]"),
    ("test_pallas_shear.py", "test_shear_cfl_kernel_bitwise"),
    ("test_pallas_shear.py",
     "test_shear_packed_fused_strip_matches_v1[False-False]"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = (os.path.basename(str(item.fspath)), item.name)
        if key in _QUICK:
            item.add_marker(pytest.mark.quick)
        if key in _MEDIUM:
            item.add_marker(pytest.mark.medium)


@pytest.fixture(scope="session")
def data_dir():
    """Path to the framework's shipped .ini problem corpus (data/*.ini,
    ported from the reference's config zoo, /root/reference/data)."""
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "data")
    )
    assert os.path.isdir(path), "repo data/ corpus missing"
    return path
