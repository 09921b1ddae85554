"""End-to-end sweep over the shipped problem corpus (data/*.ini).

Every shipped INI must build a run and survive a few integration steps —
the pytest successor of the reference's manually-run physics corpus
(reference: data/*.ini, SURVEY.md §4 "physics validation corpus").  Meshes
are shrunk so the sweep is affordable on the CPU backend; the point is
"every config is exercisable end-to-end", not physics accuracy (covered by
the per-problem tests).
"""
import glob
import os

import jax
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config

DATA_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "data")
)
INI_FILES = sorted(glob.glob(os.path.join(DATA_DIR, "*.ini")))

# configs that restart from a snapshot produced by a previous run; exercised
# separately by the restart tests (tests/test_io.py)
_NEEDS_RESTART_FILE = {"mhd_mri_3d_stratified_restart.ini"}


def _shrink(config: ConfigMap) -> None:
    """Cap the mesh at sweep-affordable sizes, preserving dimensionality."""
    nz = config.get_integer("mesh", "nz", 1)
    cap = 16 if nz > 1 else 32
    for axis in ("nx", "ny", "nz"):
        n = config.get_integer("mesh", axis, 1)
        if n > 1:
            config.set_integer("mesh", axis, min(n, cap))
    # single-device sweep: distribution is covered by tests/test_parallel.py
    for m in ("mx", "my", "mz"):
        config.set_integer("mpi", m, 1)
    config.set_integer("run", "noutput", -1)
    # z-slab piece counts sized for the full mesh may exceed the shrunken nz
    if config.has("implementation", "zSlabNb"):
        config.set_integer("implementation", "zSlabNb", 1)


@pytest.mark.parametrize(
    "ini", INI_FILES, ids=[os.path.basename(p) for p in INI_FILES]
)
def test_shipped_ini_runs(ini, tmp_path, monkeypatch):
    name = os.path.basename(ini)
    if name in _NEEDS_RESTART_FILE:
        pytest.skip("restart config; needs a prior snapshot")
    # Run writes its history file into the CWD even with do_output=False
    monkeypatch.chdir(tmp_path)
    config = ConfigMap(ini)
    _shrink(config)
    params = params_from_config(config)

    from ramsesgpu_tpu.solvers.run import Run

    # eager: at these mesh sizes two steps of whole-array numerics are
    # cheap, while jit-compiling every distinct config would dominate the
    # sweep (~70 s per 3D MHD config on the CPU backend)
    with jax.disable_jit():
        run = Run(config, params)
        run.start(max_steps=2, do_output=False)
    U = np.asarray(run.U)
    assert np.isfinite(U).all(), f"{name}: non-finite state after 2 steps"


def test_corpus_is_self_contained():
    """The repo ships the full config zoo (VERDICT round 1, item 6)."""
    assert len(INI_FILES) >= 60
