"""ConfigMap / RunParams parsing tests (vs reference HydroParameters semantics)."""
import math

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import BoundaryConditionType, RiemannSolver, Scheme

SOD_INI = """
[run]
tend=0.4
noutput=100
nstepmax=9000

[mesh]
nx=128
ny=128
nz=1
boundary_xmin=1
boundary_xmax=1
boundary_ymin=1
boundary_ymax=1

[hydro]
problem=sod
niter_riemann=10
iorder=2
slope_type=1.0
scheme=muscl
riemannSolver=hllc
cfl=0.41

[output]
outputVtk=yes
outputHdf5=no
"""


def test_typed_getters():
    cm = ConfigMap(text=SOD_INI)
    assert cm.get_integer("mesh", "nx") == 128
    assert cm.get_float("run", "tend") == 0.4
    assert cm.get_string("hydro", "problem") == "sod"
    assert cm.get_bool("output", "outputVtk") is True
    assert cm.get_bool("output", "outputHdf5") is False
    # defaults
    assert cm.get_integer("mesh", "ghostWidth", 2) == 2
    assert cm.get_float("hydro", "gamma0", 1.4) == 1.4
    # float-valued int (slope_type=1.0)
    assert cm.get_integer("hydro", "slope_type") == 1


def test_setters_roundtrip():
    cm = ConfigMap(text=SOD_INI)
    cm.set_integer("mesh", "ghostWidth", 3)
    assert cm.get_integer("mesh", "ghostWidth") == 3
    dump = cm.dump()
    cm2 = ConfigMap(text=dump)
    assert cm2.get_integer("mesh", "ghostWidth") == 3


def test_params_derivation():
    params = params_from_config(ConfigMap(text=SOD_INI))
    assert params.dim == 2
    assert params.nb_var == 4
    assert params.shape == (4, 132, 132)
    assert params.riemann_solver == RiemannSolver.HLLC
    assert params.scheme == Scheme.MUSCL
    assert params.boundary_xmin == BoundaryConditionType.BC_DIRICHLET
    assert math.isclose(params.dx, 1.0 / 128)
    # derived small values (HydroParameters.h:309-312)
    assert math.isclose(params.smallp, params.smallc**2 / params.gamma0)
    assert math.isclose(params.smallpp, params.smallr * params.smallp)
    assert math.isclose(params.gamma6, (params.gamma0 + 1) / (2 * params.gamma0))
    # hashable (usable as a static jit argument)
    hash(params)


def test_mhd_forces_ghostwidth3():
    ini = SOD_INI + "\n[MHD]\nenable=true\nomega0=0.0\n"
    params = params_from_config(ConfigMap(text=ini))
    assert params.mhd
    assert params.ghost_width == 3
    assert params.nb_var == 8


def test_reference_ini_corpus(data_dir):
    """Every shipped reference .ini must parse into a valid RunParams."""
    import glob
    import os

    files = glob.glob(os.path.join(data_dir, "*.ini"))
    assert len(files) > 50
    for path in files:
        params = params_from_config(ConfigMap(path))
        assert params.nx >= 2
        assert params.dim in (2, 3)
