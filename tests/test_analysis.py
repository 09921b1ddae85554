"""Analysis toolchain tests: power spectrum, structure functions,
projected density, slice reader, fBm generator, misc writers."""
import numpy as np
import pytest

from ramsesgpu_tpu.analysis.generate_fbm import generate_fbm
from ramsesgpu_tpu.analysis.power_spectrum import power_spectrum
from ramsesgpu_tpu.analysis.structure_functions import compute_structure_functions
from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.core.constants import ID, IP, IU


def test_power_spectrum_single_mode():
    """A pure sine at mode k=4 must put (nearly) all power in bin 4."""
    n = 64
    x = np.arange(n) / n
    X, Y = np.meshgrid(x, x, indexing="ij")
    field = np.sin(2 * np.pi * 4 * X)
    k, ek = power_spectrum(field)
    assert np.argmax(ek) == 4
    assert ek[4] > 100 * (ek.sum() - ek[4] + 1e-30) / len(ek)


def test_power_spectrum_fbm_slope():
    """An fBm field with Hurst H has P(k) ~ k^-(2H+dim); the shell-summed
    E(k) ~ k^-(2H+dim) * k^(dim-1) = k^-(2H+1)."""
    field = generate_fbm((128, 128), hurst=0.5, seed=1)
    k, ek = power_spectrum(field)
    sel = (k >= 4) & (k <= 32) & (ek > 0)
    slope = np.polyfit(np.log(k[sel]), np.log(ek[sel]), 1)[0]
    assert -2.6 < slope < -1.4, slope  # expect ~ -2


MINI_INI = """
[run]
tend=1.0
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
problem=blast
riemannSolver=hllc
[blast]
radius=0.2
"""


@pytest.fixture
def blast_state():
    from ramsesgpu_tpu.problems import init_problem

    config = ConfigMap(text=MINI_INI)
    params = params_from_config(config)
    U = init_problem(params, config)
    return params, config, U


def test_structure_functions_shape_and_zero_distance(blast_state):
    params, config, U = blast_state
    result = compute_structure_functions(params, U, n_samples=5, max_q=3, seed=1)
    assert result["sf_long"].shape == (3, 3, len(result["distance"]))
    # zero-distance bin must have zero increments
    assert result["sf_long"][:, :, 0].max() == 0.0
    assert np.isfinite(result["sf_long"]).all()
    # increments grow with separation for a smooth field near the origin
    s2 = result["sf_long"][0, 1]  # type v, order 2
    nz = result["counts"] > 0
    assert s2[nz][1:4].sum() >= 0


def test_structure_functions_uniform_flow_is_zero(blast_state):
    """A uniform velocity field has zero increments everywhere."""
    params, config, U = blast_state
    U = U.copy()
    U[IU] = U[ID] * 0.7  # uniform vx = 0.7
    result = compute_structure_functions(params, U, n_samples=4, max_q=2, seed=2)
    assert result["sf_long"][0].max() < 1e-10
    assert result["sf_tran"][0].max() < 1e-10


def test_projected_density(blast_state):
    from ramsesgpu_tpu.analysis.projected_density import projected_density

    params, config, U = blast_state
    proj = projected_density(params, U, "z")
    assert proj.shape == (16, 16)
    np.testing.assert_allclose(proj.sum(), U[ID][3:-3, 3:-3, 3:-3].sum()
                               if params.ghost_width == 3 else
                               U[ID][2:-2, 2:-2, 2:-2].sum(), rtol=1e-6)


def test_read_slice_roundtrip(blast_state, tmp_path):
    from ramsesgpu_tpu.analysis.read_slice import read_slice
    from ramsesgpu_tpu.io.hdf5 import output_hdf5

    params, config, U = blast_state
    path = output_hdf5(params, U, 0, output_dir=str(tmp_path), prefix="s")
    sl = read_slice(str(path), "density", "z", 8)
    g = params.ghost_width
    np.testing.assert_array_equal(sl, U[ID][g:-g, g:-g, g:-g][8])


def test_misc_writers(blast_state, tmp_path):
    from ramsesgpu_tpu.io.misc_formats import write_bin, write_nrrd, write_xsm
    from ramsesgpu_tpu.io.png import write_png_colormap

    params, config, U = blast_state
    g = params.ghost_width
    rho = U[ID][g:-g, g:-g, g:-g]

    nrrd = tmp_path / "d.nrrd"
    write_nrrd(nrrd, rho)
    raw = nrrd.read_bytes()
    assert raw.startswith(b"NRRD0004")
    assert b"sizes: 16 16 16" in raw

    xsm = tmp_path / "d.xsm"
    write_xsm(xsm, rho[8])
    assert xsm.read_bytes().startswith(b"Binary 1 16x16")

    binf = tmp_path / "d.bin"
    write_bin(binf, rho)
    assert binf.stat().st_size == 3 * 4 + rho.size * 4

    png = tmp_path / "d.png"
    write_png_colormap(str(png), rho[8])
    from PIL import Image

    img = Image.open(png)
    assert img.size == (16, 16)
