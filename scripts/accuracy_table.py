"""Accuracy table: f32 (and optionally compensated-f32) vs the f64 oracle.

The BASELINE.md accuracy row asks to match the reference's L2 budget on
Sod, Orszag-Tang, field loop and MRI (the reference's golden-comparison
harness: test/test_run.sh.in:70-80 + computeL2relatif.py.in:44-50, which
compares CPU vs GPU runs of identical configs and gates on relative L2).
Here the comparison is f32 vs f64 of the SAME code — the TPU analogue of
the reference's single/double budget — plus the Kahan-compensated f32 mode
([implementation] compensated) that is the production double story on TPU.

Runs everything on CPU (f64 needs jax_enable_x64, set before importing the
solver stack; each precision runs in this one process since x64 only
widens what we explicitly request via dtype).

Usage: python scripts/accuracy_table.py [n_steps]
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ramsesgpu_tpu.config.configmap import ConfigMap  # noqa: E402
from ramsesgpu_tpu.config.params import params_from_config  # noqa: E402
from ramsesgpu_tpu.problems import init_problem  # noqa: E402
from ramsesgpu_tpu.solvers.step import make_advance_n  # noqa: E402

CASES = {
    # name -> (ini path, overrides {(section, key): value})
    "sod2d": ("data/hydro_sod2d.ini", {("mesh", "nx"): 64,
                                       ("mesh", "ny"): 64}),
    "orszag-tang2d": ("data/orszag-tang.ini", {("mesh", "nx"): 64,
                                               ("mesh", "ny"): 64}),
    "field-loop": ("data/mhd_fieldloop2d.ini", {("mesh", "nx"): 64,
                                                  ("mesh", "ny"): 64}),
    "mri3d": ("data/mhd_mri_3d.ini", {("mesh", "nx"): 32,
                                      ("mesh", "ny"): 32,
                                      ("mesh", "nz"): 16}),
    "orszag-tang3d": ("data/orszag-tang3d.ini", {("mesh", "nx"): 32,
                                                 ("mesh", "ny"): 32,
                                                 ("mesh", "nz"): 32}),
}

# 3D cases additionally measure the Kahan-compensated f32 regime
# ([implementation] compensated — the packed-kernel double-precision
# story, pallas/packed_io.py) in interpret mode on CPU
COMPENSATED_CASES = ("mri3d", "orszag-tang3d")


def run_case(ini, overrides, mode, n_steps):
    """mode: 'float64' | 'float32' (whole-array oracle path) |
    'compensated' (packed Pallas kernels in interpret mode)."""
    config = ConfigMap(ini)
    for (sec, key), v in overrides.items():
        config.set_integer(sec, key, v)
    if mode == "compensated":
        config.set_string("implementation", "dtype", "float32")
        config.set_string("implementation", "kernel", "pallas")
        config.set_bool("implementation", "compensated", True)
    else:
        config.set_string("implementation", "dtype", mode)
        config.set_string("implementation", "kernel", "jnp")
        config.set_bool("implementation", "compensated", False)
    config.set_float("run", "tend", 1e9)
    config.set_integer("run", "nstepmax", 100000)
    params = params_from_config(config)

    from ramsesgpu_tpu.solvers.boundary import make_boundaries
    from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
    from ramsesgpu_tpu.solvers.step import uses_shear

    U = jnp.asarray(init_problem(params, config))
    if uses_shear(params):
        U = make_all_boundaries_shear(params, U, 0.0)
    else:
        U = make_boundaries(params, U)
    adv = make_advance_n(params, config)
    U2, t2, k = adv(U, jnp.asarray(0.0, U.dtype),
                    jnp.array(n_steps, jnp.int32))
    assert int(k) == n_steps, (ini, int(k))
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * params.dim
    return np.asarray(U2[sl], np.float64)


def main() -> int:
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True  # compensated runs the packed kernels on CPU

    print(f"relative L2 vs the f64 oracle after {n_steps} steps "
          f"(reference budget model: computeL2relatif.py.in):")
    for name, (ini, overrides) in CASES.items():
        oracle = run_case(ini, overrides, "float64", n_steps)
        norm = np.sqrt((oracle ** 2).sum())

        def l2_of(mode):
            got = run_case(ini, overrides, mode, n_steps)
            return np.sqrt(((got - oracle) ** 2).sum()) / norm

        cols = f"f32 L2 = {l2_of('float32'):.3e}"
        if name in COMPENSATED_CASES:
            cols += f"  compensated L2 = {l2_of('compensated'):.3e}"
        print(f"  {name:16s}: {cols}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
