"""Fused shearing-box (MRI) kernel vs the whole-array path (interpret mode).

Multi-step comparison so the kept-Bx face, the flux/emfY remap corrections,
and the sheared ghost refill all interact across steps (the reference needed
two bugfix releases exactly here, ChangeLog:75-79).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.pallas.fused_mhd3d import (
    make_pallas_shear_step_fn,
    pallas_shear_supported,
)
from ramsesgpu_tpu.solvers.shear import make_all_boundaries_shear
from ramsesgpu_tpu.solvers.step import make_step_fn

MRI_INI = """
[run]
tend=630000
[mesh]
nx={nx}
ny={ny}
nz={nz}
xmin=-0.5
xmax=0.5
ymin=-2.0
ymax=2.0
zmin=-0.5
zmax=0.5
boundary_xmin=4
boundary_xmax=4
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=MRI
cfl=0.7
slope_type=2.0
riemannSolver=hlld
gamma0=1.001
smallr=1e-9
smallc=1e-9
cIso=0.001
[MHD]
enable=true
omega0=0.001
magRiemannSolver=hlld
implementationVersion=4
[MRI]
density=1.0
beta=400.0
[implementation]
kernel=jnp
"""


@pytest.mark.parametrize("dims,tiles", [
    ((32, 16, 8), (4, 8)),
    ((16, 32, 16), (8, 8)),
])
def test_shear_kernel_matches_whole_array_multistep(dims, tiles):
    nx, ny, nz = dims
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config)
    assert pallas_shear_supported(params)

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)

    step_ref = make_step_fn(params)        # whole-array ([implementation] jnp)
    step_ker = make_pallas_shear_step_fn(
        params.replace(pallas_tiles=tiles), interpret=True
    )

    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    # float32 roundoff differs between the box-sliced kernel and the
    # whole-array rolls, so the comparison loosens step over step
    for n, atol in enumerate((2e-6, 1e-5, 5e-5)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol,
            err_msg=f"interior mismatch at step {n}",
        )
        # the kept Bx face (ghost column nx+g) must match too — the next
        # sheared fill preserves it (solvers/shear.py:87-91)
        from ramsesgpu_tpu.core.constants import IA

        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, nx + g],
            np.asarray(Ur)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol,
            err_msg=f"kept Bx face mismatch at step {n}",
        )


@pytest.mark.parametrize("dims,tiles", [
    ((128, 16, 8), (4, 8)),
    ((128, 32, 16), (8, 8)),
    # ny % 128 == 0: the border strip runs lane-exact (gy=0 — the roll
    # wrap IS the periodic y BC; _strip_geometry)
    ((128, 128, 8), (8, 8)),
])
def test_shear_packed_matches_whole_array_multistep(dims, tiles):
    """Packed-layout MRI step (pallas/shear_packed.py): x-ghost-free main
    kernel + transposed Pallas border-strip kernel + remap corrections vs
    the whole-array path, multi-step, incl. the kept-Bx face."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        shear_packed_supported,
    )

    nx, ny, nz = dims
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=tiles)
    assert shear_packed_supported(params)

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)

    step_ref = make_step_fn(params.replace(kernel="jnp"))
    step_ker = make_shear_packed_step_fn(params, interpret=True)

    from ramsesgpu_tpu.core.constants import IA

    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-6, 1e-5, 5e-5)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, nx + g],
            np.asarray(Ur)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )


def test_shear_packed_advance_n_matches_step_loop():
    """The packed advance loop (carry kept across steps, unpack with a fresh
    sheared fill) equals stepping the packed step fn one step at a time."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_pallas_shear_advance_n,
        make_shear_packed_step_fn,
    )

    nx, ny, nz = 128, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(4, 8))
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)

    step = make_shear_packed_step_fn(params, interpret=True)
    advance = make_pallas_shear_advance_n(params, interpret=True)

    Us = U0
    t_s = jnp.asarray(0.0, U0.dtype)
    for _ in range(3):
        Us, dt = step(Us, t_s)
        t_s = t_s + dt
    Ua, t_a, k = advance(U0, jnp.asarray(0.0, U0.dtype), 3)
    assert int(k) == 3
    np.testing.assert_allclose(float(t_a), float(t_s), rtol=1e-6)
    g = params.ghost_width
    np.testing.assert_allclose(
        np.asarray(Ua)[:, g:-g, g:-g, g:-g],
        np.asarray(Us)[:, g:-g, g:-g, g:-g],
        rtol=0, atol=1e-6,
    )


def test_shear_packed_form_chained_chunks_match():
    """The shear packed-form chain (make_pallas_shear_advance_n(
    packed_form=True), solvers/step.make_packed_advance_chain) split
    across two chained chunks is bitwise the ghosted-contract advance —
    the (P, kept) carry makes the chunk boundary invisible; unpack takes
    (state, t)."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_pallas_shear_advance_n,
    )

    nx, ny, nz = 128, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(4, 8))
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    t0 = jnp.asarray(0.0, U0.dtype)

    advance = make_pallas_shear_advance_n(params, interpret=True)
    U1, t1, k1 = advance(U0, t0, 3)
    pack, advp, unpack = make_pallas_shear_advance_n(
        params, interpret=True, packed_form=True
    )
    S, t2, ka = advp(pack(U0.copy()), t0, 1)
    S, t2, kb = advp(S, t2, 2)
    U2 = unpack(S, t2)
    assert int(k1) == 3 and int(ka) + int(kb) == 3
    assert float(t1) == float(t2)
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))


def test_shear_packed_dissipative_matches_whole_array():
    """Viscous-resistive MRI on the packed layout: Godunov phase + packed
    dissipation kernel + dissipative border strips, incl. the resistive CT
    on the kept Bx face. Step 0 is the tight check; step 1 tolerances cover
    the legitimate dt divergence (the whole-array path's resistive CT
    touches ghost faces that feed its one-fill-stale dt reads; the packed
    path's dt reads exact wraps + the kept face)."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        shear_packed_supported,
    )

    nx, ny, nz = 128, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    config.set_float("hydro", "nu", 2e-3)
    config.set_float("MHD", "eta", 1e-3)
    params = params_from_config(config).replace(pallas_tiles=(4, 8))
    assert params.nu > 0 and params.eta > 0
    assert shear_packed_supported(params)

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)

    step_ref = make_step_fn(params.replace(kernel="jnp"))
    step_ker = make_shear_packed_step_fn(params, interpret=True)

    from ramsesgpu_tpu.core.constants import IA

    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-6, 5e-4)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(
            float(dt_k), float(dt_r), rtol=1e-5 if n == 0 else 3e-3
        )
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, nx + g],
            np.asarray(Ur)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )


def test_shear_kernel_stratified_matches_whole_array():
    """STRATIFIED MRI on the fused shear kernel: the analytic vertical
    gravity (gz = -Omega0^2 z, MHDRunBase.cpp:3163-3245) is evaluated
    in-kernel and applied as the trace half-kick + conservative source
    (godunov_mhd gravity hooks); BC_Z_STRATIFIED stays in the XLA fill."""
    import os

    from ramsesgpu_tpu.core.constants import BoundaryConditionType as BCT
    from ramsesgpu_tpu.pallas.fused_mhd3d import pallas_shear_supported
    from ramsesgpu_tpu.solvers.boundary import make_boundaries
    from ramsesgpu_tpu.solvers.step import (
        _mri_gz_profile,
        make_gravity_field,
    )

    ini = os.path.join(os.path.dirname(__file__), "..", "data",
                       "mhd_mri_3d_stratified.ini")
    config = ConfigMap(ini)
    for k, v in (("nx", 16), ("ny", 16), ("nz", 16)):
        config.set_integer("mesh", k, v)
    params = params_from_config(config).replace(pallas_tiles=(4, 8))
    assert params.boundary_zmin == BCT.BC_Z_STRATIFIED
    gravity = make_gravity_field(params, config)
    prof = _mri_gz_profile(params, config, gravity)
    assert prof is not None
    assert pallas_shear_supported(params, stratified=True)
    assert not pallas_shear_supported(params)  # periodic-z gate unchanged

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    U0 = make_boundaries(params, U0)

    step_ref = make_step_fn(params.replace(kernel="jnp"), config)
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_shear_step_fn

    step_ker = make_pallas_shear_step_fn(params, interpret=True,
                                         gravity_z=prof)
    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-6, 1e-5)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )


def test_shear_packed_stratified_matches_whole_array():
    """STRATIFIED MRI on the PACKED layout: in-kernel analytic gravity in
    the main and strip kernels, hydrostatic z-band refills after each
    phase, stratified z extensions of the sheared x-ghost strips."""
    import os

    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        shear_packed_supported,
    )
    from ramsesgpu_tpu.solvers.step import (
        _mri_gz_profile,
        make_gravity_field,
    )

    ini = os.path.join(os.path.dirname(__file__), "..", "data",
                       "mhd_mri_3d_stratified.ini")
    config = ConfigMap(ini)
    for k, v in (("nx", 128), ("ny", 16), ("nz", 16)):
        config.set_integer("mesh", k, v)
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    assert shear_packed_supported(params, stratified=True)
    assert not shear_packed_supported(params)
    gravity = make_gravity_field(params, config)
    prof = _mri_gz_profile(params, config, gravity)
    assert prof is not None

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    step_ref = make_step_fn(params.replace(kernel="jnp"), config)
    step_ker = make_shear_packed_step_fn(params, interpret=True,
                                         gravity_z=prof)

    from ramsesgpu_tpu.core.constants import IA

    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-6, 1e-5)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(float(dt_k), float(dt_r), rtol=1e-5)
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, 128 + g],
            np.asarray(Ur)[IA, g:-g, g:-g, 128 + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )


def test_shear_kernel_dissipative_matches_whole_array():
    """Viscous-resistive MRI (the reference's headline Re=25000/Pm=4 class):
    shear kernel + fused dissipation kernel vs the whole-array path,
    including the resistive CT on the kept Bx face."""
    nx, ny, nz = 16, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    config.set_float("hydro", "nu", 2e-3)
    config.set_float("MHD", "eta", 1e-3)
    params = params_from_config(config)
    assert params.nu > 0 and params.eta > 0
    assert pallas_shear_supported(params)

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)

    step_ref = make_step_fn(params)        # [implementation] kernel=jnp
    step_ker = make_pallas_shear_step_fn(
        params.replace(pallas_tiles=(4, 8)), interpret=True
    )

    from ramsesgpu_tpu.core.constants import IA

    Ur = Uk = U0
    t_r = t_k = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    # step 0 is the real check (same-input single-step diff is f32 ULP,
    # ~1.2e-7); step 1 sees a legitimate dt divergence — the whole-array
    # path's resistive CT touches ghost faces that feed the one-fill-stale
    # dt reads, the kernel path's ghosts come from the fill alone — so the
    # trajectories drift by dt_diff * velocity scales
    for n, atol in enumerate((2e-6, 5e-4)):
        Ur, dt_r = step_ref(Ur, t_r)
        Uk, dt_k = step_ker(Uk, t_k)
        np.testing.assert_allclose(
            float(dt_k), float(dt_r), rtol=1e-5 if n == 0 else 3e-3
        )
        t_r = t_r + dt_r
        t_k = t_k + dt_k
        np.testing.assert_allclose(
            np.asarray(Uk)[:, g:-g, g:-g, g:-g],
            np.asarray(Ur)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(Uk)[IA, g:-g, g:-g, nx + g],
            np.asarray(Ur)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )


def test_stratified_routing_selects_packed_path():
    """make_step_fn / make_advance_n route stratified MRI to the packed
    shear path when the registry gravity matches the analytic profile
    (kernel='pallas' forces backend_ok off-TPU)."""
    import os

    from ramsesgpu_tpu.solvers.step import make_advance_n

    ini = os.path.join(os.path.dirname(__file__), "..", "data",
                       "mhd_mri_3d_stratified.ini")
    config = ConfigMap(ini)
    for k, v in (("nx", 128), ("ny", 16), ("nz", 8)):
        config.set_integer("mesh", k, v)
    params = params_from_config(config).replace(
        pallas_tiles=(4, 8), kernel="pallas"
    )
    adv = make_advance_n(params, config)
    assert "shear_packed" in adv.__module__, adv.__module__
    # non-lane-exact nx falls back to the ghosted-window kernel path,
    # which make_step_fn builds (and the step loop wraps)
    config.set_integer("mesh", "nx", 64)
    params64 = params_from_config(config).replace(
        pallas_tiles=(4, 8), kernel="pallas"
    )
    from ramsesgpu_tpu.pallas.shear_packed import shear_packed_supported

    assert not shear_packed_supported(params64, stratified=True)


# --------------------------------------------------------------------- #
# z-block-streaming (zcarry) MAIN kernel under the shearing box
# --------------------------------------------------------------------- #

def test_zcarry_main_matches_packed_main_shear():
    """The z-block-streaming kernel with the rotating-frame terms (static
    in-kernel xpos iota) vs the packed-IO main kernel on the same packed
    MRI state: identical pipeline, different z staging."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        _make_main_kernel,
        pack_shear,
        shear_packed_supported,
    )
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import (
        make_zcarry_mhd_packed_io,
        zcarry_shear_supported,
    )

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    assert shear_packed_supported(params)
    assert zcarry_shear_supported(params)
    assert params.omega0 > 0

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    P, _kept = pack_shear(params, U0)
    dt = jnp.asarray(1e-3, P.dtype)

    main = _make_main_kernel(params, (8, 8), interpret=True)
    zc = make_zcarry_mhd_packed_io(params, tiles=(8, 8), interpret=True)
    np.testing.assert_allclose(
        np.asarray(zc(P, dt)), np.asarray(main(P, dt)), rtol=0, atol=5e-8
    )


@pytest.mark.parametrize("compensated", [False, True])
def test_shear_packed_zcarry_step_matches_packed_step(compensated):
    """Full packed MRI step with the zcarry MAIN kernel ([implementation]
    kernel=zcarry) vs the packed-main step, multi-step incl. the kept-Bx
    face; the compensated variant exercises the per-tile Kahan-carry DMA."""
    from ramsesgpu_tpu.pallas.shear_packed import make_shear_packed_step_fn

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(
        pallas_tiles=(8, 8), compensated=compensated
    )
    step_pk = make_shear_packed_step_fn(params, interpret=True)
    step_zc = make_shear_packed_step_fn(
        params.replace(kernel="zcarry"), interpret=True
    )

    from ramsesgpu_tpu.core.constants import IA

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    Up = Uz = U0
    t_p = t_z = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-7, 1e-6)):
        Up, dt_p = step_pk(Up, t_p)
        Uz, dt_z = step_zc(Uz, t_z)
        np.testing.assert_allclose(float(dt_z), float(dt_p), rtol=1e-6)
        t_p = t_p + dt_p
        t_z = t_z + dt_z
        np.testing.assert_allclose(
            np.asarray(Uz)[:, g:-g, g:-g, g:-g],
            np.asarray(Up)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(Uz)[IA, g:-g, g:-g, nx + g],
            np.asarray(Up)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )


def test_shear_packed_zcarry_stratified_matches_packed_step():
    """Stratified MRI with the zcarry MAIN kernel: the analytic gz enters
    through the carried trace parts (kick before the cross-tile stores)
    and the conservative source in the update."""
    import os

    from ramsesgpu_tpu.pallas.shear_packed import make_shear_packed_step_fn
    from ramsesgpu_tpu.solvers.step import (
        _mri_gz_profile,
        make_gravity_field,
    )

    ini = os.path.join(os.path.dirname(__file__), "..", "data",
                       "mhd_mri_3d_stratified.ini")
    config = ConfigMap(ini)
    for k, v in (("nx", 128), ("ny", 16), ("nz", 16)):
        config.set_integer("mesh", k, v)
    config.set_bool("implementation", "compensated", False)
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    gravity = make_gravity_field(params, config)
    prof = _mri_gz_profile(params, config, gravity)
    assert prof is not None

    step_pk = make_shear_packed_step_fn(params, interpret=True,
                                        gravity_z=prof)
    step_zc = make_shear_packed_step_fn(
        params.replace(kernel="zcarry"), interpret=True, gravity_z=prof
    )
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    Up = Uz = U0
    t_p = t_z = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((2e-7, 1e-6)):
        Up, dt_p = step_pk(Up, t_p)
        Uz, dt_z = step_zc(Uz, t_z)
        np.testing.assert_allclose(float(dt_z), float(dt_p), rtol=1e-6)
        t_p = t_p + dt_p
        t_z = t_z + dt_z
        np.testing.assert_allclose(
            np.asarray(Uz)[:, g:-g, g:-g, g:-g],
            np.asarray(Up)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )


def test_shear_cfl_kernel_bitwise():
    """Streaming shear CFL kernel (kept-Bx lane-select at the last column)
    is BIT-IDENTICAL to the slice-based XLA reduction."""
    from ramsesgpu_tpu.core.constants import (
        IA, IB, IC, ID, IP, IU, IV, IW,
    )
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_cfl_kernel,
        pack_shear,
    )
    from ramsesgpu_tpu.solvers.timestep import _inv_dt_mhd_fields

    nx, ny, nz = 128, 16, 8
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config)
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    P, kept = pack_shear(params, U0)

    from ramsesgpu_tpu.pallas.packed_io import YB

    g = params.ghost_width
    zi, yi = slice(g, g + nz), slice(YB, YB + ny)
    rho = jnp.maximum(P[ID, zi, yi, :], params.smallr)
    ia = P[IA, zi, yi, :]
    ia_p = jnp.concatenate([ia[..., 1:], kept[..., None]], axis=-1)
    ref = _inv_dt_mhd_fields(
        params,
        P[ID, zi, yi, :], P[IP, zi, yi, :],
        P[IU, zi, yi, :] / rho, P[IV, zi, yi, :] / rho,
        P[IW, zi, yi, :] / rho,
        0.5 * (ia + ia_p),
        0.5 * (P[IB, zi, yi, :] + P[IB, zi, YB + 1 : YB + ny + 1, :]),
        0.5 * (P[IC, zi, yi, :] + P[IC, g + 1 : g + nz + 1, yi, :]),
    )
    kern = make_shear_cfl_kernel(params, interpret=True)
    assert kern is not None
    assert float(kern(P, kept)) == float(ref)
    # un-alignable z extents fall back to the XLA pass
    assert make_shear_cfl_kernel(
        params.replace(nz=12, zmax=params.zmin + 12 * params.dz)
    ) is None


@pytest.mark.parametrize("compensated,dissip", [
    (False, False),
    (True, False),
    (False, True),   # viscous-resistive: fused dissip strip + kept CT
])
def test_shear_packed_fused_strip_matches_v1(compensated, dissip):
    """Fused-borders strip kernel ([implementation] stripFused): sheared
    slabs, remap, border corrections and the kept-Bx CT in-kernel
    (dynamic lane rolls wrap at the lane-exact ny = the shear-periodic
    geometry) vs the v1 strip + XLA glue, multi-step."""
    from ramsesgpu_tpu.pallas.shear_packed import (
        make_shear_packed_step_fn,
        strip_fused_supported,
    )

    nx, ny, nz = 128, 128, 16
    config = ConfigMap(text=MRI_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(
        pallas_tiles=(8, 8), compensated=compensated
    )
    if dissip:
        params = params.replace(nu=1e-5, eta=4e-6)
    assert strip_fused_supported(params)
    step_v1 = make_shear_packed_step_fn(params, interpret=True)
    step_v2 = make_shear_packed_step_fn(
        params.replace(strip_fused=True), interpret=True
    )

    from ramsesgpu_tpu.core.constants import IA

    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_all_boundaries_shear(params, U0, 0.0)
    U1 = U2 = U0
    t1 = t2 = jnp.asarray(0.0, U0.dtype)
    g = params.ghost_width
    for n, atol in enumerate((5e-7, 2e-6)):
        U1, dt1 = step_v1(U1, t1)
        U2, dt2 = step_v2(U2, t2)
        np.testing.assert_allclose(float(dt2), float(dt1), rtol=1e-6)
        t1 = t1 + dt1
        t2 = t2 + dt2
        np.testing.assert_allclose(
            np.asarray(U2)[:, g:-g, g:-g, g:-g],
            np.asarray(U1)[:, g:-g, g:-g, g:-g],
            rtol=0, atol=atol, err_msg=f"interior step {n}",
        )
        np.testing.assert_allclose(
            np.asarray(U2)[IA, g:-g, g:-g, nx + g],
            np.asarray(U1)[IA, g:-g, g:-g, nx + g],
            rtol=0, atol=atol, err_msg=f"kept Bx face step {n}",
        )
