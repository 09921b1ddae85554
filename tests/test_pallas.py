"""Fused Pallas kernel correctness (interpret mode on CPU).

On real TPU hardware the same kernel was validated against the whole-array
path to 3e-8 at 64^3 and is the bench path; here the interpreter checks the
window/halo/margin logic stays exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ramsesgpu_tpu.config.configmap import ConfigMap
from ramsesgpu_tpu.config.params import params_from_config
from ramsesgpu_tpu.problems import init_problem
from ramsesgpu_tpu.solvers.boundary import make_boundaries
from ramsesgpu_tpu.solvers.godunov_mhd import godunov_unsplit_mhd
from ramsesgpu_tpu.solvers.timestep import compute_dt
from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_update, pallas_supported

OT3D_INI = """
[run]
tend=1.0
[mesh]
nx={nx}
ny={ny}
nz={nz}
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=Orszag-Tang
cfl=0.4
gamma0=1.666
slope_type=2.0
riemannSolver=hlld
smallr=1e-7
smallc=1e-7
[MHD]
enable=true
magRiemannSolver=hlld
"""


@pytest.mark.parametrize("dims,tiles", [
    ((32, 32, 32), (2, 8)),
    ((32, 16, 8), (2, 8)),     # anisotropic grid
    ((16, 24, 4), (1, 8)),     # bz=1, ny not a power of two
])
def test_fused_kernel_matches_whole_array(dims, tiles):
    nx, ny, nz = dims
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config)
    assert pallas_supported(params)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    dt = compute_dt(params, U)

    fused = make_fused_mhd_update(params, tiles=tiles, interpret=True)
    out = np.asarray(fused(U, dt))
    ref = np.asarray(godunov_unsplit_mhd(params, U, dt))
    g = params.ghost_width
    np.testing.assert_allclose(
        out, ref[:, g:-g, g:-g, g:-g], rtol=0, atol=1e-6
    )


def test_pallas_supported_guards():
    config = ConfigMap(text=OT3D_INI.format(nx=32, ny=32, nz=32))
    params = params_from_config(config)
    assert pallas_supported(params)
    assert not pallas_supported(params.replace(omega0=1.0))
    assert not pallas_supported(params.replace(eta=0.1))
    assert not pallas_supported(params.replace(nz=1))


HYDRO3D_INI = """
[mesh]
nx={nx}
ny={ny}
nz={nz}
boundary_xmin=3
boundary_xmax=3
boundary_ymin=3
boundary_ymax=3
boundary_zmin=3
boundary_zmax=3
[hydro]
problem=blast
riemannSolver={solver}
[blast]
radius=0.2
"""


@pytest.mark.parametrize("tiles", [(4, 8), (8, 16)])
def test_packed_io_step_matches_whole_array(tiles):
    """One packed-IO kernel step (interior + in-kernel ghost-band writes)
    equals the whole-array update re-packed, over the ENTIRE packed buffer
    (the y-band dead rows hold the same wrap values pad would write)."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io
    from ramsesgpu_tpu.pallas.packed_io import pack_state

    nx, ny, nz = 32, 16, 8
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    dt = compute_dt(params, U)
    g = params.ghost_width

    step = make_fused_mhd_packed_io(params, tiles=tiles, interpret=True)
    P = pack_state(params, U[:, g:-g, g:-g, g:-g])
    P_new = np.asarray(step(P, dt))

    ref = np.asarray(godunov_unsplit_mhd(params, U, dt))[:, g:-g, g:-g, g:-g]
    want = np.asarray(pack_state(params, jnp.asarray(ref)))
    np.testing.assert_allclose(P_new, want, rtol=0, atol=1e-6)


def test_packed_io_hydro_step_matches_whole_array():
    from ramsesgpu_tpu.pallas.fused_hydro3d import make_fused_hydro_packed_io
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.solvers.godunov import godunov_unsplit_hydro

    nx, ny, nz = 16, 16, 8
    config = ConfigMap(text=HYDRO3D_INI.format(nx=nx, ny=ny, nz=nz, solver="hllc"))
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    dt = compute_dt(params, U)
    g = params.ghost_width

    step = make_fused_hydro_packed_io(params, tiles=(4, 8), interpret=True)
    P = pack_state(params, U[:, g:-g, g:-g, g:-g])
    P_new = np.asarray(step(P, dt))

    ref = np.asarray(godunov_unsplit_hydro(params, U, dt))[:, g:-g, g:-g, g:-g]
    want = np.asarray(pack_state(params, jnp.asarray(ref)))
    np.testing.assert_allclose(P_new, want, rtol=0, atol=1e-6)


def test_packed_inv_dt_matches_ghosted():
    """Slice-based packed inv-dt == compute_dt on the ghosted state."""
    from ramsesgpu_tpu.pallas.packed_io import YB, pack_state
    from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd_packed

    config = ConfigMap(text=OT3D_INI.format(nx=32, ny=16, nz=8))
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width
    P = pack_state(params, U[:, g:-g, g:-g, g:-g])
    inv = compute_inv_dt_mhd_packed(params, P, y0=YB)
    assert float(params.cfl / inv) == float(compute_dt(params, U))


IMPLODE3D_INI = """
[mesh]
nx={nx}
ny={ny}
nz={nz}
boundary_xmin={bxmin}
boundary_xmax=1
boundary_ymin=1
boundary_ymax={bymax}
boundary_zmin=1
boundary_zmax=1
[hydro]
problem=implode
riemannSolver=hllc
"""


@pytest.mark.parametrize("bcs", [(1, 1), (2, 3)])
def test_boundaries_concat_bitwise(bcs):
    """make_boundaries_concat is bitwise make_boundaries for every simple
    BC mix (Dirichlet mirror+sign-flip / Neumann / periodic), in both the
    ghosted and the interior-only entry forms."""
    from ramsesgpu_tpu.solvers.boundary import (
        concat_fill_supported,
        make_boundaries_concat,
    )

    bxmin, bymax = bcs
    config = ConfigMap(text=IMPLODE3D_INI.format(
        nx=16, ny=8, nz=8, bxmin=bxmin, bymax=bymax))
    params = params_from_config(config)
    assert concat_fill_supported(params)
    rng = np.random.default_rng(7)
    U = jnp.asarray(rng.normal(size=params.shape).astype(np.float32))
    ref = np.asarray(make_boundaries(params, U))
    out = np.asarray(make_boundaries_concat(params, U))
    np.testing.assert_array_equal(out, ref)
    g = params.ghost_width
    interior = U[(slice(None),) + (slice(g, -g),) * 3]
    out2 = np.asarray(
        make_boundaries_concat(params, interior, interior_only=True)
    )
    np.testing.assert_array_equal(out2, ref)


def test_pallas_hydro_step_nonperiodic_matches_whole_array():
    """The reflective-BC fused hydro step (kernel + concat fill around the
    new interior — no whole-array fill/merge passes) tracks the
    whole-array step over several steps."""
    import ramsesgpu_tpu.pallas as pallas_pkg
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        hydro_pallas_supported,
        make_pallas_hydro_step_fn,
    )
    from ramsesgpu_tpu.solvers.step import make_step_fn

    config = ConfigMap(text=IMPLODE3D_INI.format(
        nx=16, ny=16, nz=8, bxmin=1, bymax=1))
    params = params_from_config(config)
    assert hydro_pallas_supported(params)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))

    ref_step = make_step_fn(params)          # whole-array on CPU
    pallas_pkg.INTERPRET = True
    try:
        kern_step = make_pallas_hydro_step_fn(params)
        Ur = Uk = U0
        t = jnp.asarray(0.0, U0.dtype)
        for _ in range(3):
            Ur, dtr = ref_step(Ur, t)
            Uk, dtk = kern_step(Uk, t)
            # different fusion contexts -> FMA-contraction ULPs on dt
            assert abs(float(dtr) - float(dtk)) < 1e-6 * float(dtr)
            t = t + dtr
    finally:
        pallas_pkg.INTERPRET = False
    # interiors must track; the returned ghost frames differ by design
    # (the whole-array step returns PRE-step ghosts + new interior, the
    # fused step returns ghosts freshly filled from the new interior —
    # both are refreshed before the next kernel, so trajectories match)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_allclose(
        np.asarray(Uk)[sl], np.asarray(Ur)[sl], rtol=0, atol=1e-5)
    # and the fused step's ghosts are exactly a fresh fill of its interior
    np.testing.assert_array_equal(
        np.asarray(Uk), np.asarray(make_boundaries(params, Uk)))


@pytest.mark.parametrize("dims,solver", [
    ((32, 16, 16), "hllc"),
    ((16, 24, 8), "hll"),
])
def test_fused_hydro_kernel_matches_whole_array(dims, solver):
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        hydro_pallas_supported, make_fused_hydro_update)
    from ramsesgpu_tpu.solvers.godunov import godunov_unsplit_hydro

    nx, ny, nz = dims
    config = ConfigMap(text=HYDRO3D_INI.format(nx=nx, ny=ny, nz=nz, solver=solver))
    params = params_from_config(config)
    assert hydro_pallas_supported(params)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    dt = compute_dt(params, U)
    fused = make_fused_hydro_update(params, tiles=(2, 8), interpret=True)
    out = np.asarray(fused(U, dt))
    ref = np.asarray(godunov_unsplit_hydro(params, U, dt))
    g = params.ghost_width
    np.testing.assert_allclose(out, ref[:, g:-g, g:-g, g:-g], rtol=0, atol=1e-6)


@pytest.mark.parametrize("dims", [
    (16, 16, 16),
    (16, 8, 8),      # single real tile (warmup + drain edge cases)
    (16, 8, 16),     # single column
    (16, 24, 8),     # columns only
])
def test_zcarry_step_matches_packed(dims):
    """z-BLOCK-streaming kernel (pallas/zcarry_mhd3d.py) vs the packed-IO
    kernel on the full packed state incl. wrap ghost bands; the edge
    shapes stress the warmup/drain bookkeeping that crashed the first
    hardware run."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import (
        make_zcarry_mhd_packed_io,
        zcarry_supported,
    )

    nx, ny, nz = dims
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    U0 = jnp.asarray(init_problem(params, config))
    U0 = make_boundaries(params, U0)
    P = pack_state(params, U0[:, 3:-3, 3:-3, 3:-3])
    dt = jnp.asarray(0.003, P.dtype)
    ref = make_fused_mhd_packed_io(params, tiles=(8, 8), interpret=True)
    zc = make_zcarry_mhd_packed_io(params, tiles=(8, 8), interpret=True)
    np.testing.assert_allclose(
        np.asarray(zc(P, dt)), np.asarray(ref(P, dt)), rtol=0, atol=5e-8
    )
    # in-kernel CFL reduction: bit-identical to the separate pass on the
    # kernel's own output
    from ramsesgpu_tpu.pallas.packed_io import YB
    from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd_packed

    zc2 = make_zcarry_mhd_packed_io(params, tiles=(8, 8), interpret=True,
                                    with_inv_dt=True)
    Pz, inv = zc2(P, dt)
    assert float(inv) == float(
        compute_inv_dt_mhd_packed(params, Pz, y0=YB)
    )


def test_zcarry_compensated_matches_packed():
    """z-block-streaming kernel in the Kahan-compensated regime (state +
    carry channels; the carries are DMAed per output tile — no stencil
    reach) vs the compensated packed-IO kernel, incl. the in-kernel CFL
    reduction over the state channels."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_fused_mhd_packed_io
    from ramsesgpu_tpu.pallas.packed_io import YB, pack_state
    from ramsesgpu_tpu.pallas.zcarry_mhd3d import (
        make_zcarry_mhd_packed_io,
        zcarry_supported,
    )
    from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_mhd_packed

    nx, ny, nz = 16, 16, 16
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(
        pallas_tiles=(8, 8), compensated=True
    )
    # compensated no longer disqualifies zcarry (lane-exact sizes only)
    assert zcarry_supported(
        params.replace(nx=128, xmax=params.xmin + 128 * params.dx)
    )
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    interior = U0[:, 3:-3, 3:-3, 3:-3]
    # non-trivial carries: pretend a prior step left them behind
    carries = 1e-7 * jnp.sin(jnp.cumsum(jnp.ones_like(interior), axis=-1))
    P = pack_state(params, jnp.concatenate([interior, carries], axis=0))
    dt = jnp.asarray(0.003, P.dtype)
    ref = make_fused_mhd_packed_io(params, tiles=(8, 8), interpret=True)
    zc = make_zcarry_mhd_packed_io(params, tiles=(8, 8), interpret=True,
                                   with_inv_dt=True)
    Pz, inv = zc(P, dt)
    np.testing.assert_allclose(
        np.asarray(Pz), np.asarray(ref(P, dt)), rtol=0, atol=5e-8
    )
    assert float(inv) == float(
        compute_inv_dt_mhd_packed(params, Pz, y0=YB)
    )


@pytest.mark.parametrize("fold_cfl", [False, True])
def test_packed_advance_loop_no_buffer_aliasing(fold_cfl):
    """Pin the packed advance loop's in/out buffer independence (STATUS
    open question #5): the while_loop body's pallas call reads input wrap
    ghost planes that its own output band DMAs would clobber if XLA
    aliased the in/out HBM buffers across iterations. The
    optimization_barrier in step_packed is the guard; this test compares
    the jitted loop against an unrolled host-side sequence where every
    call gets a fresh buffer — bitwise (same kernel, same inputs).

    fold_cfl=True additionally pins the opt-in in-kernel-CFL fold
    ([implementation] foldCfl) against the same oracle — the in-tile
    partial max() + seam pass is bit-identical to the separate streaming
    reduction by construction."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import (
        make_fused_mhd_packed_io,
        make_pallas_advance_n,
    )
    from ramsesgpu_tpu.pallas.packed_io import make_packed_cfl_mhd, pack_state

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True
    try:
        adv = make_pallas_advance_n(
            params.replace(kernel="pallas", fold_cfl=fold_cfl)
        )
        U_loop, t_loop, k_loop = adv(
            U0, jnp.asarray(0.0, U0.dtype), jnp.asarray(3, jnp.int32)
        )

        fused = make_fused_mhd_packed_io(params, tiles=(8, 8))
        cfl = make_packed_cfl_mhd(params)
        P = pack_state(params, U0[:, g:-g, g:-g, g:-g])
        t = 0.0
        for _ in range(3):
            # device_get/put breaks any buffer reuse between iterations:
            # this sequence is the no-aliasing-possible oracle
            P_host = np.asarray(P)
            dt = params.cfl / cfl(jnp.asarray(P_host))
            P = fused(jnp.asarray(P_host), dt)
            t += float(dt)
        U_ref = jnp.pad(
            P[:, g:-g, 8 : 8 + ny, :], ((0, 0),) + ((g, g),) * 3,
            mode="wrap",
        )
    finally:
        pk.INTERPRET = False
    assert int(k_loop) == 3
    np.testing.assert_allclose(float(t_loop), t, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(U_loop), np.asarray(U_ref))


def test_packed_form_advance_matches_standard():
    """The capability-scale packed-form entry (pack/advance_packed/unpack,
    make_pallas_advance_n(packed_form=True) — donated buffers so a 512^3
    state fits a v5e, scripts/capability_run.py) is bitwise the standard
    ghosted-contract advance_n."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_advance_n

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True
    try:
        adv = make_pallas_advance_n(params)
        U1, t1, k1 = adv(
            U0, jnp.asarray(0.0, U0.dtype), jnp.asarray(3, jnp.int32)
        )
        pack, advp, unpack = make_pallas_advance_n(params, packed_form=True)
        P2, t2, k2 = advp(
            pack(U0.copy()), jnp.asarray(0.0, U0.dtype),
            jnp.asarray(3, jnp.int32),
        )
        U2 = unpack(P2)
    finally:
        pk.INTERPRET = False
    assert int(k1) == int(k2) == 3
    assert float(t1) == float(t2)
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))


@pytest.mark.parametrize("dissip", [False, True])
def test_zcarry_advance_n_matches_packed_advance(dissip):
    """The full advance loop with kernel=zcarry (packed carry + in-kernel
    CFL chained across the while_loop) tracks the packed advance loop.
    Also guards the in/out buffer independence of the pallas call inside
    the loop body (the kernel reads input ghost planes its own output
    DMAs would clobber under aliasing). The dissipative variant uses the
    generic loop shape (zcarry Godunov phase + packed dissipation pass +
    separate streaming CFL)."""
    from ramsesgpu_tpu.pallas.fused_mhd3d import make_pallas_advance_n

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(text=OT3D_INI.format(nx=nx, ny=ny, nz=nz))
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    if dissip:
        params = params.replace(nu=1e-4, eta=5e-5)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U0.dtype)
    n = jnp.asarray(3, jnp.int32)

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True
    try:
        adv_pk = make_pallas_advance_n(params.replace(kernel="pallas"))
        adv_zc = make_pallas_advance_n(params.replace(kernel="zcarry"))
        U_p, t_p, k_p = adv_pk(U0, t0, n)
        U_z, t_z, k_z = adv_zc(U0, t0, n)
    finally:
        pk.INTERPRET = False
    assert int(k_p) == int(k_z) == 3
    np.testing.assert_allclose(float(t_z), float(t_p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(U_z), np.asarray(U_p), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("dims", [
    (16, 16, 16),
    (16, 8, 8),      # single real tile (warmup + drain edge cases)
    (16, 8, 16),     # single column
    (16, 24, 8),     # columns only
])
def test_zcarry_hydro_step_matches_packed(dims):
    """Hydro z-block-streaming kernel (pallas/zcarry_hydro3d.py) vs the
    packed-IO hydro kernel on the full packed state incl. wrap ghost
    bands, over the warmup/drain edge shapes."""
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_fused_hydro_packed_io,
    )
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.pallas.zcarry_hydro3d import (
        make_zcarry_hydro_packed_io,
    )

    nx, ny, nz = dims
    config = ConfigMap(
        text=HYDRO3D_INI.format(nx=nx, ny=ny, nz=nz, solver="hllc")
    )
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    g = params.ghost_width
    P = pack_state(params, U0[:, g:-g, g:-g, g:-g])
    dt = jnp.asarray(0.002, P.dtype)
    ref = make_fused_hydro_packed_io(params, tiles=(8, 8), interpret=True)
    zc = make_zcarry_hydro_packed_io(params, tiles=(8, 8), interpret=True)
    np.testing.assert_allclose(
        np.asarray(zc(P, dt)), np.asarray(ref(P, dt)), rtol=0, atol=5e-8
    )
    # in-kernel CFL: bit-identical to the pointwise pass on the output
    from ramsesgpu_tpu.pallas.packed_io import YB
    from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_hydro

    zc2 = make_zcarry_hydro_packed_io(params, tiles=(8, 8), interpret=True,
                                      with_inv_dt=True)
    Pz, inv = zc2(P, dt)
    want = compute_inv_dt_hydro(
        params, Pz[:, g : g + nz, YB : YB + ny, :], ghost=0
    )
    # the reduction tree is exact (max), but the per-cell expression is
    # RECOMPUTED in a different fusion context -> up to 1 ULP of FMA
    # contraction difference
    np.testing.assert_allclose(float(inv), float(want), rtol=1e-6)


def test_zcarry_hydro_advance_n_matches_packed():
    """Full hydro advance loop with kernel=zcarry vs the packed loop."""
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_pallas_hydro_advance_n,
        hydro_packed_supported,
    )
    from ramsesgpu_tpu.pallas.zcarry_hydro3d import zcarry_hydro_supported

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(
        text=HYDRO3D_INI.format(nx=nx, ny=ny, nz=nz, solver="hllc")
    )
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    assert hydro_packed_supported(params)
    assert zcarry_hydro_supported(params)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U0.dtype)
    n = jnp.asarray(3, jnp.int32)

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True
    try:
        adv_pk = make_pallas_hydro_advance_n(params.replace(kernel="pallas"))
        adv_zc = make_pallas_hydro_advance_n(params.replace(kernel="zcarry"))
        U_p, t_p, k_p = adv_pk(U0, t0, n)
        U_z, t_z, k_z = adv_zc(U0, t0, n)
    finally:
        pk.INTERPRET = False
    assert int(k_p) == int(k_z) == 3
    np.testing.assert_allclose(float(t_z), float(t_p), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(U_z), np.asarray(U_p), rtol=0, atol=1e-5
    )


def test_hydro_packed_form_advance_matches_standard():
    """The hydro packed-form chain (pack/advance_packed/unpack,
    make_pallas_hydro_advance_n(packed_form=True) — chunked drivers carry
    the packed state across chunk boundaries, solvers/step.
    make_packed_advance_chain) is bitwise the ghosted-contract advance_n,
    including when split across two chained chunks."""
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        hydro_packed_supported,
        make_pallas_hydro_advance_n,
    )

    nx, ny, nz = 128, 16, 16
    config = ConfigMap(
        text=HYDRO3D_INI.format(nx=nx, ny=ny, nz=nz, solver="hllc")
    )
    params = params_from_config(config).replace(pallas_tiles=(8, 8))
    assert hydro_packed_supported(params)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U0.dtype)

    import ramsesgpu_tpu.pallas as pk

    pk.INTERPRET = True
    try:
        adv = make_pallas_hydro_advance_n(params)
        U1, t1, k1 = adv(U0, t0, jnp.asarray(3, jnp.int32))
        pack, advp, unpack = make_pallas_hydro_advance_n(
            params, packed_form=True
        )
        # two chained chunks (1 + 2 steps): the chunk boundary must be
        # invisible to the numerics
        P, t2, ka = advp(pack(U0.copy()), t0, jnp.asarray(1, jnp.int32))
        P, t2, kb = advp(P, t2, jnp.asarray(2, jnp.int32))
        U2 = unpack(P)
    finally:
        pk.INTERPRET = False
    assert int(k1) == 3 and int(ka) + int(kb) == 3
    assert float(t1) == float(t2)
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))


@pytest.mark.parametrize("bcs", [(1, 1), (2, 3)])
def test_packed_bc_advance_matches_step(bcs):
    """The padded-carry non-periodic hydro advance (pallas/packed_bc.py:
    in-kernel ghost band maintenance + streaming CFL) tracks the
    whole-array step loop over several steps, and its returned ghost
    frame is exactly a fresh fill of the final interior."""
    import ramsesgpu_tpu.pallas as pallas_pkg
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_pallas_hydro_bc_advance_n,
    )
    from ramsesgpu_tpu.pallas.packed_bc import packed_bc_supported
    from ramsesgpu_tpu.solvers.step import make_step_fn

    bxmin, bymax = bcs
    config = ConfigMap(text=IMPLODE3D_INI.format(
        nx=16, ny=16, nz=8, bxmin=bxmin, bymax=bymax))
    params = params_from_config(config)
    assert packed_bc_supported(params)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))

    ref_step = make_step_fn(params)          # whole-array on CPU
    Ur = U0
    t = jnp.asarray(0.0, U0.dtype)
    for _ in range(3):
        Ur, dtr = ref_step(Ur, t)
        Ur = make_boundaries(params, Ur)
        t = t + dtr

    pallas_pkg.INTERPRET = True
    try:
        advance = make_pallas_hydro_bc_advance_n(params)
        Uk, tk, k = advance(U0, jnp.asarray(0.0, U0.dtype),
                            jnp.array(3, jnp.int32))
    finally:
        pallas_pkg.INTERPRET = False
    assert int(k) == 3
    assert abs(float(tk) - float(t)) < 1e-6 * max(float(t), 1e-30)
    g = params.ghost_width
    sl = (slice(None),) + (slice(g, -g),) * 3
    np.testing.assert_allclose(
        np.asarray(Uk)[sl], np.asarray(Ur)[sl], rtol=0, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(Uk), np.asarray(make_boundaries(params, Uk)))


def test_packed_bc_form_chained_chunks_match():
    """The packed-BC chain (make_pallas_hydro_bc_advance_n(packed_form=
    True)) split across two chained chunks is bitwise one 3-step chunk of
    the ghosted-contract advance — the in-kernel ghost maintenance keeps
    the carried frame valid across the chunk boundary."""
    import ramsesgpu_tpu.pallas as pallas_pkg
    from ramsesgpu_tpu.pallas.fused_hydro3d import (
        make_pallas_hydro_bc_advance_n,
    )

    config = ConfigMap(text=IMPLODE3D_INI.format(
        nx=16, ny=16, nz=8, bxmin=2, bymax=3))
    params = params_from_config(config)
    U0 = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    t0 = jnp.asarray(0.0, U0.dtype)

    pallas_pkg.INTERPRET = True
    try:
        advance = make_pallas_hydro_bc_advance_n(params)
        U1, t1, k1 = advance(U0, t0, jnp.array(3, jnp.int32))
        pack, advp, unpack = make_pallas_hydro_bc_advance_n(
            params, packed_form=True
        )
        S, t2, ka = advp(pack(U0.copy()), t0, jnp.array(1, jnp.int32))
        S, t2, kb = advp(S, t2, jnp.array(2, jnp.int32))
        U2 = unpack(S)
    finally:
        pallas_pkg.INTERPRET = False
    assert int(k1) == 3 and int(ka) + int(kb) == 3
    assert float(t1) == float(t2)
    np.testing.assert_array_equal(np.asarray(U1), np.asarray(U2))


def test_run_chained_carry_matches_unchained():
    """Run.start() with the packed chain engaged (pack once, advance
    packed across output intervals, unpack on demand) is bitwise the
    unchained chunked drive, including a mid-run _host_ghosted() read."""
    import ramsesgpu_tpu.pallas as pallas_pkg
    from ramsesgpu_tpu.solvers.run import Run

    def build():
        config = ConfigMap(text=IMPLODE3D_INI.format(
            nx=16, ny=16, nz=8, bxmin=2, bymax=3))
        config.set_string("implementation", "kernel", "pallas")
        config.set_integer("run", "noutput", -1)
        config.set_integer("run", "nstepmax", 4)
        return config

    pallas_pkg.INTERPRET = True
    try:
        r1 = Run(build())
        assert r1._chain is not None
        r1.start(max_steps=4, do_output=False)

        r2 = Run(build())
        r2._chain = None  # force the per-chunk ghosted contract
        r2.start(max_steps=4, do_output=False)
    finally:
        pallas_pkg.INTERPRET = False
    assert r1.n_step == r2.n_step == 4
    assert r1.t == r2.t
    np.testing.assert_array_equal(np.asarray(r1.U), np.asarray(r2.U))


def test_packed_cfl_hydro_bitwise():
    """The streaming hydro CFL kernel == compute_inv_dt_hydro, on both
    loop layouts (x-ghost-free packed and lane-padded BC)."""
    from ramsesgpu_tpu.pallas.packed_bc import (
        make_packed_cfl_hydro,
        pack_bc_state,
        padded_width,
    )
    from ramsesgpu_tpu.pallas.packed_io import pack_state
    from ramsesgpu_tpu.solvers.timestep import compute_inv_dt_hydro

    config = ConfigMap(text=IMPLODE3D_INI.format(
        nx=16, ny=16, nz=8, bxmin=1, bymax=1))
    params = params_from_config(config)
    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    # non-trivial velocities so |u| terms matter
    rng = np.random.default_rng(3)
    U = U.at[1:4].add(
        jnp.asarray(0.1 * rng.normal(size=U[1:4].shape).astype(np.float32))
    )
    U = make_boundaries(params, U)
    g = params.ghost_width

    want = float(compute_inv_dt_hydro(params, U))

    S = pack_bc_state(params, U)
    cfl_bc = make_packed_cfl_hydro(
        params, x_off=g, wx=padded_width(params), interpret=True)
    assert float(cfl_bc(S)) == want

    # all-periodic packed layout
    config2 = ConfigMap(text=HYDRO3D_INI.format(
        nx=16, ny=16, nz=8, solver="hllc"))
    params2 = params_from_config(config2)
    U2 = make_boundaries(params2, jnp.asarray(init_problem(params2, config2)))
    P = pack_state(params2, U2[:, g:-g, g:-g, g:-g])
    cfl_p = make_packed_cfl_hydro(params2, interpret=True)
    assert float(cfl_p(P)) == float(compute_inv_dt_hydro(params2, U2))
