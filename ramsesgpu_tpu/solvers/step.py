"""Single-step advance functions: the pure functional heart of the framework.

Where the reference composes ``oneStepIntegration`` out of class methods and
kernel launches (reference: src/hydro/HydroRunGodunov.cpp:4082-4113,
MHDRunGodunov.cpp:4077+), we expose pure functions of (U, t) that jit into
one XLA program per configuration:

    step(U, t)         -> (U', dt)      one time step (dt from CFL)
    advance_n(U, t, n) -> (U', t', k)   up to n steps, stopping at t_end

Everything stays on device; ``advance_n`` wraps the step in a
``lax.while_loop`` so a whole output interval runs without host sync.
The time argument matters only for shearing-box runs (the boundary remap
shift is 1.5*Omega0*Lx*t); all other configurations ignore it.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..config.params import RunParams
from ..core.constants import BoundaryConditionType as BCT
from .boundary import make_boundaries
from .godunov import godunov_unsplit_hydro
from .timestep import compute_dt


def make_gravity_field(params: RunParams, config=None):
    """Static gravity field: problem-specific (Keplerian disk, stratified
    MRI — the reference's h_gravity array) when a config is available,
    else the uniform [gravity] static_field_* (gravity.cuh heritage)."""
    if config is not None:
        from ..problems import gravity_field

        field = gravity_field(params, config)
        if field is not None:
            return jnp.asarray(field)
    if params.gravity_x == 0.0 and params.gravity_y == 0.0 and params.gravity_z == 0.0:
        return None
    import numpy as np

    shape = params.shape[1:]
    gvec = [params.gravity_x, params.gravity_y, params.gravity_z][: params.dim]
    dtype = np.float64 if params.dtype == "float64" else np.float32
    return jnp.asarray(
        np.stack([np.full(shape, g, dtype=dtype) for g in gvec])
    )


def _mri_gz_profile(params: RunParams, config, gravity):
    """The stratified-MRI vertical gravity as an analytic callable gz(z)
    (problems.mhd_inits.mri_gravity_field's formula), validated against the
    registry's static field so the in-kernel evaluation is guaranteed to
    reproduce it. Returns None when the field is not this profile (e.g.
    x/y-dependent gravity), which keeps the whole-array fallback."""
    import numpy as np

    g_np = np.asarray(gravity)
    if g_np.shape[0] != 3:
        return None
    if np.any(g_np[0]) or np.any(g_np[1]):
        return None
    gz = g_np[2]
    # z-profile only: invariant over (y, x)
    if not np.allclose(gz, gz[..., :1, :1], rtol=0, atol=0):
        return None
    smooth = False
    z_floor = 5.0
    if config is not None:
        smooth = config.get_bool("MRI", "smoothGravity", False)
        z_floor = config.get_float("MRI", "zFloor", 5.0)
    om2 = params.omega0 ** 2
    H = params.c_iso / params.omega0 if params.omega0 > 0 else 1.0

    def profile(zc):
        g = -om2 * zc
        if smooth:
            g = g * jnp.exp(-((jnp.abs(zc) / (z_floor * H)) ** 8))
        return g

    # verify the analytic form reproduces the registry field. Tolerance,
    # not exactness: with smoothGravity the exp((|z|/zH)^8) factor rounds
    # differently on the TPU (registry field) than in this host trace —
    # rel ~3.4e-6 at the flagship grid — and an rtol of 1e-6 silently
    # dropped stratified MRI to the 8x-slower whole-array fallback
    # (round-4 PERF.md, 125 ms/step). 1e-5 still rejects any genuinely
    # different profile.
    from ..problems.grid import cell_centers_1d

    z = cell_centers_1d(params, "z").astype(g_np.dtype)
    want = np.asarray(profile(jnp.asarray(z)))
    if not np.allclose(gz[..., 0, 0], want, rtol=1e-5, atol=1e-11):
        return None
    return profile


def uses_shear(params: RunParams) -> bool:
    return (
        params.boundary_xmin == BCT.BC_SHEARINGBOX
        or params.boundary_xmax == BCT.BC_SHEARINGBOX
    )


def make_step_fn(params: RunParams, config=None) -> Callable:
    """Build ``step(U, t) -> (U_new, dt)`` for this configuration."""
    gravity = make_gravity_field(params, config)

    use_zslab = params.dim == 3 and params.z_slab_nb > 1
    shear = uses_shear(params)

    def fill_ghosts(U, dt, t):
        if shear:
            from .shear import make_all_boundaries_shear

            # the reference fills shear ghosts for time totalTime+dt
            # (MHDRunGodunov.cpp:3551)
            return make_all_boundaries_shear(params, U, t + dt)
        return make_boundaries(params, U)

    if params.mhd:
        from .godunov_mhd import godunov_unsplit_mhd

        backend_ok = params.kernel == "pallas" or (
            params.kernel == "auto" and jax.default_backend() == "tpu"
        )
        if (
            backend_ok
            and params.dim == 3
            and gravity is None
            and shear
        ):
            from ..pallas.shear_packed import shear_packed_supported

            if shear_packed_supported(params):
                # x-ghost-free packed MRI step (full lane utilization);
                # production runs should prefer make_advance_n, which keeps
                # the packed carry across a whole output interval
                from ..pallas.shear_packed import make_shear_packed_step_fn

                return make_shear_packed_step_fn(params)

            from ..pallas.fused_mhd3d import pallas_shear_supported

            if pallas_shear_supported(params):
                from ..pallas.fused_mhd3d import make_pallas_shear_step_fn

                return make_pallas_shear_step_fn(params)

        if (
            backend_ok
            and params.dim == 3
            and gravity is not None
            and shear
        ):
            # STRATIFIED MRI: the vertical gravity is the analytic profile
            # gz = -Omega0^2 z (x optional smooth cutoff,
            # MHDRunBase.cpp:3163-3245); when the registry field matches
            # it, the fused shear kernels consume it as a DMA'd aux input
            # plane (trace half-kick + conservative source in-kernel).
            # Hardware-validated round 5 (ladder strat_small +
            # strat_flagship green, 17.2 ms/step at 128x256x128 vs the
            # 125 ms whole-array fallback of round 4, whose in-kernel
            # iota construction SIGABRTed the remote Mosaic compiler).
            from ..pallas.fused_mhd3d import pallas_shear_supported
            from ..pallas.shear_packed import shear_packed_supported

            gz_profile = _mri_gz_profile(params, config, gravity)
            if gz_profile is not None and shear_packed_supported(
                params, stratified=True
            ):
                from ..pallas.shear_packed import make_shear_packed_step_fn

                return make_shear_packed_step_fn(
                    params, gravity_z=gz_profile
                )
            if gz_profile is not None and pallas_shear_supported(
                params, stratified=True
            ):
                from ..pallas.fused_mhd3d import make_pallas_shear_step_fn

                return make_pallas_shear_step_fn(
                    params, gravity_z=gz_profile
                )

        use_pallas = False
        if (
            backend_ok
            and params.kernel in ("auto", "pallas")
            and params.dim == 3
            and gravity is None
            and not shear
        ):
            from ..pallas.fused_mhd3d import pallas_supported

            # dissipative runs compose the Godunov kernel with the fused
            # dissipation kernel (make_pallas_step_fn appends it)
            use_pallas = pallas_supported(params.replace(nu=0.0, eta=0.0))

        if use_pallas:
            from ..pallas.fused_mhd3d import make_pallas_step_fn

            return make_pallas_step_fn(params)

        def step(U, t):
            dt = compute_dt(params, U)
            U_b = fill_ghosts(U, dt, t)
            # shearing-box runs thread t into the update for the conservative
            # flux/emfY remap at the domain x-faces
            t_remap = t if shear else None
            if use_zslab and gravity is None:
                from .zslab import zslab_apply

                # per-window dissipation would re-fill boundaries on window
                # seams as if they were physical — apply it once, globally
                U_new = zslab_apply(
                    params, U_b,
                    lambda w: godunov_unsplit_mhd(
                        params, w, dt, t=t_remap, apply_dissipation=False
                    ),
                    params.z_slab_nb,
                )
                if params.nu > 0 or params.eta > 0:
                    from .dissipation import apply_dissipation_mhd

                    U_new = fill_ghosts(U_new, dt, t)
                    U_new = apply_dissipation_mhd(params, U_new, dt)
            else:
                U_new = godunov_unsplit_mhd(
                    params, U_b, dt, gravity=gravity, t=t_remap
                )
            return U_new, dt

    else:
        use_pallas = False
        if (
            params.kernel in ("auto", "pallas")
            and params.dim == 3
            and gravity is None
            and not shear
        ):
            from ..pallas.fused_hydro3d import hydro_pallas_supported

            backend_ok = True
            if params.kernel == "auto":
                import jax as _jax

                backend_ok = _jax.default_backend() == "tpu"
            use_pallas = backend_ok and hydro_pallas_supported(params)

        if use_pallas:
            from ..pallas.fused_hydro3d import make_pallas_hydro_step_fn

            return make_pallas_hydro_step_fn(params)

        def step(U, t):
            dt = compute_dt(params, U)
            U_b = fill_ghosts(U, dt, t)
            if use_zslab and gravity is None:
                # (uniform-gravity + zslab would need per-window gravity
                # slices; fall back to the monolithic update in that case)
                from .zslab import zslab_apply

                U_new = zslab_apply(
                    params, U_b,
                    lambda w: godunov_unsplit_hydro(params, w, dt, gravity=None),
                    params.z_slab_nb,
                )
            else:
                U_new = godunov_unsplit_hydro(params, U_b, dt, gravity=gravity)
            if params.nu > 0:
                from .dissipation import apply_viscosity

                U_new = make_boundaries(params, U_new)
                U_new = apply_viscosity(params, U_new, dt)
            return U_new, dt

    return step


def make_advance_n(params: RunParams, config=None) -> Callable:
    """Build jitted ``advance_n(U, t, n_steps) -> (U, t, steps_done)`` that
    runs up to ``n_steps`` steps, stopping early when t reaches t_end.
    The loop carry stays on device for the whole chunk."""
    # fully-periodic 3D runs on the fused TPU kernels: carry the packed
    # (x-ghost-free, lane-exact) state across the loop instead of the
    # ghosted one (pallas/fused_mhd3d.make_pallas_advance_n and the hydro
    # twin in fused_hydro3d)
    if (
        params.dim == 3
        and params.mhd
        and params.kernel in ("auto", "pallas", "zcarry")
        and uses_shear(params)
    ):
        backend_ok = params.kernel in ("pallas", "zcarry") or (
            jax.default_backend() == "tpu"
        )
        gravity = make_gravity_field(params, config)
        if backend_ok and gravity is None:
            from ..pallas.shear_packed import (
                make_pallas_shear_advance_n,
                shear_packed_supported,
            )

            if shear_packed_supported(params):
                return make_pallas_shear_advance_n(params)
        elif backend_ok:
            # stratified packed advance — hardware-validated round 5
            # (ladder strat_small/strat_flagship; gz rides as a DMA'd aux
            # input plane, see make_step_fn's stratified branch)
            from ..pallas.shear_packed import (
                make_pallas_shear_advance_n,
                shear_packed_supported,
            )

            gz_profile = _mri_gz_profile(params, config, gravity)
            if gz_profile is not None and shear_packed_supported(
                params, stratified=True
            ):
                return make_pallas_shear_advance_n(
                    params, gravity_z=gz_profile
                )

    if (
        params.dim == 3
        and params.kernel in ("auto", "pallas", "zcarry")
        and not uses_shear(params)
        and make_gravity_field(params, config) is None
    ):
        backend_ok = params.kernel in ("pallas", "zcarry") or (
            jax.default_backend() == "tpu"
        )
        if backend_ok and params.mhd:
            from ..pallas.fused_mhd3d import (
                make_pallas_advance_n,
                pallas_packed_supported,
            )

            if pallas_packed_supported(params):
                return make_pallas_advance_n(params)
        elif backend_ok and params.nu == 0.0:
            from ..pallas.fused_hydro3d import (
                hydro_packed_supported,
                make_pallas_hydro_advance_n,
                make_pallas_hydro_bc_advance_n,
            )
            from ..pallas.packed_bc import packed_bc_supported

            if hydro_packed_supported(params):
                return make_pallas_hydro_advance_n(params)
            if packed_bc_supported(params):
                # non-periodic walls: padded-carry loop with in-kernel
                # ghost maintenance (pallas/packed_bc.py)
                return make_pallas_hydro_bc_advance_n(params)

    step = make_step_fn(params, config)
    t_end = params.t_end

    @jax.jit
    def advance_n(U, t, n_steps):
        def cond(carry):
            _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            U_c, t_c, k = carry
            U_n, dt = step(U_c, t_c)
            return (U_n, t_c + dt, k + 1)

        U_f, t_f, k_f = jax.lax.while_loop(cond, body, (U, t, jnp.array(0, jnp.int32)))
        return U_f, t_f, k_f

    return advance_n


def make_packed_advance_chain(params: RunParams, config=None):
    """``(pack, advance_packed, unpack)`` carrying the kernel's packed state
    across chunk boundaries, or None when this configuration has no packed
    loop (then use make_advance_n).

    Chunked drivers (bench.py, scripts/perf_table.py, long Run intervals)
    that call ``advance_n(U_ghosted, t, chunk)`` repeatedly pay the
    ghosted<->packed conversion (two full-state pad/slice passes, ~1 ms/step
    at 10-step chunks on 256^3) on EVERY chunk; chaining
    ``advance_packed(P, t, chunk)`` (donates P) pays it once per run —
    the steady state a production run with one long interval sees.
    Gating mirrors make_advance_n's packed selection exactly. The carried
    state is opaque (an array, or a ``(P, kept)`` pair for shear runs —
    ``state[0]`` is an array for checksums either way); ``unpack(state, t)``
    uniformly takes the current time (the sheared ghost reconstruction
    needs it; non-shear unpacks ignore it)."""
    if params.dim != 3 or params.kernel not in ("auto", "pallas", "zcarry"):
        return None
    backend_ok = params.kernel in ("pallas", "zcarry") or (
        jax.default_backend() == "tpu"
    )
    if not backend_ok:
        return None
    if params.mhd and uses_shear(params):
        from ..pallas.shear_packed import (
            make_pallas_shear_advance_n,
            shear_packed_supported,
        )

        gravity = make_gravity_field(params, config)
        if gravity is None:
            if shear_packed_supported(params):
                return make_pallas_shear_advance_n(params, packed_form=True)
            return None
        gz_profile = _mri_gz_profile(params, config, gravity)
        if gz_profile is not None and shear_packed_supported(
            params, stratified=True
        ):
            return make_pallas_shear_advance_n(
                params, gravity_z=gz_profile, packed_form=True
            )
        return None
    if uses_shear(params) or make_gravity_field(params, config) is not None:
        return None
    def _tless(triple):
        # uniform unpack(state, t) signature (non-shear unpacks ignore t)
        pack, adv, unpack = triple
        return pack, adv, lambda S, t: unpack(S)

    if params.mhd:
        from ..pallas.fused_mhd3d import (
            make_pallas_advance_n,
            pallas_packed_supported,
        )

        if pallas_packed_supported(params):
            return _tless(make_pallas_advance_n(params, packed_form=True))
    elif params.nu == 0.0:
        from ..pallas.fused_hydro3d import (
            hydro_packed_supported,
            make_pallas_hydro_advance_n,
            make_pallas_hydro_bc_advance_n,
        )
        from ..pallas.packed_bc import packed_bc_supported

        if hydro_packed_supported(params):
            return _tless(
                make_pallas_hydro_advance_n(params, packed_form=True)
            )
        if packed_bc_supported(params):
            return _tless(
                make_pallas_hydro_bc_advance_n(params, packed_form=True)
            )
    return None


@functools.lru_cache(maxsize=32)
def cached_advance_n(params: RunParams) -> Callable:
    """Per-configuration cache so repeated Run objects share compilations."""
    return make_advance_n(params)


# --------------------------------------------------------------------------- #
# turbulence-forced stepping: the step carries forcing state through the loop
# (the reference applies forcing at the end of godunov_unsplit,
# HydroRunGodunov.cpp:984-999)
# --------------------------------------------------------------------------- #
def make_forced_step_fn(params: RunParams, config) -> tuple[Callable, dict]:
    """Build ``step(U, fstate, t) -> (U, fstate, dt)`` plus the initial
    forcing state for the turbulence problems."""
    from ..ops import forcing as fz

    base_step = make_step_fn(params, config)

    if params.problem == "turbulence":
        mach = config.get_float("turbulence", "machNumber", 0.0)
        edot = fz.default_edot(params, config)
        F = jnp.asarray(fz.turbulence_init_field(params, mach))

        def step(U, fstate, t):
            U, dt = base_step(U, t)
            norm = fz.random_forcing_normalization(params, U, F, dt, edot)
            U = fz.add_random_forcing(params, U, F, norm)
            return U, fstate, dt

        return step, {}

    if params.problem == "turbulence-Ornstein-Uhlenbeck":
        import numpy as np

        fp = fz.OUForcingParams.from_config(config)
        fstate0 = fz.init_ou_forcing(fp)
        basis = fz.ou_phase_basis(params, fstate0, np.float32)

        def step(U, fstate, t):
            U, dt = base_step(U, t)
            fstate = fz.update_forcing_field_mode(params, fp, fstate, dt)
            U = fz.add_ou_forcing_field(params, U, fstate, basis, dt)
            return U, fstate, dt

        return step, fstate0

    # no forcing: wrap the plain step
    def step(U, fstate, t):
        U, dt = base_step(U, t)
        return U, fstate, dt

    return step, {}


def make_forced_advance_n(params: RunParams, config) -> tuple[Callable, dict]:
    """Jitted chunk advance carrying forcing state:
    (U, fstate, t, n) -> (U, fstate, t, k)."""
    step, fstate0 = make_forced_step_fn(params, config)
    t_end = params.t_end

    @jax.jit
    def advance_n(U, fstate, t, n_steps):
        def cond(carry):
            _, _, t_c, k = carry
            in_time = (t_c < t_end) if t_end > 0 else True
            return jnp.logical_and(k < n_steps, in_time)

        def body(carry):
            U_c, f_c, t_c, k = carry
            U_n, f_n, dt = step(U_c, f_c, t_c)
            return (U_n, f_n, t_c + dt, k + 1)

        return jax.lax.while_loop(cond, body, (U, fstate, t, jnp.array(0, jnp.int32)))

    return advance_n, fstate0
