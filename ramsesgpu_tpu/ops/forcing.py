"""Turbulence driving: static-spectrum forcing and Ornstein-Uhlenbeck forcing.

Re-design of the reference's two forcing subsystems:

1. Static-spectrum ("turbulence" problem): an Enzo-heritage 16-mode velocity
   perturbation field generated once (reference: src/hydro/turbulenceInit.cpp:
   41-200 with its published mode/phase/amplitude tables), re-applied every
   step with an energy-injection normalization
   (HydroRunBase.cpp:1201-1428, random_forcing.cuh).

2. Ornstein-Uhlenbeck ("turbulence-Ornstein-Uhlenbeck"): 31 Fourier modes,
   each following an exact OU update (Gillespie 1996), projected onto a
   solenoidal/compressive mix by ksi, evaluated in real space every step
   (reference: src/hydro/Forcing_OrnsteinUhlenbeck.{h,cpp},
   _kernels.cuh). The OU mode state is a small pytree updated inside jit
   with jax.random; checkpoints use the same .npz layout as the reference.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import RunParams
from ..core.constants import ID, IP, IU, IV, IW

# --------------------------------------------------------------------------- #
# 1. static-spectrum forcing (Enzo-heritage)
# --------------------------------------------------------------------------- #

# 16 driving modes with 1 <= |k| <= 2 (turbulenceInit.cpp:56-74)
_MODES16 = np.array(
    [
        [1, 1, 1], [-1, 1, 1], [1, -1, 1], [1, 1, -1],
        [0, 0, 1], [0, 1, 0], [1, 0, 0],
        [0, 1, 1], [1, 0, 1], [1, 1, 0],
        [0, -1, 1], [-1, 0, 1], [-1, 1, 0],
        [0, 0, 2], [0, 2, 0], [2, 0, 0],
    ]
)

# published random phases for seed=12398L (turbulenceInit.cpp:81-99)
_PHAX = np.array([4.88271710, 4.55016280, 3.68972560, 5.76067300,
                  2.02647730, 0.832007770, 1.93749010, 0.0141755510,
                  5.13556960, 2.77787590, 2.02909450, 0.663769130,
                  1.80512500, 3.31305960, 1.05063310, 1.75230850])
_PHAY = np.array([1.40113130, 5.71809960, 3.82072880, 1.00265060,
                  2.26816680, 2.81446220, 0.990584490, 2.94580650,
                  3.92715640, 0.896237970, 1.85357800, 2.84606100,
                  1.63463330, 3.46619220, 5.58599570, 1.59481430])
_PHAZ = np.array([5.60595510, 4.13909050, 6.22733640, 5.92633250,
                  3.51874880, 5.42229180, 5.77061890, 4.95180180,
                  4.46144340, 5.29367540, 5.50741860, 2.39496800,
                  4.59486870, 2.23851540, 3.19591550, 4.47066500])

# solenoidalized Gaussian amplitudes for seed=12398L (turbulenceInit.cpp:102-117)
_AMP = np.array([
    [0.0755957220, -1.35724380, 0.378455820, -0.383104000,
     0.116980840, -1.16079680, 0.0, -0.0280965080,
     0.0, 0.0, -0.232798780, 0.0,
     0.0, -0.879534360, -0.604585950, 0.0],
    [1.03223790, 0.530986910, -0.242943420, -0.832715270,
     -0.607103350, 0.0, -0.278135540, 0.0,
     -1.18019080, 0.0, 0.0, 0.976678430,
     0.0, -0.694509390, 0.0, -0.608007610],
    [1.01825800, -0.966076610, 0.211956020, -0.605923650,
     0.0, 0.314906060, 0.109417880, 0.0,
     0.0, -1.53612340, 0.0, 0.0,
     0.813212160, 0.0, -0.368619380, -0.371489380],
])

_SIGN1 = np.array([1.0, -1.0, -1.0, 1.0])
_SIGN2 = np.array([-1.0, -1.0, 1.0, 1.0])


def turbulence_init_field(params: RunParams, mach_number: float) -> np.ndarray:
    """Generate the static 3-component forcing velocity field on the full
    ghosted grid (turbulenceInit.cpp:120-199). Returns [3, nz_t, ny_t, nx_t]."""
    aa = 2.0 * np.pi / params.nx  # nbox = global nx
    g = params.ghost_width
    i = np.arange(params.isize) - g + 1
    j = np.arange(params.jsize) - g + 1
    k = np.arange(params.ksize) - g + 1
    K, J, I = np.meshgrid(k, j, i, indexing="ij")

    u = np.zeros(I.shape)
    v = np.zeros(I.shape)
    w = np.zeros(I.shape)

    for imo in range(4):
        k1 = _MODES16[imo, 0] * I + _MODES16[imo, 1] * J + _MODES16[imo, 2] * K
        u += _AMP[0, imo] * np.cos(aa * k1 + _PHAX[imo])
        # solenoidal phase corrections for the diagonal modes
        # (Crockett 2005 eqs. 10.6-10.7, turbulenceInit.cpp:152-172)
        phayy = _PHAX[imo] + _SIGN1[imo] * np.arccos(
            (_AMP[2, imo] ** 2 - _AMP[0, imo] ** 2 - _AMP[1, imo] ** 2)
            / 2.0 / _AMP[0, imo] / _MODES16[imo, 0] / _MODES16[imo, 1] / _AMP[1, imo]
        )
        v += _AMP[1, imo] * np.cos(aa * k1 + phayy)
        phazz = _PHAX[imo] + _SIGN2[imo] * np.arccos(
            (_AMP[1, imo] ** 2 - _AMP[0, imo] ** 2 - _AMP[2, imo] ** 2)
            / 2.0 / _AMP[0, imo] / _MODES16[imo, 0] / _MODES16[imo, 2] / _AMP[2, imo]
        )
        w += _AMP[2, imo] * np.cos(aa * k1 + phazz)

    for imo in range(4, 16):
        k1 = _MODES16[imo, 0] * I + _MODES16[imo, 1] * J + _MODES16[imo, 2] * K
        u += _AMP[0, imo] * np.cos(aa * k1 + _PHAX[imo])
        v += _AMP[1, imo] * np.cos(aa * k1 + _PHAY[imo])
        w += _AMP[2, imo] * np.cos(aa * k1 + _PHAZ[imo])

    scale = mach_number / 2.848320  # normalize to rms 3D Mach
    dtype = np.float64 if params.dtype == "float64" else np.float32
    return np.stack([u, v, w]).astype(dtype) * scale


def default_edot(params: RunParams, config: ConfigMap) -> float:
    """MacLow (1999) energy injection rate default
    (HydroRunBase.cpp:7176-7193)."""
    edot = config.get_float("turbulence", "edot", -1.0)
    if edot < 0:
        d0 = config.get_float("turbulence", "density", 1.0)
        mach = config.get_float("turbulence", "machNumber", 0.0)
        box = params.xmax - params.xmin
        box_mass = box**3 * d0
        v_rms = mach
        edot = 0.81 / box * box_mass * v_rms**3
        edot *= 0.8
    return edot


def random_forcing_normalization(params: RunParams, U, F, dt, edot):
    """Energy-injection normalization factor
    (HydroRunBase.cpp:1201-1312): norm = (sqrt(s0^2 + s1*dt*edot*2*N) - s0)/s1
    with s0 = sum rho v.dv, s1 = sum rho dv^2."""
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    rho = U[ID][sl]
    u = U[IU][sl] / rho
    v = U[IV][sl] / rho
    w = U[IW][sl] / rho
    fu, fv, fw = F[0][sl], F[1][sl], F[2][sl]
    s0 = jnp.sum(rho * (u * fu + v * fv + w * fw))
    s1 = jnp.sum(rho * (fu * fu + fv * fv + fw * fw))
    n_cells = params.nx * params.ny * params.nz
    if edot == 0:
        return jnp.zeros_like(s0)
    return (jnp.sqrt(s0 * s0 + s1 * dt * edot * 2 * n_cells) - s0) / s1


def add_random_forcing(params: RunParams, U, F, norm):
    """Kick momenta by rho*F*norm with the consistent energy update
    (HydroRunBase.cpp:1397-1428)."""
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    rho = U[ID][sl]
    dE = (
        U[IU][sl] / rho * F[0][sl] * norm + 0.5 * (F[0][sl] * norm) ** 2
        + U[IV][sl] / rho * F[1][sl] * norm + 0.5 * (F[1][sl] * norm) ** 2
        + U[IW][sl] / rho * F[2][sl] * norm + 0.5 * (F[2][sl] * norm) ** 2
    )
    U = U.at[(IP,) + sl].add(dE)
    U = U.at[(IU,) + sl].add(rho * F[0][sl] * norm)
    U = U.at[(IV,) + sl].add(rho * F[1][sl] * norm)
    U = U.at[(IW,) + sl].add(rho * F[2][sl] * norm)
    return U


# --------------------------------------------------------------------------- #
# 2. Ornstein-Uhlenbeck forcing
# --------------------------------------------------------------------------- #

N_MODE_OU = 31

# the 31 driving wavevectors (Forcing_OrnsteinUhlenbeck.cpp:160-191)
OU_MODES = np.array([
    [0, 0, 2], [0, 0, 3], [0, 1, 2], [0, 1, 3], [0, 2, 0], [0, 2, 1],
    [0, 2, 2], [0, 3, 0], [0, 3, 1], [1, 0, 2], [1, 0, 3], [1, 1, 2],
    [1, 1, 3], [1, 2, 0], [1, 2, 1], [1, 2, 2], [1, 3, 0], [1, 3, 1],
    [2, 0, 0], [2, 0, 1], [2, 0, 2], [2, 1, 0], [2, 1, 1], [2, 1, 2],
    [2, 2, 0], [2, 2, 1], [2, 2, 2], [3, 0, 0], [3, 0, 1], [3, 1, 0],
    [3, 1, 1],
], dtype=np.float64).T  # shape [3, 31]


@dataclasses.dataclass(frozen=True)
class OUForcingParams:
    """Static OU forcing configuration
    ([turbulence-Ornstein-Uhlenbeck] section)."""

    timescale: float = 0.1
    amplitude: float = 0.0001
    ksi: float = 0.0
    init_random: int = 600

    @classmethod
    def from_config(cls, config: ConfigMap) -> "OUForcingParams":
        sec = "turbulence-Ornstein-Uhlenbeck"
        return cls(
            timescale=config.get_float(sec, "timeScaleTurb", 0.1),
            amplitude=config.get_float(sec, "amplitudeTurb", 0.0001),
            ksi=config.get_float(sec, "ksi", 0.0),
            init_random=config.get_integer(sec, "init_random", 600),
        )


def init_ou_forcing(fp: OUForcingParams, seed: int | None = None):
    """Build the OU forcing state pytree: randomized mode signs, projection
    tensor, zero field, PRNG key (Forcing_OrnsteinUhlenbeck.cpp:142-215)."""
    rng = np.random.RandomState(seed if seed is not None else fp.init_random)
    mode = OU_MODES.copy()  # [3, 31]
    signs = np.sign(rng.randn(3, N_MODE_OU))
    signs[signs == 0] = 1.0
    mode = np.copysign(mode, signs)

    ksi = fp.ksi
    ssum = (mode**2).sum(axis=0)  # [31]
    eye = np.eye(3)
    # projTens[i,j,m] = ksi*delta_ij + (1-2ksi) * k_j k_i / |k|^2
    proj = ksi * eye[:, :, None] + (1.0 - 2.0 * ksi) * (
        mode[None, :, :] * mode[:, None, :] / ssum[None, None, :]
    )

    return {
        "mode": jnp.asarray(mode),
        "projTens": jnp.asarray(proj),
        "forcingField": jnp.zeros((3, N_MODE_OU), jnp.float32),
        "key": jax.random.PRNGKey(fp.init_random if seed is None else seed),
    }


def update_forcing_field_mode(params: RunParams, fp: OUForcingParams, state, dt):
    """Exact OU step per mode (Forcing_OrnsteinUhlenbeck.cpp:470-515;
    Gillespie 1996 eqs. 1.1/1.9a)."""
    key, sub = jax.random.split(state["key"])
    # reference: v = sqrt(5/3)*cIso; for non-isothermal runs cIso=0 in the
    # reference too — keep the same formula
    v = np.sqrt(5.0 / 3.0) * params.c_iso
    weight = fp.amplitude

    AAA = jax.random.normal(sub, (3, N_MODE_OU)) * jnp.sqrt(dt)  # [3, 31]
    # BBB[j,m] = sum_i projTens[i,j,m] * AAA[i,m]
    BBB = jnp.einsum("ijm,im->jm", state["projTens"], AAA)
    BBB = BBB * v * np.sqrt(2.0 * weight * weight / fp.timescale) / fp.timescale
    BBB = BBB - state["forcingField"] * dt / fp.timescale
    force_rms = 3.0 / np.sqrt(1.0 - 2.0 * fp.ksi + 3.0 * fp.ksi * fp.ksi)
    field = state["forcingField"] + force_rms * BBB
    return {**state, "forcingField": field.astype(state["forcingField"].dtype),
            "key": key}


def ou_phase_basis(params: RunParams, state, dtype):
    """cos(2*pi*(x kx + y ky + z kz)) per mode, shape [31, nz_t, ny_t, nx_t].

    The spatial basis depends only on the (static) mode table magnitudes and
    signs fixed at init, so it is computed once and closed over by the step.
    """
    g = params.ghost_width
    x = params.xmin + params.dx / 2 + (np.arange(params.isize) - g) * params.dx
    y = params.ymin + params.dy / 2 + (np.arange(params.jsize) - g) * params.dy
    z = params.zmin + params.dz / 2 + (np.arange(params.ksize) - g) * params.dz
    Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
    mode = np.asarray(state["mode"])  # [3, 31]
    phase = (
        X[None] * mode[0, :, None, None, None]
        + Y[None] * mode[1, :, None, None, None]
        + Z[None] * mode[2, :, None, None, None]
    )
    return jnp.asarray(np.cos(2.0 * np.pi * phase).astype(dtype))


def add_ou_forcing_field(params: RunParams, U, state, basis, dt):
    """Apply the OU force in real space at constant internal energy
    (Forcing_OrnsteinUhlenbeck.cpp:543-610)."""
    g = params.ghost_width
    sl = (slice(g, -g),) * 3
    rho = U[ID][sl]
    # A[dim] = sum_m field[dim,m] * cos(2 pi phase_m)
    A = jnp.einsum("dm,m...->d...", state["forcingField"].astype(U.dtype),
                   basis)[(slice(None),) + sl]

    eint = U[IP][sl] - 0.5 * (U[IU][sl] ** 2 + U[IV][sl] ** 2 + U[IW][sl] ** 2) / rho
    mu = U[IU][sl] + A[0] * dt * rho
    mv = U[IV][sl] + A[1] * dt * rho
    mw = U[IW][sl] + A[2] * dt * rho
    e_new = eint + 0.5 * (mu * mu + mv * mv + mw * mw) / rho

    U = U.at[(IU,) + sl].set(mu)
    U = U.at[(IV,) + sl].set(mv)
    U = U.at[(IW,) + sl].set(mw)
    U = U.at[(IP,) + sl].set(e_new)
    return U


# --------------------------------------------------------------------------- #
# forcing-state checkpointing (npz layout of Forcing_OrnsteinUhlenbeck.cpp:
# output_forcing / input_forcing)
# --------------------------------------------------------------------------- #
def save_ou_forcing(state, path, n_cpu: int = 1) -> None:
    np.savez(
        path,
        nMode=np.array([N_MODE_OU], np.int32),
        nCpu=np.array([n_cpu], np.int32),
        mode=np.asarray(state["mode"]).T,          # [31, 3] as the reference
        forcingField=np.asarray(state["forcingField"]).T,
        projTens=np.asarray(state["projTens"]).T,
        gaussSeed=np.asarray(jax.device_get(state["key"])).astype(np.int64),
    )


def load_ou_forcing(path):
    data = np.load(path)
    n_mode = int(np.atleast_1d(data["nMode"])[0])
    if n_mode != N_MODE_OU:
        raise ValueError(f"forcing file has nMode={n_mode}, expected {N_MODE_OU}")
    key = np.asarray(data["gaussSeed"]).astype(np.uint32)
    if key.size != 2:
        key = jax.random.PRNGKey(0)
    else:
        key = jnp.asarray(key.reshape(2))
    return {
        "mode": jnp.asarray(data["mode"].T),
        "forcingField": jnp.asarray(data["forcingField"].T.astype(np.float32)),
        "projTens": jnp.asarray(data["projTens"].T),
        "key": key,
    }
