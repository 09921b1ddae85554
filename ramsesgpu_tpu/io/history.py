"""On-line history diagnostics.

Re-design of the reference's history hooks
(reference: src/hydro/HydroRunBase.cpp:7235-7396 history_hydro,
MHDRunBase.cpp:3414-3810 history_mhd/mri/turbulence): scalar diagnostics
appended to a text file at a configured cadence. Quantities are computed
on device as fused reductions.

Columns:
  hydro: totalTime dt mass totalEnergy
  MHD:   totalTime dt mass totalEnergy divB magneticEnergy
  MRI (omega0>0) adds: maxwellStress reynoldsStress alpha
  turbulence problems add (history_turbulence,
  reference: src/hydro/MHDRunBase.cpp:3626-3810): eKin eMag helicity
  mean_rho mean_B mean_B{x,y,z} mean_rhov{x,y,z} Ma_s Ma_alfven
  coef_{x,y,z} (|Bx| Fourier amplitude at kfft=nx-3 along each axis)
  inertial-wave problems use the reference's single-point probe
  (history_inertial_wave, MHDRunBase.cpp:3414-3470): rho dvx/cIso dvy/cIso
"""
from __future__ import annotations

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config.params import RunParams
from ..core.constants import IA, IB, IC, ID, IP, IU, IV, IW


def _interior(params: RunParams, a):
    g = params.ghost_width
    return a[(slice(g, -g),) * params.dim]


def compute_history(params: RunParams, U, t, dt) -> dict[str, float]:
    """Device-side reductions -> host dict (one small transfer)."""
    dv = params.dx * params.dy * (params.dz if params.dim == 3 else 1.0)
    rho = _interior(params, U[ID])
    out = {
        "totalTime": float(t),
        "dt": float(dt),
        "mass": float(jnp.sum(rho) * dv),
        "totalEnergy": float(jnp.sum(_interior(params, U[IP])) * dv),
    }
    if params.mhd:
        bx, by, bz = U[IA], U[IB], U[IC]
        div = (jnp.roll(bx, -1, -1) - bx) / params.dx + (
            jnp.roll(by, -1, -2) - by
        ) / params.dy
        if params.dim == 3:
            div = div + (jnp.roll(bz, -1, -3) - bz) / params.dz
        g = params.ghost_width
        sl = (slice(g, -g - 1),) * params.dim
        out["divB"] = float(jnp.abs(div[sl]).max())
        emag = 0.5 * (
            _interior(params, bx) ** 2
            + _interior(params, by) ** 2
            + _interior(params, bz) ** 2
        )
        out["magneticEnergy"] = float(jnp.sum(emag) * dv)

        if params.omega0 > 0:
            # MRI stresses (MHDRunBase.cpp:3476-3619): Maxwell = -<Bx By>,
            # Reynolds = <rho vx dvy> with dvy the shear-subtracted vy
            rho_i = rho
            u = _interior(params, U[IU]) / rho_i
            v = _interior(params, U[IV]) / rho_i
            # subtract the background shear -1.5 Omega0 x
            from ..solvers.godunov_mhd import xpos_array

            xp = _interior(params, jnp.broadcast_to(
                xpos_array(params, U.dtype), U.shape[1:]))
            dv_shear = v + 1.5 * params.omega0 * xp
            bxc = _interior(params, 0.5 * (bx + jnp.roll(bx, -1, -1)))
            byc = _interior(params, 0.5 * (by + jnp.roll(by, -1, -2)))
            maxwell = float(jnp.mean(-bxc * byc))
            reynolds = float(jnp.mean(rho_i * u * dv_shear))
            pres_mean = float(
                jnp.mean((params.gamma0 - 1.0) * _interior(params, U[IP]))
            )
            out["maxwellStress"] = maxwell
            out["reynoldsStress"] = reynolds
            out["alpha"] = (maxwell + reynolds) / max(pres_mean, 1e-30)

        problem = str(params.problem).lower()
        if problem.startswith("turbulence") and params.dim == 3:
            out.update(_turbulence_channels(params, U))
        elif problem in ("inertialwave", "inertial-wave"):
            out.update(_inertial_wave_channels(params, U))
    return out


def _turbulence_channels(params: RunParams, U) -> dict[str, float]:
    """Volume-averaged turbulence diagnostics.

    Redesign of the reference's history_turbulence loop
    (reference: src/hydro/MHDRunBase.cpp:3684-3790) as fused jnp
    reductions: sonic/Alfvenic Mach numbers, cross helicity
    < rho_v . B/sqrt(rho) >, mean fields, and the |Bx| Fourier amplitude
    at kfft = nx-3 along each axis (the forcing-scale tracer).  All sums
    use the reference's volume normalization dTau = dV / (Lx Ly Lz).
    """
    g = params.ghost_width
    sl = (slice(g, -g),) * params.dim
    rho = U[ID][sl]
    mx, my_, mz_ = U[IU][sl], U[IV][sl], U[IW][sl]
    bx, by, bz = U[IA][sl], U[IB][sl], U[IC][sl]

    lx = params.xmax - params.xmin
    ly = params.ymax - params.ymin
    lz = params.zmax - params.zmin
    dtau = params.dx * params.dy * params.dz / (lx * ly * lz)

    v2 = (mx / rho) ** 2 + (my_ / rho) ** 2 + (mz_ / rho) ** 2
    ekin = jnp.sum((mx**2 + my_**2 + mz_**2) / rho) * dtau
    emag = jnp.sum(bx**2 + by**2 + bz**2) * dtau
    sq = jnp.sqrt(rho)
    helicity = jnp.sum((mx * bx + my_ * by + mz_ * bz) / sq) * dtau
    mean_rho = jnp.sum(rho) * dtau
    mean_bx = jnp.sum(bx) * dtau
    mean_by = jnp.sum(by) * dtau
    mean_bz = jnp.sum(bz) * dtau
    mean_b = jnp.sqrt(mean_bx**2 + mean_by**2 + mean_bz**2)
    mean_v2 = jnp.sum(v2) * dtau

    # signed divB *sum* over the interior (the reference's turbulence
    # history uses the sum, not the max, MHDRunBase.cpp:3772-3785)
    div = (
        (jnp.roll(U[IA], -1, -1) - U[IA]) / params.dx
        + (jnp.roll(U[IB], -1, -2) - U[IB]) / params.dy
        + (jnp.roll(U[IC], -1, -3) - U[IC]) / params.dz
    )
    divb_sum = jnp.sum(div[sl])

    # Fourier amplitude of Bx at kfft=nx-3 along each axis; the constant
    # ghost-offset phase of the reference's absolute indices drops out of
    # the modulus
    kfft = params.nx - 3
    dtype = U.dtype
    phase_x = 2.0 * np.pi * kfft * jnp.arange(params.nx, dtype=dtype) / params.nx
    phase_y = 2.0 * np.pi * kfft * jnp.arange(params.ny, dtype=dtype) / params.ny
    phase_z = 2.0 * np.pi * kfft * jnp.arange(params.nz, dtype=dtype) / params.nz

    def coef(phase, axis):
        shape = [1, 1, 1]
        shape[axis] = -1
        ph = phase.reshape(shape)
        re = jnp.sum(bx * jnp.cos(ph))
        im = jnp.sum(bx * jnp.sin(ph))
        return jnp.sqrt(re**2 + im**2) * dtau

    c_iso = params.c_iso if params.c_iso > 0 else 1.0
    vrms = jnp.sqrt(mean_v2)
    return {
        "eKin": float(ekin),
        "eMag": float(emag),
        "helicity": float(helicity),
        "divB_sum": float(divb_sum),
        "mean_rho": float(mean_rho),
        "mean_B": float(mean_b),
        "mean_Bx": float(mean_bx),
        "mean_By": float(mean_by),
        "mean_Bz": float(mean_bz),
        "mean_rhovx": float(jnp.sum(mx) * dtau),
        "mean_rhovy": float(jnp.sum(my_) * dtau),
        "mean_rhovz": float(jnp.sum(mz_) * dtau),
        "Ma_s": float(vrms / c_iso),
        "Ma_alfven": float(
            vrms / (mean_b / jnp.sqrt(4.0 * np.pi * mean_rho) + 1e-30)
        ),
        "coef_x": float(coef(phase_x, 2)),
        "coef_y": float(coef(phase_y, 1)),
        "coef_z": float(coef(phase_z, 0)),
    }


def _inertial_wave_channels(params: RunParams, U) -> dict[str, float]:
    """Single-point wave probe (reference: MHDRunBase.cpp:3448-3466):
    rho and the velocity perturbations in units of cIso at the cell
    (i = nx/2, first interior y/z row) — the reference's 3D variant reads
    absolute j=1 (inside the ghost band); we probe the first *interior*
    row, identical for the problem's y-invariant wave."""
    g = params.ghost_width
    i = g + params.nx // 2
    if params.dim == 3:
        idx = (g, g, i)  # (z, y, x)
    else:
        idx = (g, i)
    rho = U[(ID, *idx)]
    dvx = U[(IU, *idx)] / rho
    dvy = U[(IV, *idx)] / rho
    c_iso = params.c_iso if params.c_iso > 0 else 1.0
    return {
        "rho_probe": float(rho),
        "dvx_over_cIso": float(dvx / c_iso),
        "dvy_over_cIso": float(dvy / c_iso),
    }


class HistoryWriter:
    """Append-only text history file, one line per sample
    (format follows the reference's history files, e.g.
    HydroRunBaseMpi.cpp:10908 'totalTime dt mass divB')."""

    def __init__(self, params: RunParams, output_dir: str, prefix: str):
        import jax

        self.params = params
        os.makedirs(output_dir, exist_ok=True)
        self.path = Path(output_dir) / f"{prefix}.history"
        self._header_written = self.path.exists()
        # multi-host: every process computes the (collective) reductions,
        # only process 0 touches the shared-filesystem file
        self._active = jax.process_index() == 0

    def append(self, sample: dict[str, float]) -> None:
        if not self._active:
            return
        if not self._header_written:
            self.path.write_text("# " + " ".join(sample.keys()) + "\n")
            self._header_written = True
        with self.path.open("a") as f:
            f.write(" ".join(f"{v:.10e}" for v in sample.values()) + "\n")
