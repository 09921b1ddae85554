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
    return out


class HistoryWriter:
    """Append-only text history file, one line per sample
    (format follows the reference's history files, e.g.
    HydroRunBaseMpi.cpp:10908 'totalTime dt mass divB')."""

    def __init__(self, params: RunParams, output_dir: str, prefix: str):
        self.params = params
        os.makedirs(output_dir, exist_ok=True)
        self.path = Path(output_dir) / f"{prefix}.history"
        self._header_written = self.path.exists()

    def append(self, sample: dict[str, float]) -> None:
        if not self._header_written:
            self.path.write_text("# " + " ".join(sample.keys()) + "\n")
            self._header_written = True
        with self.path.open("a") as f:
            f.write(" ".join(f"{v:.10e}" for v in sample.values()) + "\n")
