"""Quantify the fused-kernel margin-recompute factor by XLA cost analysis.

Traces the box-tracked tile update (the exact function the packed-IO kernel
runs per window, pallas/packed_io.py:167) for a given (bz, by) tile and for
one full-grid tile, and compares flops:

    overhead = (tile flops * n_tiles) / full-grid-tile flops

Runs on CPU (pure trace + compile of the update body, no Pallas).
Usage: python scripts/margin_flops.py [n] [bz,by ...]
"""
from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ramsesgpu_tpu.config.configmap import ConfigMap  # noqa: E402
from ramsesgpu_tpu.config.params import params_from_config  # noqa: E402
from ramsesgpu_tpu.pallas.packed_io import YB  # noqa: E402

_INI = """
[run]
tend=100.0
[mesh]
nx={n}
ny={n}
nz={n}
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


def tile_flops(params, bz, by, ymargin):
    """Flops of one (bz, by) window update, traced exactly as the packed-IO
    kernel body does (BoxField over the y-trimmed window, margin (g, YB, 0))."""
    from ramsesgpu_tpu.ops.backend import BOX, BoxField
    from ramsesgpu_tpu.solvers.godunov_mhd import mhd_3d_interior_update

    g = params.ghost_width
    nx = params.nx
    wz = bz + 2 * g
    wy = by + 2 * ymargin
    tile_params = params.replace(
        ny=by, nz=bz,
        ymax=params.ymin + by * params.dy,
        zmax=params.zmin + bz * params.dz,
    )

    def body(win, dt):
        U = BoxField(win, 0, ymargin - g)
        return mhd_3d_interior_update(
            tile_params, U, dt, margin=(g, ymargin, 0), xp=BOX
        )

    win = jnp.zeros((params.nb_var, wz, wy, nx), jnp.float32)
    dt = jnp.float32(1e-3)
    ca = jax.jit(body).lower(win, dt).compile().cost_analysis()
    return float(ca["flops"]), float(ca.get("transcendentals", 0.0))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tiles = [tuple(map(int, a.split(","))) for a in sys.argv[2:]] or [
        (8, 32), (8, 64), (16, 16), (8, 256), (4, 256), (2, 256)
    ]
    config = ConfigMap(text=_INI.format(n=n))
    params = params_from_config(config)
    cells = n ** 3

    f_full, t_full = tile_flops(params, params.nz, params.ny, YB)
    print(f"full-grid tile: {f_full:.3e} flops ({f_full / cells:.0f}/cell), "
          f"{t_full:.3e} transcendentals ({t_full / cells:.1f}/cell)")
    for bz, by in tiles:
        ntiles = (params.nz // bz) * (params.ny // by)
        f, t = tile_flops(params, bz, by, YB)
        print(
            f"tile ({bz:3d},{by:3d}): {f * ntiles:.3e} flops total, "
            f"overhead x{f * ntiles / f_full:.3f}  "
            f"(transcendental x{t * ntiles / max(t_full, 1): .3f})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
