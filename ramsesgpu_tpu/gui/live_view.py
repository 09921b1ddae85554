"""Live 2D run viewer and snapshot animator.

Stand-in for the reference's OpenGL/Qt live GUIs
(reference: src/glutGui/HydroWindow.h — CUDA/GL PBO interop rendering of 2D
runs with colormaps from palettes.h — and src/qtGui/qtHydro2d): a
matplotlib-based viewer that either (a) drives a 2D run and renders a chosen
variable every output interval (interactive window when a display exists,
PNG frames otherwise), or (b) animates saved snapshots into an mp4/gif.

Usage:
  ramses-tpu-view --param jet2d_gpu.ini --var density --steps 2000
  ramses-tpu-view --animate 'run_*.h5' --param run.ini --out movie.gif
"""
from __future__ import annotations

import argparse
import glob
import sys

import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import params_from_config
from ..core.constants import var_names


def _matplotlib(interactive: bool):
    import matplotlib

    if not interactive:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def live_run(args) -> int:
    import jax.numpy as jnp

    from ..problems import init_problem
    from ..solvers.boundary import make_boundaries
    from ..solvers.step import make_advance_n

    config = ConfigMap(args.param)
    params = params_from_config(config)
    if params.dim != 2:
        raise SystemExit("live view renders 2D runs (like the reference GUIs)")

    names = list(var_names(params.nb_var))
    ivar = names.index(args.var)
    g = params.ghost_width

    U = make_boundaries(params, jnp.asarray(init_problem(params, config)))
    advance = make_advance_n(params)
    t = jnp.asarray(0.0, U.dtype)

    import os

    interactive = bool(os.environ.get("DISPLAY")) and not args.frames
    plt = _matplotlib(interactive)
    fig, ax = plt.subplots(figsize=(6, 6))
    img = ax.imshow(
        np.asarray(U[ivar, g:-g, g:-g]), origin="lower", cmap=args.cmap
    )
    fig.colorbar(img, ax=ax)
    if interactive:
        plt.ion()
        plt.show()

    n_step = 0
    frame = 0
    while n_step < args.steps and (params.t_end <= 0 or float(t) < params.t_end):
        U, t, k = advance(U, t, jnp.array(args.interval, jnp.int32))
        n_step += int(k)
        data = np.asarray(U[ivar, g:-g, g:-g])
        img.set_data(data)
        img.set_clim(data.min(), data.max())
        ax.set_title(f"{args.var}  step {n_step}  t={float(t):.4f}")
        if interactive:
            fig.canvas.draw_idle()
            plt.pause(0.001)
        else:
            fig.savefig(f"frame_{frame:05d}.png", dpi=110)
        frame += 1
        if int(k) == 0:
            break
    if not interactive:
        print(f"wrote {frame} frames (frame_*.png)")
    return 0


def animate_snapshots(args) -> int:
    from ..io.hdf5 import input_hdf5

    config = ConfigMap(args.param)
    params = params_from_config(config)
    names = list(var_names(params.nb_var))
    ivar = names.index(args.var)
    g = params.ghost_width

    files = sorted(glob.glob(args.animate))
    if not files:
        raise SystemExit(f"no files match {args.animate!r}")

    plt = _matplotlib(False)
    from matplotlib.animation import FuncAnimation

    frames = []
    for f in files:
        U, t, step = input_hdf5(params, f)
        a = U[ivar]
        if params.dim == 3:
            a = a[a.shape[0] // 2]
        frames.append((a[g:-g, g:-g] if a.shape[0] > params.ny else a, t))

    fig, ax = plt.subplots(figsize=(6, 6))
    img = ax.imshow(frames[0][0], origin="lower", cmap=args.cmap)
    fig.colorbar(img, ax=ax)

    def update(i):
        data, t = frames[i]
        img.set_data(data)
        img.set_clim(data.min(), data.max())
        ax.set_title(f"{args.var}  t={t:.4f}")
        return [img]

    anim = FuncAnimation(fig, update, frames=len(frames), interval=100)
    anim.save(args.out, writer="pillow" if args.out.endswith(".gif") else None)
    print(f"wrote {args.out} ({len(frames)} frames)")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="live 2D run viewer / animator")
    parser.add_argument("--param", required=True)
    parser.add_argument("--var", default="density")
    parser.add_argument("--cmap", default="viridis")
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--interval", type=int, default=20,
                        help="steps between frames")
    parser.add_argument("--frames", action="store_true",
                        help="force PNG frame output (no window)")
    parser.add_argument("--animate", default=None,
                        help="glob of .h5 snapshots to animate instead of running")
    parser.add_argument("--out", default="movie.gif")
    args = parser.parse_args(argv)
    if args.animate:
        return animate_snapshots(args)
    return live_run(args)


if __name__ == "__main__":
    sys.exit(main())
