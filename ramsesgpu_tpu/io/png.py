"""PNG image output with colormaps.

Replaces the reference's GraphicsMagick-based PNG writer and its palette
tables (reference: HydroRunBase.cpp:4097+ outputPng, src/glutGui/palettes.h):
PIL + matplotlib colormaps.
"""
from __future__ import annotations

import numpy as np


def write_png_colormap(
    filename: str,
    field2d: np.ndarray,
    cmap: str = "viridis",
    vmin: float | None = None,
    vmax: float | None = None,
) -> None:
    from PIL import Image
    import matplotlib

    a = np.asarray(field2d, dtype=np.float64)
    lo = a.min() if vmin is None else vmin
    hi = a.max() if vmax is None else vmax
    norm = (a - lo) / max(hi - lo, 1e-30)
    rgba = (matplotlib.colormaps[cmap](np.clip(norm, 0, 1)) * 255).astype(np.uint8)
    Image.fromarray(rgba[::-1]).save(filename)  # flip so +y is up


def output_png(params, U, n_step, output_dir=".", prefix="output",
               cmap="viridis", vmin=None, vmax=None):
    """Density snapshot as PNG (2D runs; 3D takes the mid-z plane), with the
    reference's naming scheme."""
    import os

    from ..core.constants import ID

    g = params.ghost_width
    rho = np.asarray(U[ID])
    if params.dim == 3:
        rho = rho[rho.shape[0] // 2]
    rho = rho[g:-g, g:-g]
    os.makedirs(output_dir, exist_ok=True)
    path = f"{output_dir}/{prefix}_{n_step:07d}.png"
    write_png_colormap(path, rho, cmap=cmap, vmin=vmin, vmax=vmax)
    return path
