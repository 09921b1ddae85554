"""Probe Mosaic DMA alignment rules: VMEM->HBM writes at sublane offset 3,
and sublane shapes of 3 — the patterns the packed-output kernel needs.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, z_off, z_len, y_off, y_len):
    nz, ny, nx = 16, 40, 256

    def kernel(x_hbm, o_hbm, win, sem, sem_o):
        cin = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(0, z_len), pl.ds(0, y_len), :],
            win.at[:, pl.ds(0, z_len), pl.ds(0, y_len), :],
            sem,
        )
        cin.start()
        cin.wait()
        out = pltpu.make_async_copy(
            win.at[:, pl.ds(0, z_len), pl.ds(0, y_len), :],
            o_hbm.at[:, pl.ds(z_off, z_len), pl.ds(y_off, y_len), :],
            sem_o,
        )
        out.start()
        out.wait()

    x = jnp.arange(8 * nz * ny * nx, dtype=jnp.float32).reshape(8, nz, ny, nx)
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((8, nz, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 8, 8, nx), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    try:
        out = np.asarray(jax.jit(f)(x))
        got = out[:, z_off : z_off + z_len, y_off : y_off + y_len, :]
        want = np.asarray(x)[:, :z_len, :y_len, :]
        ok = np.array_equal(got, want)
        print(f"{name}: {'OK' if ok else 'WRONG VALUES'}", flush=True)
    except Exception as exc:
        print(f"{name}: FAILED {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    probe("aligned baseline        (z+0 8, y+0  8)", 0, 8, 0, 8)
    probe("sublane offset 3        (z+0 8, y+3  8)", 0, 8, 3, 8)
    probe("sublane shape 3         (z+0 8, y+0  3)", 0, 8, 0, 3)
    probe("offset 3 + shape 3      (z+0 8, y+3  3)", 0, 8, 3, 3)
    probe("z offset 3, z shape 3   (z+3 3, y+0  8)", 3, 3, 0, 8)
