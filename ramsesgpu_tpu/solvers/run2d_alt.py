"""Driver for the alternative schemes (split Godunov, Kurganov-Tadmor,
Lax-Liu, relaxing TVD).

Equivalent of the reference's HydroRunKT / HydroRunLaxLiu /
HydroRunRelaxingTVD drivers and the --scheme CLI switch
(reference: src/euler_main.cpp:87-118, euler2d_laxliu.cpp). These schemes
are host-loop driven (they are the 2D legacy corner of the framework);
each per-parity step is a separate jitted program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import params_from_config
from ..utils.timer import Timer, perf_report
from .run import Run
from .timestep import compute_dt


class AltSchemeRun(Run):
    def __init__(self, config: ConfigMap, scheme: str = "kurganov"):
        params = params_from_config(config)
        if scheme == "relaxingTVD" and params.ghost_width != 3:
            # the reference forces ghostWidth=3 for relaxing TVD
            # (euler_main.cpp:112-113)
            params = params.replace(ghost_width=3)
        if scheme in ("kurganov", "laxliu") and params.dim != 2:
            raise ValueError(f"scheme {scheme} is 2D only (as in the reference)")
        self.scheme = scheme
        super().__init__(config, params)

    def start(self, max_steps=None, do_output: bool = True) -> None:
        p = self.params
        n_stepmax = p.n_stepmax if max_steps is None else min(p.n_stepmax, max_steps)
        n_output = p.n_output

        if self.scheme == "kurganov":
            from .alt_schemes import kt_step

            steps = [
                jax.jit(lambda U, odd=odd: kt_step(p, U, odd, p.xlambda, p.ylambda))
                for odd in (False, True)
            ]

            def advance(U, t, k):
                U = steps[k % 2](U)
                return U, t + p.xlambda * p.dx

        elif self.scheme == "laxliu":
            from .alt_laxliu import laxliu_step

            step = jax.jit(lambda U: laxliu_step(p, U))

            def advance(U, t, k):
                return step(U), t + p.xlambda * p.dx

        elif self.scheme == "relaxingTVD":
            from .alt_schemes import relaxing_tvd_step

            n_orders = 2 if p.dim == 2 else 6
            steps = [
                jax.jit(lambda U, dt, m=m: relaxing_tvd_step(p, U, dt, m))
                for m in range(n_orders)
            ]
            dt_fn = jax.jit(lambda U: compute_dt(p, U))

            def advance(U, t, k):
                dt = dt_fn(U)
                U = steps[k % n_orders](U, dt)
                return U, t + float(dt)

        elif self.scheme in ("godunov-split", "split"):
            from .alt_schemes import godunov_split_step

            n_orders = 2 if p.dim == 2 else 6
            steps = [
                jax.jit(lambda U, dt, m=m: godunov_split_step(p, U, dt, m))
                for m in range(n_orders)
            ]
            dt_fn = jax.jit(lambda U: compute_dt(p, U))

            def advance(U, t, k):
                dt = dt_fn(U)
                U = steps[k % n_orders](U, dt)
                return U, t + float(dt)

        else:
            raise ValueError(f"unknown scheme {self.scheme!r}")

        wall = Timer()
        wall.start()
        t = jnp.asarray(self.t, self.U.dtype)
        while self.n_step < n_stepmax and (p.t_end <= 0 or self.t < p.t_end):
            if do_output and n_output > 0 and self.n_step % n_output == 0:
                self.output()
            self.U, t = advance(self.U, t, self.n_step)
            self.n_step += 1
            self.t = float(t)
        self.U.block_until_ready()
        wall.stop()
        if do_output:
            self.output()

        n_cells = p.nx * p.ny * (p.nz if p.dim == 3 else 1)
        print(perf_report(self.n_step, n_cells, wall.total, io_time=self.io_timer.total))
