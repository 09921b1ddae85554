"""Simulation driver: time loop, outputs, history.

Equivalent of the reference's ``HydroRunGodunov::start()`` time loop
(reference: src/hydro/HydroRunGodunov.cpp:3857-4079), redesigned so the hot
loop is a single jitted device program per output interval; the host only
orchestrates I/O and logging.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import RunParams, params_from_config
from ..problems import init_problem
from ..utils.timer import PhaseTimers, Timer, perf_report
from .boundary import make_boundaries
from .step import make_advance_n


class Run:
    """Owns config, state, and the output machinery for one simulation."""

    def __init__(self, config: ConfigMap, params: RunParams | None = None):
        self.config = config
        self.params = params or params_from_config(config)

        if self.params.dtype == "float64":
            jax.config.update("jax_enable_x64", True)

        # output settings ([output] section, HydroParameters.h:455-489)
        self.output_dir = config.get_string("output", "outputDir", "./")
        self.output_prefix = config.get_string("output", "outputPrefix", "output")
        self.output_vtk = config.get_bool("output", "outputVtk", True)
        self.output_hdf5 = config.get_bool("output", "outputHdf5", False)
        self.output_png = config.get_bool("output", "outputPng", False)
        self.output_nrrd = config.get_bool("output", "outputNrrd", False)
        self.output_xsm = config.get_bool("output", "outputXsm", False)
        self.output_bin = config.get_bool("output", "outputBin", False)
        self.output_faces = config.get_bool("output", "outputFaces", False)
        # reference key [output] outputNetcdf4 (HydroParameters.h:470);
        # also accept the MPI-side spelling outputNetcdf
        self.output_netcdf = config.get_bool(
            "output", "outputNetcdf4", False
        ) or config.get_bool("output", "outputNetcdf", False)
        # collective single-artifact output for distributed runs (the
        # reference's PHDF5/PNetCDF single-shared-file role — see
        # io/sharded.output_zarr_sharded)
        self.output_zarr = config.get_bool("output", "outputZarr", False)
        self.ghost_included = config.get_bool("output", "ghostIncluded", False)
        self.n_log = config.get_integer("run", "nlog", 0)
        self.sf_enabled = config.get_bool("structureFunctions", "enabled", False)
        # numerics guard (the FPE-trap / debug-dump successor, utils/guard.py)
        self.fpe_check = config.get_bool("run", "fpe_check", False) or config.get_bool(
            "debug", "dumpData", False
        )

        # history ([history] section, HydroRunBase.cpp:7235+)
        self.history_enabled = config.get_bool("history", "enabled", False)
        self.dt_hist = config.get_float("history", "dtHist", 0.0)
        self._history_writer = None
        self._next_hist_time = 0.0
        if self.history_enabled:
            from ..io.history import HistoryWriter

            self._history_writer = HistoryWriter(
                self.params, self.output_dir, self.output_prefix
            )

        self.t = 0.0
        self.n_step = 0
        self.io_timer = Timer()
        self.phases = PhaseTimers()

        restart = config.get_bool("run", "restart", False)
        if restart:
            from ..io.restart import load_restart

            self.U, self.t, self.n_step = load_restart(self.params, config)
        else:
            self.U = jnp.asarray(init_problem(self.params, config))
        # initial ghost fill (reference start(): make_all_boundaries first,
        # HydroRunGodunov.cpp:3884)
        self.U = jax.jit(lambda u: make_boundaries(self.params, u))(self.U)

        self._chain = None
        self._forced = self.params.problem in (
            "turbulence",
            "turbulence-Ornstein-Uhlenbeck",
        )
        if self._forced:
            from .step import make_forced_advance_n

            self._advance_forced, self._fstate = make_forced_advance_n(
                self.params, config
            )
            if config.get_bool("run", "restart", False) and self.params.problem == (
                "turbulence-Ornstein-Uhlenbeck"
            ):
                # reload forcing state checkpoint if present
                from ..ops.forcing import load_ou_forcing

                fpath = (
                    f"{self.output_dir}/{self.output_prefix}"
                    f"_forcing_{self.n_step:07d}.npz"
                )
                import os as _os

                if _os.path.exists(fpath):
                    self._fstate = load_ou_forcing(fpath)
        else:
            self._advance_n = make_advance_n(self.params, config)
            # chunk-chained packed loop (step.make_packed_advance_chain):
            # pack once at start(), advance packed across output intervals,
            # unpack only when a host-facing consumer needs ghosted state.
            # DistributedRun resets this to None (its advance is sharded).
            from .step import make_packed_advance_chain

            self._chain = make_packed_advance_chain(self.params, config)
        self._S = None  # packed carry while start() is chained

    # ------------------------------------------------------------------ #
    def _host_ghosted(self):
        """State as a ghosted array for host-facing consumers (output,
        history, numerics guard). DistributedRun overrides this to gather
        its interior-only sharded state. While start() runs chained, this
        unpacks the packed carry on demand (the carry itself is untouched)."""
        if self._S is not None:
            leaf = jax.tree_util.tree_leaves(self._S)[0]
            return self._chain[2](
                self._S, jnp.asarray(self.t, leaf.dtype)
            )
        return self.U

    def output(self) -> None:
        with self.io_timer:
            U_host = np.asarray(jax.device_get(self._host_ghosted()))
            if self.output_vtk:
                from ..io.vtk import output_vtk

                output_vtk(
                    self.params,
                    U_host,
                    self.n_step,
                    output_dir=self.output_dir,
                    prefix=self.output_prefix,
                    ghost_included=self.ghost_included,
                )
            if self.output_hdf5:
                from ..io.hdf5 import output_hdf5

                output_hdf5(
                    self.params,
                    U_host,
                    self.n_step,
                    total_time=self.t,
                    output_dir=self.output_dir,
                    prefix=self.output_prefix,
                    ghost_included=self.ghost_included,
                )
            if self.output_netcdf:
                from ..io.netcdf import output_netcdf

                output_netcdf(
                    self.params,
                    U_host,
                    self.n_step,
                    f"{self.output_dir}/{self.output_prefix}"
                    f"_{self.n_step:07d}.nc",
                    total_time=self.t,
                    ghost_included=self.ghost_included,
                )
            if self._forced and self.params.problem == "turbulence-Ornstein-Uhlenbeck":
                from ..ops.forcing import save_ou_forcing

                save_ou_forcing(
                    self._fstate,
                    f"{self.output_dir}/{self.output_prefix}"
                    f"_forcing_{self.n_step:07d}.npz",
                )
            p = self.params
            names_prefix = f"{self.output_dir}/{self.output_prefix}"
            if self.output_png:
                from ..io.png import output_png

                output_png(p, U_host, self.n_step, self.output_dir,
                           self.output_prefix)
            if self.output_nrrd:
                from ..core.constants import var_names
                from ..io.misc_formats import write_nrrd

                g = p.ghost_width
                for i, name in enumerate(var_names(p.nb_var)):
                    write_nrrd(
                        f"{names_prefix}_{name}_{self.n_step:07d}.nrrd",
                        U_host[i][(slice(g, -g),) * p.dim],
                    )
            if self.output_xsm and p.dim == 2:
                from ..core.constants import var_names
                from ..io.misc_formats import write_xsm

                g = p.ghost_width
                for i, name in enumerate(var_names(p.nb_var)):
                    write_xsm(
                        f"{names_prefix}_{name}_{self.n_step:07d}.xsm",
                        U_host[i][g:-g, g:-g],
                    )
            if self.output_bin:
                from ..io.misc_formats import write_bin

                g = p.ghost_width
                write_bin(
                    f"{names_prefix}_{self.n_step:07d}.bin",
                    U_host[(slice(None),) + (slice(g, -g),) * p.dim],
                )
            if self.output_faces:
                from ..io.misc_formats import output_faces

                output_faces(p, U_host, self.n_step, self.output_dir,
                             self.output_prefix)
            if self.sf_enabled:
                from ..analysis.structure_functions import structure_functions_online

                structure_functions_online(p, self.config, U_host, self.n_step)

    # ------------------------------------------------------------------ #
    def start(self, max_steps: int | None = None, do_output: bool = True) -> None:
        """Run to t_end / n_stepmax, writing output every n_output steps."""
        p = self.params
        n_stepmax = p.n_stepmax if max_steps is None else min(p.n_stepmax, max_steps)
        n_output = p.n_output

        t_device = jnp.asarray(self.t, self.U.dtype)
        wall = Timer()
        wall.start()

        if self._chain is not None and not self._forced:
            # enter the packed carry: self.U is donated to pack; every
            # host-facing consumer goes through _host_ghosted() from here
            self._S = self._chain[0](self.U)
            self.U = None

        while self.n_step < n_stepmax and (p.t_end <= 0 or self.t < p.t_end):
            if do_output and n_output > 0 and self.n_step % n_output == 0:
                self.output()

            # advance one output interval (or to the step cap) on device
            if n_output > 0:
                chunk = min(n_output - (self.n_step % n_output), n_stepmax - self.n_step)
            else:
                chunk = n_stepmax - self.n_step
            if self._forced:
                self.U, self._fstate, t_device, k = self._advance_forced(
                    self.U, self._fstate, t_device, jnp.array(chunk, jnp.int32)
                )
            elif self._S is not None:
                self._S, t_device, k = self._chain[1](
                    self._S, t_device, jnp.array(chunk, jnp.int32)
                )
            else:
                self.U, t_device, k = self._advance_n(
                    self.U, t_device, jnp.array(chunk, jnp.int32)
                )
            k = int(k)
            self.t = float(t_device)
            self.n_step += k
            if k == 0:
                break  # t_end reached exactly

            if self.n_log > 0 and self.n_step % self.n_log == 0:
                print(f"step {self.n_step:7d}  t={self.t:.6f}", file=sys.stderr)

            if self.fpe_check:
                from ..utils.guard import NumericsError, check_finite, dump_debug_state

                U_g = self._host_ghosted()
                try:
                    check_finite(p, U_g, self.n_step)
                except NumericsError:
                    dump_debug_state(
                        p, self.config, U_g, 0.0, self.n_step, self.output_dir
                    )
                    raise

            if self._history_writer is not None and (
                self.dt_hist <= 0 or self.t >= self._next_hist_time
            ):
                from ..io.history import compute_history

                sample = compute_history(p, self._host_ghosted(), self.t, 0.0)
                with self.io_timer:
                    self._history_writer.append(sample)
                if self.dt_hist > 0:
                    while self._next_hist_time <= self.t:
                        self._next_hist_time += self.dt_hist

        if self._S is not None:
            # leave the packed carry: restore the ghosted-state contract
            self.U = self._host_ghosted()
            self._S = None
        self.U.block_until_ready()
        wall.stop()

        if do_output:
            self.output()

        print(self.perf_summary(wall.total))

    def perf_summary(self, elapsed: float) -> str:
        """End-of-run throughput report (overridden by DistributedRun to
        add the reference's per-rank/aggregate MPI lines,
        HydroRunGodunovMpi.cpp:3834-3839)."""
        p = self.params
        n_cells = p.nx * p.ny * (p.nz if p.dim == 3 else 1)
        return perf_report(
            self.n_step, n_cells, elapsed, io_time=self.io_timer.total,
            phases=self.phases if self.phases.timers else None,
        )

    # ------------------------------------------------------------------ #
    def interior(self) -> np.ndarray:
        """Ghost-stripped conserved state on host."""
        g = self.params.ghost_width
        U = np.asarray(jax.device_get(self.U))
        return U[(slice(None),) + (slice(g, -g),) * self.params.dim]
