"""Distributed simulation driver: the multi-chip Run.

Equivalent of the reference's MPI run classes
(reference: src/hydro/HydroRunGodunovMpi.cpp, MHDRunGodunovMpi.cpp and the
euler_mpi_main.cpp entry point): the same INI file drives it — [mpi] mx, my,
mz select the process grid (HydroMpiParameters.cpp:59-69) — but instead of
one MPI rank per GPU with hand-packed border buffers, a single JAX process
lays the interior-only global state over a device Mesh and the whole time
loop runs as one SPMD program (parallel/sharded_step.py).

Differences from the reference worth knowing:
- Snapshot I/O streams one device shard at a time (io/sharded.py): VTI
  becomes per-shard pieces + a ``.pvti`` master (the reference's per-rank
  VTK model, HydroRunBaseMpi.cpp:4206-4227) and HDF5 writes shard
  hyperslabs into one global-shape file (the PHDF5 successor,
  HydroRunBaseMpi.cpp:4835-5557) — the global array is never materialized
  on the host. ``[output] gatherOutput=yes`` restores the gathered
  single-file path; formats without a streaming writer (PNG/NRRD/...)
  always gather.
- dt is a ``pmax`` collective inside the step, not a host allReduce
  (HydroRunBaseMpi.cpp:501-518).
- [implementation] haloOverlap=yes enables halo-exchange/compute overlap
  (parallel/overlap.py) — the reference is fully synchronous.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config.configmap import ConfigMap
from ..config.params import RunParams, params_from_config
from ..parallel.mesh import make_mesh, topology_from_config, validate_decomposition
from ..parallel.sharded_step import make_sharded_advance_n, shard_global_state
from .boundary import make_boundaries
from .run import Run
from .step import uses_shear


class DistributedRun(Run):
    """Run over a device mesh; state is the interior-only sharded array."""

    def __init__(self, config: ConfigMap, params: RunParams | None = None,
                 mesh=None):
        # multi-host entry point (env-gated; the GlobalMpiSession successor,
        # parallel/multihost.py) — must run before any jax.devices() use
        from ..parallel.multihost import is_multiprocess, maybe_initialize_distributed

        maybe_initialize_distributed()
        self._multiprocess = is_multiprocess()

        base = params or params_from_config(config)
        mx, my, mz = topology_from_config(config)
        validate_decomposition(base, mx, my, mz)
        self.mesh = mesh if mesh is not None else make_mesh(mx=mx, my=my, mz=mz)

        super().__init__(config, base)
        self._gather_output = config.get_bool("output", "gatherOutput", False)

        if self._forced:
            # swap the single-device forced advance for the sharded one
            # (keeps self._fstate — incl. a restart-reloaded OU state)
            from ..parallel.sharded_step import make_sharded_forced_advance_n

            self._advance_forced, _ = make_sharded_forced_advance_n(
                self.params, self.mesh, config
            )
        # shearing-box runs are supported (3D MHD, periodic y/z — the
        # sharded step raises a targeted NotImplementedError otherwise);
        # host-side ghost fills then use the sheared remap at current t
        self._shear = uses_shear(self.params)

        # super() built a ghosted single-device state; shard its interior
        self.U = shard_global_state(self.params, self.mesh, self.U)
        self._advance_n = make_sharded_advance_n(self.params, self.mesh, config)
        self._chain = None  # sharded advance has its own packed layout
        self._fill_fn = jax.jit(lambda u: make_boundaries(self.params, u))

        if self.params.halo_overlap:
            from ..parallel.overlap import overlap_report, overlap_supported

            local_dims = (
                self.params.nz // mz, self.params.ny // my, self.params.nx // mx
            )
            if overlap_supported(self.params, local_dims):
                rep = overlap_report(self.params, local_dims)
                print(
                    f"halo overlap   : deep fraction {rep['deep_fraction']:.1%}, "
                    f"bulk exchange {rep['bulk_exchange_bytes'] / 1e6:.2f} MB/shard/step "
                    f"(reference: 0% overlap)",
                    file=sys.stderr,
                )
            else:
                print(
                    "halo overlap   : requested but not supported for this "
                    "configuration — falling back to the synchronous exchange "
                    "(see parallel/overlap.py:overlap_supported)",
                    file=sys.stderr,
                )

    # ------------------------------------------------------------------ #
    def output(self) -> None:
        """Sharded snapshot output: stream shards to per-piece VTI and
        HDF5 hyperslabs; gather only for formats that need it."""
        if self._gather_output or self.ghost_included:
            if self._multiprocess:
                # no process can address the full array under multi-host
                raise NotImplementedError(
                    "[output] gatherOutput/ghostIncluded gather the global "
                    "state on one host — unavailable in a multi-process "
                    "run; use the sharded VTI/HDF5 writers"
                )
            super().output()
            return

        from ..io.sharded import output_hdf5_sharded, output_vtk_pieces

        with self.io_timer:
            if self.output_vtk:
                output_vtk_pieces(
                    self.params, self.U, self.n_step,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
            if self.output_hdf5:
                output_hdf5_sharded(
                    self.params, self.U, self.n_step, total_time=self.t,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
            if self.output_netcdf:
                # the reference's collective PNetCDF role
                # (HydroRunBaseMpi.cpp:6046-6503): shard-streamed global
                # file single-process, piece files + manifest multi-process
                from ..io.sharded import output_netcdf_sharded

                output_netcdf_sharded(
                    self.params, self.U, self.n_step, total_time=self.t,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
            if self.output_zarr:
                # ONE logical store written collectively by every process
                # (the true single-shared-artifact successor of the
                # reference's collective PHDF5/PNetCDF writers)
                from ..io.sharded import output_zarr_sharded

                output_zarr_sharded(
                    self.params, self.U, self.n_step, total_time=self.t,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
        # --- streamed long-tail outputs: PNG / face dumps / online SF all
        # run as SPMD slice-or-reduce programs over the mesh (io/sharded.py,
        # analysis/structure_functions.py) — the global volume is never
        # gathered for them (reference analogue: per-rank movie faces +
        # cross-rank SF reduction, copyFaces.cuh, structureFunctionsMpi.cpp)
        with self.io_timer:
            if self.output_png:
                from ..io.sharded import output_png_sharded

                output_png_sharded(
                    self.params, self.U, self.n_step,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
            if self.output_faces:
                from ..io.sharded import output_faces_sharded

                output_faces_sharded(
                    self.params, self.U, self.n_step,
                    output_dir=self.output_dir, prefix=self.output_prefix,
                )
            if self.sf_enabled:
                from ..analysis.structure_functions import (
                    structure_functions_online_sharded,
                )

                structure_functions_online_sharded(
                    self.params, self.config, self.U, self.n_step
                )
            if (self._forced and self.params.problem
                    == "turbulence-Ornstein-Uhlenbeck"):
                # the OU mode state is replicated: rank-0 host save
                if jax.process_index() == 0:
                    from ..ops.forcing import save_ou_forcing

                    save_ou_forcing(
                        self._fstate,
                        f"{self.output_dir}/{self.output_prefix}"
                        f"_forcing_{self.n_step:07d}.npz",
                    )

        rest = (
            self.output_nrrd or self.output_xsm or self.output_bin
        )
        if rest:
            if self._multiprocess:
                # matches the reference: its MPI run classes only offer
                # VTK pieces / PHDF5 / PNetCDF (HydroRunBaseMpi.cpp) —
                # NRRD/XSM/BIN are serial-only there too
                if not getattr(self, "_warned_gather_formats", False):
                    self._warned_gather_formats = True
                    print(
                        "multi-process run: NRRD/XSM/BIN outputs need the "
                        "host-gather path and are skipped (the reference's "
                        "MPI writers are VTK/HDF5/NetCDF only; use VTI "
                        "pieces / HDF5 pieces / NetCDF pieces)",
                        file=sys.stderr,
                    )
                return
            saved = (self.output_vtk, self.output_hdf5, self.output_png,
                     self.output_netcdf, self.output_faces,
                     self.sf_enabled, self._forced)
            self.output_vtk = self.output_hdf5 = self.output_png = False
            self.output_netcdf = False  # already written sharded above
            self.output_faces = self.sf_enabled = False
            self._forced = False  # OU state already saved above
            try:
                super().output()
            finally:
                (self.output_vtk, self.output_hdf5, self.output_png,
                 self.output_netcdf, self.output_faces,
                 self.sf_enabled, self._forced) = saved

    def perf_summary(self, elapsed: float) -> str:
        """Aggregate + per-device throughput, the reference's MPI report
        (HydroRunGodunovMpi.cpp:3834-3839 prints per-rank then aggregate)."""
        lines = [super().perf_summary(elapsed)]
        n_dev = self.mesh.devices.size
        p = self.params
        n_cells = p.nx * p.ny * (p.nz if p.dim == 3 else 1)
        compute = max(elapsed - self.io_timer.total, 1e-30)
        ups = self.n_step * n_cells / compute
        mz, my, mx = (self.mesh.shape.get(k, 1) for k in ("z", "y", "x"))
        lines.append(
            f"device mesh            : {mx} x {my} x {mz} ({n_dev} devices, "
            "SPMD lockstep)"
        )
        lines.append(
            f"per-device throughput  : {ups / n_dev:.4e} cell updates/s "
            f"({n_cells // n_dev} cells/device)"
        )
        return "\n".join(lines)

    # ------------------------------------------------------------------ #
    def _host_ghosted(self):
        """Gather the sharded interior, re-frame with ghosts, fill physical
        + periodic boundaries on one device (output/history consumers read
        interiors by default but may ask for ghostIncluded)."""
        g = self.params.ghost_width
        if self._multiprocess:
            # the global array is not host-addressable: return a ghosted
            # *global jax array* (pad + fill under SPMD). history/guard
            # consumers only run jnp reductions, which execute as
            # collectives on every process.
            pad = ((0, 0),) + ((g, g),) * self.params.dim
            if self._shear:
                from .shear import make_all_boundaries_shear

                return jax.jit(
                    lambda u, t: make_all_boundaries_shear(
                        self.params, jnp.pad(u, pad), t
                    )
                )(self.U, jnp.asarray(self.t, self.U.dtype))
            return jax.jit(
                lambda u: make_boundaries(self.params, jnp.pad(u, pad))
            )(self.U)
        Ui = np.asarray(jax.device_get(self.U))
        Ug = np.pad(Ui, ((0, 0),) + ((g, g),) * self.params.dim)
        if self._shear:
            from .shear import make_all_boundaries_shear

            return make_all_boundaries_shear(
                self.params, jnp.asarray(Ug), jnp.asarray(self.t, Ug.dtype)
            )
        return self._fill_fn(jnp.asarray(Ug))

    def interior(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.U))
