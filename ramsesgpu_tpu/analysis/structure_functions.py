"""Velocity structure functions (on-line and off-line).

Re-design of the reference's structure-function machinery
(reference: src/hydro/structureFunctions{,Mpi}.{h,cpp} for the on-line
version; src/analysis/structureFunctions/structureFunctionsMpi*.cpp and
common_sf.h for the off-line tools). Types follow common_sf.h:

  SF_TYPE_V     : delta v
  SF_TYPE_RHO2V : delta(rho^1/2 v)
  SF_TYPE_RHO3V : delta(rho^1/3 v)

For each of ``n_samples`` random reference points, the increment to *every*
cell is computed at once (one broadcasted array op per point — the TPU
replacement of the reference's per-pair loops), decomposed into longitudinal
and transverse parts w.r.t. the separation vector, binned by integer
distance, and accumulated for orders q = 1..max_q. Results are saved as .npz
(the reference used cnpy for the same purpose, structureFunctions.cpp:465-495).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config.configmap import ConfigMap
from ..config.params import RunParams
from ..core.constants import ID, IU, IV, IW

SF_TYPE_NAMES = ("v", "rho2v", "rho3v")


def _fields(params: RunParams, U: np.ndarray):
    """Interior rho and velocity, [3, nz, ny, nx]."""
    g = params.ghost_width
    sl = (slice(g, -g),) * params.dim
    rho = np.asarray(U[ID][sl])
    vel = np.stack([np.asarray(U[c][sl]) / rho for c in (IU, IV, IW)[: params.dim]])
    return rho, vel


def _sf_geometry(dims, max_q: int):
    """(n_bins, ref-index sampler inputs) shared by both SF paths."""
    n_bins = int(np.ceil(max(dims) / 2.0 * np.sqrt(3.0))) + 2
    return n_bins


def _sample_ref_points(dims, n_samples: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.stack([rng.randint(0, d, size=n_samples) for d in dims], axis=1)


def _make_point_accumulator(dims, n_bins: int, max_q: int):
    """Per-reference-point increment accumulation, shared by the host
    path and the sharded SPMD path (identical math and reduction order)."""
    ndim = len(dims)
    dims_j = np.array(dims)

    def accumulate_point(rho_j, vel_j, grids_j, ref, acc_long, acc_tran, counts):
        # separation vector with periodic minimal image
        sep = []
        for d in range(ndim):
            s = grids_j[d] - ref[d]
            n = dims_j[d]
            s = jnp.where(s > n // 2, s - n, s)
            s = jnp.where(s < -(n // 2), s + n, s)
            sep.append(s.astype(jnp.float32))
        dist = jnp.sqrt(sum(s * s for s in sep))
        bins = jnp.clip(jnp.rint(dist).astype(jnp.int32), 0, n_bins - 1)
        inv_dist = jnp.where(dist > 0, 1.0 / jnp.maximum(dist, 1e-30), 0.0)

        def fields_of_type(t):
            if t == 0:
                return vel_j
            if t == 1:
                return vel_j * jnp.sqrt(rho_j)[None]
            return vel_j * jnp.cbrt(rho_j)[None]

        for t in range(3):
            f = fields_of_type(t)
            ref_val = f[(slice(None),) + tuple(ref)]
            delta = f - ref_val.reshape((-1,) + (1,) * ndim)
            # longitudinal component: delta . r_hat  (sep order is z,y,x ->
            # velocity components are x,y(,z): match axes)
            # sep[0] pairs with the last velocity component etc.
            d_long = sum(
                delta[ndim - 1 - d] * sep[d] for d in range(ndim)
            ) * inv_dist
            d2 = sum(delta[c] ** 2 for c in range(delta.shape[0]))
            d_tran = jnp.sqrt(jnp.maximum(d2 - d_long * d_long, 0.0))

            for qi in range(max_q):
                q = qi + 1
                acc_long = acc_long.at[t, qi].add(
                    jnp.zeros(n_bins).at[bins.ravel()].add(
                        (jnp.abs(d_long) ** q).ravel()
                    )
                )
                acc_tran = acc_tran.at[t, qi].add(
                    jnp.zeros(n_bins).at[bins.ravel()].add((d_tran**q).ravel())
                )
        counts = counts + jnp.zeros(n_bins).at[bins.ravel()].add(1.0)
        return acc_long, acc_tran, counts

    return accumulate_point


def _sf_result(counts, acc_long, acc_tran, n_bins, max_q):
    counts = np.asarray(counts)
    safe = np.maximum(counts, 1.0)
    return {
        "distance": np.arange(n_bins, dtype=np.float64),
        "counts": counts,
        "sf_long": np.asarray(acc_long) / safe,
        "sf_tran": np.asarray(acc_tran) / safe,
        "types": np.array(SF_TYPE_NAMES),
        "max_q": np.array([max_q]),
    }


def compute_structure_functions(
    params: RunParams,
    U: np.ndarray,
    n_samples: int = 1000,
    max_q: int = 5,
    seed: int = 0,
):
    """Returns dict with per-type arrays of shape [max_q, n_bins]:
    sf_long, sf_tran (mean |increment|^q) plus counts and bin distances."""
    rho, vel = _fields(params, U)
    dims = rho.shape  # (nz, ny, nx) or (ny, nx)
    n_bins = _sf_geometry(dims, max_q)
    ref_idx = _sample_ref_points(dims, n_samples, seed)

    # cell index grids (for separation vectors, periodic minimal image)
    grids = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")

    rho_j = jnp.asarray(rho)
    vel_j = jnp.asarray(vel)
    grids_j = [jnp.asarray(g_) for g_ in grids]
    point = _make_point_accumulator(dims, n_bins, max_q)

    accumulate_point = jax.jit(
        lambda ref, al, at_, c: point(rho_j, vel_j, grids_j, ref, al, at_, c)
    )

    acc_long = jnp.zeros((3, max_q, n_bins))
    acc_tran = jnp.zeros((3, max_q, n_bins))
    counts = jnp.zeros(n_bins)
    for p in range(n_samples):
        acc_long, acc_tran, counts = accumulate_point(
            jnp.asarray(ref_idx[p]), acc_long, acc_tran, counts
        )

    return _sf_result(counts, acc_long, acc_tran, n_bins, max_q)


def compute_structure_functions_sharded(
    params: RunParams,
    U_interior,
    n_samples: int = 1000,
    max_q: int = 5,
    seed: int = 0,
):
    """Structure functions directly on the *sharded interior-only* global
    state — no host gather, ever.

    The per-point increment math runs as one SPMD program over the device
    mesh: the reference-point value is a cross-shard gather, the binned
    accumulations reduce with scatter-adds that XLA completes with a
    psum-style cross-device reduction into the replicated accumulators
    (the successor of the reference's cross-rank SF reduction,
    structureFunctionsMpi.cpp).  Multi-process safe: every process gets
    the replicated result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dims = U_interior.shape[1:]
    ndim = len(dims)
    n_bins = _sf_geometry(dims, max_q)
    ref_idx = _sample_ref_points(dims, n_samples, seed)
    point = _make_point_accumulator(dims, n_bins, max_q)

    out_shardings = None
    if isinstance(U_interior.sharding, NamedSharding):
        rep = NamedSharding(U_interior.sharding.mesh, P())
        out_shardings = (rep, rep, rep)

    comps = (IU, IV, IW)[:ndim]

    @partial(jax.jit, out_shardings=out_shardings)
    def run(U, refs):
        rho_j = U[ID]
        vel_j = jnp.stack([U[c] / rho_j for c in comps])
        grids_j = [
            jax.lax.broadcasted_iota(jnp.int32, tuple(dims), d)
            for d in range(ndim)
        ]

        def body(p, carry):
            return point(rho_j, vel_j, grids_j, refs[p], *carry)

        init = (
            jnp.zeros((3, max_q, n_bins)),
            jnp.zeros((3, max_q, n_bins)),
            jnp.zeros(n_bins),
        )
        return jax.lax.fori_loop(0, n_samples, body, init)

    acc_long, acc_tran, counts = run(U_interior, jnp.asarray(ref_idx))
    return _sf_result(counts, acc_long, acc_tran, n_bins, max_q)


def structure_functions_online_sharded(
    params: RunParams,
    config: ConfigMap,
    U_interior,
    n_step: int,
) -> str:
    """On-line hook for distributed runs: SPMD accumulation, rank-0 write."""
    import jax as _jax

    n_samples = config.get_integer("structureFunctions", "nSampleTotal", 1000)
    max_q = config.get_integer("structureFunctions", "max_q", 5)
    output_dir = config.get_string("output", "outputDir", "./")
    prefix = config.get_string("output", "outputPrefix", "output")
    result = compute_structure_functions_sharded(
        params, U_interior, n_samples, max_q)
    path = f"{output_dir}/{prefix}_sf_{n_step:07d}.npz"
    if _jax.process_index() == 0:
        np.savez(path, **result)
    return path


def structure_functions_online(
    params: RunParams,
    config: ConfigMap,
    U: np.ndarray,
    n_step: int,
) -> str:
    """On-line hook: compute and dump SF to npz with the reference's naming
    (structureFunctions.cpp:465-495)."""
    n_samples = config.get_integer("structureFunctions", "nSampleTotal", 1000)
    max_q = config.get_integer("structureFunctions", "max_q", 5)
    output_dir = config.get_string("output", "outputDir", "./")
    prefix = config.get_string("output", "outputPrefix", "output")
    result = compute_structure_functions(params, U, n_samples, max_q)
    path = f"{output_dir}/{prefix}_sf_{n_step:07d}.npz"
    np.savez(path, **result)
    return path


def main(argv=None) -> int:
    """Off-line CLI over saved HDF5 snapshots (the successor of
    computeStructureFunctionsMpi)."""
    import argparse

    from ..config.params import params_from_config
    from ..io.hdf5 import input_hdf5

    parser = argparse.ArgumentParser(description="structure functions from snapshots")
    parser.add_argument("--param", required=True, help="INI file of the run")
    parser.add_argument("files", nargs="+", help="HDF5 snapshot files")
    parser.add_argument("--nsamples", type=int, default=1000)
    parser.add_argument("--maxq", type=int, default=5)
    parser.add_argument("--out", default="sf.npz")
    args = parser.parse_args(argv)

    config = ConfigMap(args.param)
    params = params_from_config(config)
    results = []
    for fname in args.files:
        U, t, step = input_hdf5(params, fname)
        results.append(
            compute_structure_functions(params, U, args.nsamples, args.maxq)
        )
    # average over snapshots
    merged = {k: results[0][k] for k in ("distance", "types", "max_q")}
    for key in ("counts", "sf_long", "sf_tran"):
        merged[key] = np.mean([r[key] for r in results], axis=0)
    np.savez(args.out, **merged)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
