"""Analytic device-memory planner.

Successor of the reference's memory_footprint.py:10-21 (GPU-RAM sizing
formulas for full vs z-slab MHD runs), adapted to this framework's actual
allocation behavior: the whole-array XLA path materializes the trace/edge
state pipeline; z-slab bounds the scratch to O(nz/zSlabNb); the fused
Pallas path needs only the state + one window per core.
"""
from __future__ import annotations

from ..config.params import RunParams


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def state_bytes(params: RunParams, padded: bool = True) -> int:
    """One conserved-state array, including ghosts (and the XLA lane padding
    that a [.., x] layout incurs on TPU when padded=True)."""
    bpe = 8 if params.dtype == "float64" else 4
    x = _round_up(params.isize, 128) if padded else params.isize
    y = _round_up(params.jsize, 8) if padded else params.jsize
    z = params.ksize
    return params.nb_var * z * y * x * bpe


def estimate(params: RunParams) -> dict[str, float]:
    """Bytes per component and totals, in GiB."""
    s = state_bytes(params)
    gib = 1024**3

    # whole-array pipeline live intermediates (qm/qp x3, qedge x12 in 3D,
    # fluxes x3, EMFs x3, Q + slopes): empirically ~2x the naive sum thanks
    # to XLA fusion; report the naive upper bound and the z-slab bound.
    n_intermediate = 24 if params.dim == 3 else 12
    slabs = max(params.z_slab_nb, 1)

    full_pipeline = n_intermediate * s
    zslab_pipeline = n_intermediate * s / slabs + 2 * s

    pallas_path = 3 * s  # U, U_new, boundary-filled copy; windows live in VMEM

    # packed-form advance (make_pallas_advance_n(packed_form=True)): only
    # the kernel's packed layout [nvar(,x2 comp), nz+2g, ny+16, nx] lives in
    # HBM, double-buffered across the while-loop launches (buffers donated;
    # the ghosted lane-padded external state never coexists with the loop)
    bpe = 8 if params.dtype == "float64" else 4
    nv = params.nb_var * (2 if getattr(params, "compensated", False) else 1)
    if params.dim == 3:
        packed = (
            nv * (params.nz + 2 * params.ghost_width)
            * _round_up(params.ny + 16, 8) * params.nx * bpe
        )
    else:
        packed = s
    return {
        "state_GiB": s / gib,
        "whole_array_pipeline_GiB": (2 * s + full_pipeline) / gib,
        "zslab_pipeline_GiB": zslab_pipeline / gib,
        "pallas_path_GiB": pallas_path / gib,
        "pallas_packed_form_GiB": 2 * packed / gib,
    }


def estimate_sharded(
    params: RunParams, topo: tuple[int, int, int]
) -> dict[str, float]:
    """Per-shard footprint under an (mx, my, mz) domain decomposition,
    with and without z-slab pipelining — predicts the saving of composing
    zSlabNb with the sharded step (the reference's Zslab+Mpi quartet,
    MHDRunGodunovZslabMpi.cpp)."""
    mx, my, mz = topo
    local = params.replace(
        nx=params.nx // mx,
        ny=params.ny // my,
        nz=params.nz // mz if params.dim == 3 else params.nz,
    )
    est = estimate(local)
    return {f"per_shard_{k}": v for k, v in est.items()}


def main(argv=None) -> int:
    import argparse

    from ..config.configmap import ConfigMap
    from ..config.params import params_from_config

    parser = argparse.ArgumentParser(description="device memory planner")
    parser.add_argument("--param", help="INI file", default=None)
    parser.add_argument("--nx", type=int, default=256)
    parser.add_argument("--ny", type=int, default=256)
    parser.add_argument("--nz", type=int, default=256)
    parser.add_argument("--mhd", action="store_true")
    parser.add_argument("--zslabs", type=int, default=0)
    args = parser.parse_args(argv)

    if args.param:
        params = params_from_config(ConfigMap(args.param))
    else:
        config = ConfigMap(text=f"""
[mesh]
nx={args.nx}
ny={args.ny}
nz={args.nz}
[MHD]
enable={'true' if args.mhd else 'false'}
[implementation]
zSlabNb={args.zslabs}
""")
        params = params_from_config(config)

    for key, value in estimate(params).items():
        print(f"{key:32s}: {value:8.3f}")
    if args.param:
        from ..parallel.mesh import topology_from_config

        topo = topology_from_config(ConfigMap(args.param))
        if topo != (1, 1, 1):
            print(f"[mpi] topology {topo[0]}x{topo[1]}x{topo[2]}:")
            for key, value in estimate_sharded(params, topo).items():
                print(f"{key:32s}: {value:8.3f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
