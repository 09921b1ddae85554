"""Command-line entry point.

Equivalent of the reference's ``euler_main.cpp`` (reference:
src/euler_main.cpp:76-195): parse CLI, read the INI parameter file, build the
run object, and start the time integration. One binary covers what the
reference splits into euler_main / euler_mpi_main / euler_zslab_main — the
device count and mesh shape select the distribution strategy.
"""
from __future__ import annotations

import argparse
import sys

from ..config.configmap import ConfigMap
from ..config.params import params_from_config


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ramses-tpu",
        description="TPU-native finite-volume hydro/MHD solver "
        "(capabilities of RamsesGPU).",
    )
    parser.add_argument("--param", "-i", required=True, help="INI parameter file")
    parser.add_argument(
        "--scheme",
        default=None,
        choices=["godunov", "godunov-split", "kurganov", "laxliu", "relaxingTVD"],
        help="numerical scheme (same switch as the reference's euler_main)",
    )
    parser.add_argument(
        "--dump-param-file",
        action="store_true",
        help="print the effective parameter file and exit",
    )
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--no-output", action="store_true")
    parser.add_argument(
        "--profile",
        action="store_true",
        help="print a per-phase step profile and exit "
        "(the reference's DO_TIMING breakdown)",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    # `env JAX_PLATFORMS=cpu ramses-tpu ...` must actually run on CPU even
    # though this box's TPU plugin re-selects its backend at import time
    # (see utils/platform.py) — otherwise a wedged device tunnel hangs the
    # CLI forever instead of falling back.
    from ..utils.platform import honor_platform_env

    honor_platform_env()

    # multi-host: connect to the JAX cluster when the env asks for it
    # (RAMSES_COORDINATOR/..., parallel/multihost.py) — the euler_mpi_main
    # GlobalMpiSession bootstrap equivalent
    from ..parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()

    config = ConfigMap(args.param)
    if args.dump_param_file:
        print(config.dump())
        return 0

    params = params_from_config(config)

    if args.profile:
        from ..parallel.mesh import topology_from_config as _topo

        print(f"problem        : {params.problem}")
        print(f"mesh           : {params.nx} x {params.ny} x {params.nz}")
        if _topo(config) != (1, 1, 1):
            import math

            from ..utils.profile import (
                format_profile_distributed,
                profile_step_distributed,
            )

            n_dev = math.prod(_topo(config))
            print(
                format_profile_distributed(
                    profile_step_distributed(params, config), n_dev
                )
            )
        else:
            from ..utils.profile import format_profile, profile_step

            print(format_profile(profile_step(params, config)))
        return 0

    scheme = args.scheme or "godunov"
    if scheme == "godunov" and not config.get_bool("hydro", "unsplit", True):
        scheme = "godunov-split"  # [hydro] unsplit=no (HydroRunGodunov.cpp:70)
    from ..parallel.mesh import topology_from_config

    topo = topology_from_config(config)
    if scheme != "godunov":
        if topo != (1, 1, 1):
            raise SystemExit("--scheme alternatives run single-device only")
        from ..solvers.run2d_alt import AltSchemeRun

        run = AltSchemeRun(config, scheme=scheme)
    elif topo != (1, 1, 1):
        # [mpi] mx/my/mz set: shard over the device mesh (the reference's
        # euler_mpi_main path)
        from ..solvers.run_distributed import DistributedRun

        run = DistributedRun(config, params)
        print(f"device mesh    : {topo[0]} x {topo[1]} x {topo[2]}")
    else:
        from ..solvers.run import Run

        run = Run(config, params)

    print(f"problem        : {params.problem}")
    print(f"mesh           : {params.nx} x {params.ny} x {params.nz} (dim {params.dim})")
    print(f"mhd            : {params.mhd}")
    print(f"riemann solver : {params.riemann_solver.name}")
    run.start(max_steps=args.max_steps, do_output=not args.no_output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
