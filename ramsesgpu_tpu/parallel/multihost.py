"""Multi-process (multi-host) execution support.

Successor of the reference's GlobalMpiSession / MPI bootstrap
(reference: src/utils/mpiUtils/GlobalMpiSession.h:65-134,
src/hydro/HydroMpiParameters.cpp:76-79): where the reference spawns one
MPI rank per GPU, a JAX multi-host run launches one controller process
per host, connects them through ``jax.distributed.initialize``, and the
very same SPMD program (parallel/sharded_step.py) runs over the global
device set — collectives ride ICI/DCN via XLA, no rank-level
pack/unpack code exists anywhere.

Activation is env-gated (no behavior change for single-process runs):

    RAMSES_COORDINATOR=host:port   RAMSES_NUM_PROCESSES=N
    RAMSES_PROCESS_ID=k            [RAMSES_LOCAL_DEVICE_IDS=0,1,...]

(or the standard JAX spellings JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID).  On TPU pods, where the runtime
can discover the topology itself, set only RAMSES_MULTIHOST=auto to
call ``jax.distributed.initialize()`` with no arguments.
"""
from __future__ import annotations

import os

import jax

_ENV_PAIRS = (
    ("RAMSES_COORDINATOR", "RAMSES_NUM_PROCESSES", "RAMSES_PROCESS_ID"),
    ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"),
)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Connect this process to the JAX cluster if the env asks for it.

    Idempotent; returns True when running multi-process after the call.
    """
    global _initialized
    if _initialized:
        return True
    # NOTE: do not query jax.process_count() here — it would initialize
    # the XLA backend, after which jax.distributed.initialize refuses to
    # run. Decide from the environment alone.

    if os.environ.get("RAMSES_MULTIHOST", "").lower() == "auto":
        jax.distributed.initialize()
        _initialized = True
        return True

    for coord_key, n_key, id_key in _ENV_PAIRS:
        coord = os.environ.get(coord_key)
        if not coord:
            continue
        num = int(os.environ[n_key])
        pid = int(os.environ[id_key])
        kwargs = {}
        local_ids = os.environ.get("RAMSES_LOCAL_DEVICE_IDS")
        if local_ids:
            kwargs["local_device_ids"] = [
                int(v) for v in local_ids.split(",") if v
            ]
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=num,
            process_id=pid,
            **kwargs,
        )
        _initialized = True
        return True
    return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1
