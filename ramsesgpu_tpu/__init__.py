"""ramsesgpu_tpu — a TPU-native finite-volume hydrodynamics / MHD framework.

Re-creation of the capabilities of RamsesGPU (pkestene/ramsesGPU: 2D/3D
compressible Euler + ideal/resistive MHD, MUSCL-Hancock Godunov schemes,
constrained transport, shearing box, turbulence forcing, full simulation
toolchain) designed TPU-first on JAX/XLA/Pallas: whole-array numerics fused
by XLA, Pallas stencil kernels on the hot path, and SPMD domain decomposition
via shard_map + collective permutes instead of MPI.
"""

__version__ = "0.1.0"

from .config.configmap import ConfigMap
from .config.params import RunParams, params_from_config

__all__ = ["ConfigMap", "RunParams", "params_from_config", "__version__"]
