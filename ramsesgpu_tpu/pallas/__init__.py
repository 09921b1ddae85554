"""Fused TPU Pallas kernels (the CUDA kernel zoo's successor).

``INTERPRET``: set True (e.g. in CPU tests) to build every kernel in
interpret mode — lets the sharded/overlapped compositions that construct
kernels internally run on the virtual CPU mesh. Builders read it at build
time, so set it before constructing step functions.
"""

INTERPRET = False
