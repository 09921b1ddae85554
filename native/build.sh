#!/bin/sh
# Build the native io_core library used by ramsesgpu_tpu.io.native (ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    io_core.cpp -o libramses_io_core.so
echo "built $(pwd)/libramses_io_core.so"
