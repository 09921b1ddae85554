"""ctypes bindings for the native io_core library (native/io_core.cpp).

Falls back to pure-numpy implementations when the .so has not been built,
so the framework works out of the box; `native/build.sh` enables the native
paths (the reference's whole I/O layer is native C++; this is ours).
"""
from __future__ import annotations

import base64 as _b64
import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    candidates = [
        Path(__file__).resolve().parents[2] / "native" / "libramses_io_core.so",
    ]
    env = os.environ.get("RAMSES_IO_CORE")
    if env:
        candidates.append(Path(env))
    for path in candidates:
        if path.is_file():
            lib = ctypes.CDLL(str(path))
            lib.vti_appended_blob.restype = ctypes.c_int64
            lib.base64_encode.restype = ctypes.c_int64
            _LIB = lib
            return lib
    _LIB = False
    return False


def available() -> bool:
    return bool(_load())


def vti_appended_blob(fields: list[np.ndarray]) -> bytes:
    """Size-header + payload assembly of a VTI appended section."""
    arrays = [np.ascontiguousarray(f) for f in fields]
    lib = _load()
    if not lib:
        parts = []
        for a in arrays:
            raw = a.tobytes()
            parts.append(np.uint32(len(raw)).tobytes())
            parts.append(raw)
        return b"".join(parts)

    total = sum(a.nbytes for a in arrays) + 4 * len(arrays)
    out = ctypes.create_string_buffer(total)
    ptrs = (ctypes.c_void_p * len(arrays))(*[a.ctypes.data for a in arrays])
    sizes = (ctypes.c_int64 * len(arrays))(*[a.nbytes for a in arrays])
    n = lib.vti_appended_blob(ptrs, sizes, ctypes.c_int32(len(arrays)), out)
    return out.raw[:n]


def base64_encode(data: bytes) -> bytes:
    lib = _load()
    if not lib:
        return _b64.b64encode(data)
    out = ctypes.create_string_buffer(4 * ((len(data) + 2) // 3))
    n = lib.base64_encode(data, ctypes.c_int64(len(data)), out)
    return out.raw[:n]


def field_minmax(data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-field (axis-0) min/max of a float32 array [n_fields, ...]."""
    a = np.ascontiguousarray(data, dtype=np.float32)
    n_fields = a.shape[0]
    n_cells = int(np.prod(a.shape[1:]))
    lib = _load()
    if not lib:
        flat = a.reshape(n_fields, -1)
        return flat.min(axis=1), flat.max(axis=1)
    mins = np.empty(n_fields, np.float32)
    maxs = np.empty(n_fields, np.float32)
    lib.field_minmax(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_cells),
        ctypes.c_int32(n_fields),
        mins.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        maxs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return mins, maxs


def extract_faces(u: np.ndarray):
    """Six domain faces of a [n_var, nz, ny, nx] float32 cube."""
    a = np.ascontiguousarray(u, dtype=np.float32)
    n_var, nz, ny, nx = a.shape
    lib = _load()
    if not lib:
        return {
            "xmin": a[..., 0].copy(), "xmax": a[..., -1].copy(),
            "ymin": a[:, :, 0, :].copy(), "ymax": a[:, :, -1, :].copy(),
            "zmin": a[:, 0].copy(), "zmax": a[:, -1].copy(),
        }
    fx0 = np.empty((n_var, nz, ny), np.float32)
    fx1 = np.empty((n_var, nz, ny), np.float32)
    fy0 = np.empty((n_var, nz, nx), np.float32)
    fy1 = np.empty((n_var, nz, nx), np.float32)
    fz0 = np.empty((n_var, ny, nx), np.float32)
    fz1 = np.empty((n_var, ny, nx), np.float32)
    fptr = lambda arr: arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.extract_faces(
        fptr(a), ctypes.c_int32(n_var), ctypes.c_int32(nz),
        ctypes.c_int32(ny), ctypes.c_int32(nx),
        fptr(fx0), fptr(fx1), fptr(fy0), fptr(fy1), fptr(fz0), fptr(fz1),
    )
    return {"xmin": fx0, "xmax": fx1, "ymin": fy0, "ymax": fy1,
            "zmin": fz0, "zmax": fz1}
