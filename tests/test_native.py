"""Native io_core (C++ via ctypes) — bindings and fallback equivalence."""
import base64
import struct

import numpy as np
import pytest

from ramsesgpu_tpu.io import native


def test_vti_blob_layout():
    fields = [np.arange(12, dtype=np.float32).reshape(3, 4),
              np.ones((2, 2), np.float32)]
    blob = native.vti_appended_blob(fields)
    assert struct.unpack("<I", blob[:4])[0] == 48
    assert np.frombuffer(blob[4:52], np.float32).tolist() == list(range(12))
    assert struct.unpack("<I", blob[52:56])[0] == 16


@pytest.mark.parametrize("payload", [b"", b"a", b"ab", b"abc", b"hello world!"])
def test_base64_matches_stdlib(payload):
    assert native.base64_encode(payload) == base64.b64encode(payload)


def test_field_minmax():
    a = np.random.RandomState(0).rand(4, 7, 9).astype(np.float32)
    mins, maxs = native.field_minmax(a)
    np.testing.assert_allclose(mins, a.reshape(4, -1).min(1))
    np.testing.assert_allclose(maxs, a.reshape(4, -1).max(1))


def test_extract_faces():
    u = np.random.RandomState(1).rand(2, 4, 5, 6).astype(np.float32)
    f = native.extract_faces(u)
    np.testing.assert_array_equal(f["xmin"], u[..., 0])
    np.testing.assert_array_equal(f["xmax"], u[..., -1])
    np.testing.assert_array_equal(f["ymin"], u[:, :, 0, :])
    np.testing.assert_array_equal(f["ymax"], u[:, :, -1, :])
    np.testing.assert_array_equal(f["zmin"], u[:, 0])
    np.testing.assert_array_equal(f["zmax"], u[:, -1])
