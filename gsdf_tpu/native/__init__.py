"""Native (C++) runtime components, loaded via ctypes.

Build on demand (cached .so); every entry point has a numpy fallback so the
framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_f32 = np.float32
_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libgsdfnative.so")
_SRC = os.path.join(_HERE, "native.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", _SO_PATH, _SRC,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library or None (numpy fallbacks used)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.gsdf_stl_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.gsdf_stl_decode.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gsdf_stl_decode.restype = ctypes.c_int64
        lib.gsdf_weld.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gsdf_weld.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def stl_encode(tris: np.ndarray) -> bytes:
    """(T,3,3) float32 -> STL record bytes (T*50). Native with numpy
    fallback."""
    tris = np.ascontiguousarray(tris, _f32)
    n = tris.shape[0]
    lib = get_lib()
    if lib is None:
        from ..render.stl import _STL_DTYPE, triangle_normals

        rec = np.zeros(n, dtype=_STL_DTYPE)
        rec["normal"] = triangle_normals(tris)
        rec["v1"] = tris[:, 0]
        rec["v2"] = tris[:, 1]
        rec["v3"] = tris[:, 2]
        return rec.tobytes()
    out = np.empty(n * 50, np.uint8)
    lib.gsdf_stl_encode(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out.tobytes()


def stl_decode(records: bytes, count: int) -> np.ndarray:
    lib = get_lib()
    buf = np.frombuffer(records, np.uint8, count=count * 50)
    if lib is None:
        from ..render.stl import _STL_DTYPE

        rec = np.frombuffer(records, dtype=_STL_DTYPE, count=count)
        return np.stack([rec["v1"], rec["v2"], rec["v3"]], axis=1).astype(_f32)
    tris = np.empty((count, 3, 3), _f32)
    lib.gsdf_stl_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        count,
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return tris


def weld(tris: np.ndarray, tol: float = 0.0):
    """Triangle soup -> (verts (V,3), indices (T,3)) indexed mesh.

    tol quantizes coordinates for merging; 0 merges exact duplicates only.
    """
    tris = np.ascontiguousarray(tris, _f32)
    n = tris.shape[0]
    if n == 0:
        return np.empty((0, 3), _f32), np.empty((0, 3), np.int32)
    lib = get_lib()
    if lib is None:
        flat = tris.reshape(-1, 3)
        q = flat if tol <= 0 else np.round(flat / tol) * tol
        uniq, idx = np.unique(
            q.view([("", _f32)] * 3), return_inverse=True
        )
        verts_map: dict = {}
        verts = []
        indices = np.empty(len(flat), np.int32)
        for i, key in enumerate(idx.ravel()):
            if key not in verts_map:
                verts_map[key] = len(verts)
                verts.append(flat[i])
            indices[i] = verts_map[key]
        return np.array(verts, _f32), indices.reshape(-1, 3)
    verts = np.empty((n * 3, 3), _f32)
    idx = np.empty(n * 3, np.int32)
    nv = lib.gsdf_weld(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.c_float(tol),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return verts[:nv].copy(), idx.reshape(-1, 3)
