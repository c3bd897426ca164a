"""ctypes binding for the native BVH point-to-mesh distance library.

The shared library is compiled on first use with g++ into a per-source-hash
cache path (no pybind11 in this image; the C ABI + ctypes keeps the binding
dependency-free). Falls back cleanly if no compiler is available — callers
(data/sampling.MeshDistance) use the scipy path then.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(__file__), "pointmesh.cpp")


def _build_lib() -> str | None:
    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.path.join(tempfile.gettempdir(), "vistracker_native")
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libpointmesh-{digest}.so")
    if os.path.isfile(lib_path):
        return lib_path
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", lib_path + ".tmp", src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(lib_path + ".tmp", lib_path)
        return lib_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"[native] pointmesh build failed ({e}); using scipy fallback")
        return None


def get_lib():
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        path = _build_lib()
        if path is not None:
            lib = ctypes.CDLL(path)
            lib.pmd_build.restype = ctypes.c_void_p
            lib.pmd_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
            lib.pmd_query.restype = None
            lib.pmd_query.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32)]
            lib.pmd_free.restype = None
            lib.pmd_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


class PointMeshBVH:
    """Exact nearest-point-on-mesh queries (native BVH)."""

    def __init__(self, verts: np.ndarray, faces: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native pointmesh library unavailable")
        self._lib = lib
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._faces = np.ascontiguousarray(faces, np.int32)
        self._handle = lib.pmd_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(self._faces))

    def query(self, points: np.ndarray):
        """points (N, 3) -> (dist (N,), closest (N, 3), face (N,))."""
        pts = np.ascontiguousarray(points, np.float32)
        n = len(pts)
        dist = np.empty(n, np.float32)
        closest = np.empty((n, 3), np.float32)
        face = np.empty(n, np.int32)
        self._lib.pmd_query(
            self._handle,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            closest.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            face.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return dist, closest, face

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.pmd_free(self._handle)
            self._handle = None
