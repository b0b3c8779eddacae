"""ctypes bindings for the C++ host BVH (tropical/csrc/bvh.cpp).

Same query API as :class:`tropical.ops.mesh_queries.MeshQuery` (the TPU path).
The library is compiled on demand with the in-repo Makefile; import fails
gracefully when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libtropical.so")
_lib = None


def _stale() -> bool:
    """True when the .so is absent or older than any C++ source — a stale
    binary must never shadow an edited bvh.cpp."""
    if not os.path.isfile(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for name in os.listdir(_CSRC):
        if name.endswith((".cpp", ".h", ".hpp")) and \
                os.path.getmtime(os.path.join(_CSRC, name)) > lib_mtime:
            return True
    return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if _stale():
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, text=True)
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int]
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_unsigned_distance.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]
    lib.bvh_signed_distance.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]
    lib.bvh_ray_trace.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int,
                                  f32p, i32p, f32p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


class HostBVH:
    """CPU BVH with the cuBVH-style query API (build once, query many)."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        lib = _load()
        self._lib = lib
        self.vertices = np.ascontiguousarray(vertices, np.float32)
        self.faces = np.ascontiguousarray(faces, np.int32)
        self._h = lib.bvh_build(_fp(self.vertices), len(self.vertices),
                                _ip(self.faces), len(self.faces))

    def __del__(self):
        try:
            self._lib.bvh_free(self._h)
        except Exception:
            pass

    def unsigned_distance(self, points: np.ndarray) -> np.ndarray:
        p = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(p), np.float32)
        self._lib.bvh_unsigned_distance(self._h, _fp(p), len(p), _fp(out))
        return out

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        p = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(p), np.float32)
        self._lib.bvh_signed_distance(self._h, _fp(p), len(p), _fp(out))
        return out

    def ray_trace(self, rays_o: np.ndarray, rays_d: np.ndarray):
        o = np.ascontiguousarray(rays_o, np.float32)
        d = np.ascontiguousarray(rays_d, np.float32)
        n = len(o)
        pos = np.empty((n, 3), np.float32)
        fid = np.empty(n, np.int32)
        t = np.empty(n, np.float32)
        self._lib.bvh_ray_trace(self._h, _fp(o), _fp(d), n, _fp(pos),
                                _ip(fid), _fp(t))
        return pos, fid, t
