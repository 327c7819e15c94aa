"""ctypes bindings for the native runtime library (csrc/tpt_native.cpp).

Compiled on demand with g++ (no pybind11 in the image; plain C ABI +
ctypes per the environment constraints). Every entry point has a pure
Python/numpy fallback, so the framework works without a toolchain --
the native path is the fast one, mirroring the reference's C++ host
runtime (mesh.cu / bvh.cu host roles).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "tpt_native.cpp")
_OUT_DIR = os.path.join(os.path.dirname(_SRC), "_build")


def _compile() -> str:
    os.makedirs(_OUT_DIR, exist_ok=True)
    so = os.path.join(_OUT_DIR, "libtpt_native.so")
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(_SRC)):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", so, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = ctypes.CDLL(_compile())
            lib.tpt_b64_decode.restype = ctypes.c_longlong
            lib.tpt_b64_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_ubyte)]
            lib.tpt_build_lbvh.restype = ctypes.c_int
            lib.tpt_build_lbvh.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def b64_decode(payload: str) -> bytes:
    """base64 decode via the native lib, falling back to stdlib."""
    lib = get_lib()
    if lib is None:
        import base64

        return base64.b64decode(payload)
    raw = payload.encode("ascii")
    out = np.empty(len(raw) * 3 // 4 + 3, dtype=np.uint8)
    n = lib.tpt_b64_decode(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if n < 0:
        raise ValueError("invalid base64 payload")
    return out[:n].tobytes()


def build_lbvh_host(tri_verts: np.ndarray):
    """Host-side LBVH build (same topology rules as ops/lbvh.build_lbvh).

    tri_verts: [F, 3, 3] float32 numpy. Returns dict of numpy arrays
    (left, right, parent, leaf_fid, bmin, bmax) in the device layout,
    or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    tv = np.ascontiguousarray(tri_verts, dtype=np.float32)
    f = tv.shape[0]
    n_nodes = 2 * f - 1
    n_int = max(f - 1, 1)
    left = np.empty(n_int, np.int32)
    right = np.empty(n_int, np.int32)
    parent = np.empty(n_nodes, np.int32)
    leaf_fid = np.empty(f, np.int32)
    bmin = np.empty((n_nodes, 3), np.float32)
    bmax = np.empty((n_nodes, 3), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.tpt_build_lbvh(
        tv.ctypes.data_as(fp), f,
        left.ctypes.data_as(ip), right.ctypes.data_as(ip),
        parent.ctypes.data_as(ip), leaf_fid.ctypes.data_as(ip),
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp))
    if rc != 0:
        raise RuntimeError(f"tpt_build_lbvh failed: {rc}")
    return dict(left=left, right=right, parent=parent, leaf_fid=leaf_fid,
                bmin=bmin, bmax=bmax)
