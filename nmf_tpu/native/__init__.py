"""ctypes bindings for the native host data path (numpy fallback).

The C++ library is built on first import if a compiler is available; every
entry point falls back to the equivalent numpy code when it is not, so the
framework never hard-depends on the toolchain.
"""
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _HERE / "libraystore.so"
    if not so.exists():
        try:
            subprocess.run(["sh", str(_HERE / "build.sh")], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.generate_rays.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.gather_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def generate_rays(poses, dirs):
    """poses: (P, 3/4, 4) c2w; dirs: (HW, 3). Returns (P*HW, 6) float32."""
    poses = np.ascontiguousarray(
        np.asarray(poses, np.float32)[:, :3, :4]).reshape(-1, 12)
    dirs = np.ascontiguousarray(np.asarray(dirs, np.float32)).reshape(-1, 3)
    P, HW = poses.shape[0], dirs.shape[0]
    lib = _load()
    if lib is None:
        rd = dirs @ np.swapaxes(
            poses.reshape(P, 3, 4)[:, :, :3], 1, 2).reshape(P, 3, 3
                                                            ).transpose(0, 2, 1)
        # fallback: plain numpy
        out = np.empty((P, HW, 6), np.float32)
        for p in range(P):
            M = poses[p].reshape(3, 4)
            out[p, :, 0:3] = M[:, 3]
            out[p, :, 3:6] = dirs @ M[:, :3].T
        return out.reshape(-1, 6)
    out = np.empty((P * HW, 6), np.float32)
    lib.generate_rays(_fp(poses), P, _fp(dirs), HW, _fp(out))
    return out


def gather_batch(rays, rgbs, ids):
    """Parallel gather of rows ids from rays (N,6) / rgbs (N,C)."""
    lib = _load()
    ids = np.ascontiguousarray(ids, np.int64)
    if lib is None:
        return (np.ascontiguousarray(rays[ids]),
                np.ascontiguousarray(rgbs[ids]))
    rays = np.ascontiguousarray(rays, np.float32)
    rgbs = np.ascontiguousarray(rgbs, np.float32)
    n = ids.shape[0]
    C = rgbs.shape[1]
    out_rays = np.empty((n, 6), np.float32)
    out_rgbs = np.empty((n, C), np.float32)
    lib.gather_batch(_fp(rays), _fp(rgbs), C,
                     ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
                     _fp(out_rays), _fp(out_rgbs))
    return out_rays, out_rgbs
