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


# ---------------------------------------------------------------------------
# EXR bridge (system OpenEXR; covers DWA/PIZ which the pure-python reader in
# data/exr.py does not)
# ---------------------------------------------------------------------------
_EXR_LIB = None


def _load_exr():
    global _EXR_LIB
    if _EXR_LIB is not None:
        return _EXR_LIB if _EXR_LIB != "unavailable" else None
    so = _HERE / "libexrio.so"
    if not so.exists():
        try:
            subprocess.run(["sh", str(_HERE / "build_exr.sh")], check=True,
                           capture_output=True)
        except Exception:
            _EXR_LIB = "unavailable"
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _EXR_LIB = "unavailable"
        return None
    lib.exr_read_size.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    lib.exr_read_rgba.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int, ctypes.c_int]
    lib.exr_write_rgba.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int]
    _EXR_LIB = lib
    return lib


def exr_read_native(path):
    """Read any-compression EXR as (H, W, 4) float32 RGBA, or None if the
    native library is unavailable or the read fails."""
    lib = _load_exr()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.exr_read_size(str(path).encode(), ctypes.byref(w),
                         ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.float32)
    rc = lib.exr_read_rgba(str(path).encode(), _fp(out), w.value, h.value)
    return out if rc == 0 else None


def exr_write_native(path, img, compression=3):
    """Write (H, W[, C]) float via OpenEXR (half RGBA channels).
    compression: 0 none, 2 zips, 3 zip, 4 piz, 9 dwab. Returns bool."""
    lib = _load_exr()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    rc = lib.exr_write_rgba(str(path).encode(), _fp(img), W, H, C,
                            int(compression))
    return rc == 0
