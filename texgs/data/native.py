"""ctypes bindings for the native IO library (native/texgs_io.cpp).

Loads libtexgs_io.so if present (building it on first use when a compiler
is available) and exposes drop-in replacements for the pure-Python COLMAP
and PLY parsers; callers fall back to the Python implementations when the
library is unavailable.  The Python parsers remain the behavioral reference
(tests compare both).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libtexgs_io.so")
    if not os.path.exists(so):
        try:
            import sys
            sys.path.insert(0, _NATIVE_DIR)
            from build import build  # type: ignore
            build(verbose=False)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    c_long = ctypes.c_long
    c_char_p = ctypes.c_char_p
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.colmap_points3d_count.restype = c_long
    lib.colmap_points3d_count.argtypes = [c_char_p]
    lib.colmap_read_points3d.restype = c_long
    lib.colmap_read_points3d.argtypes = [c_char_p, dp, u8p, dp, c_long]
    lib.colmap_images_count.restype = c_long
    lib.colmap_images_count.argtypes = [c_char_p]
    lib.colmap_read_images.restype = c_long
    lib.colmap_read_images.argtypes = [c_char_p, i32p, i32p, dp, dp,
                                       np.ctypeslib.ndpointer(
                                           np.uint8, flags="C_CONTIGUOUS"),
                                       c_long]
    lib.colmap_read_cameras.restype = c_long
    lib.colmap_read_cameras.argtypes = [c_char_p, i32p, i32p, i64p, i64p,
                                        dp, c_long]
    lib.ply_read_xyz.restype = c_long
    lib.ply_read_xyz.argtypes = [c_char_p, fp, fp, fp, c_long,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_points3d_binary(path):
    """Native counterpart of texgs.data.colmap.read_points3d_binary."""
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_points3d_count(str(path).encode())
    if n < 0:
        return None
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n,), np.float64)
    got = lib.colmap_read_points3d(str(path).encode(), xyz, rgb, err, n)
    if got != n:
        return None
    return xyz, rgb, err[:, None]


def read_images_binary(path):
    """Native counterpart of texgs.data.colmap.read_images_binary."""
    from texgs.data.colmap import ColmapImage
    lib = _load()
    if lib is None:
        return None
    n = lib.colmap_images_count(str(path).encode())
    if n < 0:
        return None
    ids = np.empty((n,), np.int32)
    cam_ids = np.empty((n,), np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    names = np.zeros((n, 256), np.uint8)
    got = lib.colmap_read_images(str(path).encode(), ids, cam_ids, qvecs,
                                 tvecs, names, n)
    if got != n:
        return None
    out = {}
    for i in range(n):
        name = bytes(names[i]).split(b"\0", 1)[0].decode("utf-8")
        out[int(ids[i])] = ColmapImage(int(ids[i]), qvecs[i].copy(),
                                       tvecs[i].copy(), int(cam_ids[i]), name)
    return out


def read_cameras_binary(path):
    """Native counterpart of texgs.data.colmap.read_cameras_binary."""
    from texgs.data.colmap import CAMERA_MODELS, ColmapCamera
    lib = _load()
    if lib is None:
        return None
    cap = 4096
    ids = np.empty((cap,), np.int32)
    model_ids = np.empty((cap,), np.int32)
    widths = np.empty((cap,), np.int64)
    heights = np.empty((cap,), np.int64)
    params = np.empty((cap, 8), np.float64)
    n = lib.colmap_read_cameras(str(path).encode(), ids, model_ids, widths,
                                heights, params, cap)
    if n < 0:
        return None
    out = {}
    for i in range(n):
        name, n_params = CAMERA_MODELS[int(model_ids[i])]
        out[int(ids[i])] = ColmapCamera(int(ids[i]), name, int(widths[i]),
                                        int(heights[i]),
                                        params[i, :n_params].copy())
    return out


def read_ply_xyz(path):
    """Native fast path for binary f32 PLY clouds; returns
    (points, colors|None, normals|None) or None on unsupported layout."""
    lib = _load()
    if lib is None:
        return None
    # probe size from the python header parse (cheap)
    try:
        with open(path, "rb") as f:
            n = None
            while True:
                line = f.readline().decode("ascii", "ignore").strip()
                if line.startswith("element vertex"):
                    n = int(line.split()[-1])
                if line == "end_header" or not line:
                    break
        if not n:
            return None
    except Exception:
        return None
    xyz = np.empty((n, 3), np.float32)
    colors = np.empty((n, 3), np.float32)
    normals = np.empty((n, 3), np.float32)
    has_rgb = ctypes.c_int(0)
    has_normal = ctypes.c_int(0)
    got = lib.ply_read_xyz(str(path).encode(), xyz, colors, normals, n,
                           ctypes.byref(has_rgb), ctypes.byref(has_normal))
    if got != n:
        return None
    return (xyz, colors if has_rgb.value else None,
            normals if has_normal.value else None)
