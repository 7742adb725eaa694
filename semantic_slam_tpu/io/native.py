"""ctypes bridge to the C++ native runtime (libsemslam_native.so).

The reference implements all host-side I/O in C++ (text map parsers in
``src/Utility.cpp``, exporters in ``src/ORB_SLAM2/System.cc``); this framework
keeps the same native footprint for the hot host paths via a small C ABI:

  ssn_parse_bundle(path) -> counts + packed arrays (two-pass text parser)
  ssn_write_ply(...)     -> binary PLY point-cloud writer (viewer/TSDF export)

Build with ``make -C native`` (see native/Makefile). Python falls back to the
NumPy implementations in mapio.py when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libsemslam_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(_lib_path())
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.ssn_bundle_open.argtypes = [ctypes.c_char_p]
    lib.ssn_bundle_open.restype = ctypes.c_void_p
    lib.ssn_bundle_counts.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int64)]
    lib.ssn_bundle_fill.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # R [K,3,3]
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # t [K,3]
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # xyz [P,3]
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),    # obs_off [P+1]
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),    # obs_kf [M]
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),    # obs_kp [M]
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # obs_uv [M,2]
    ]
    lib.ssn_bundle_close.argtypes = [ctypes.c_void_p]
    lib.ssn_write_ply.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.ssn_write_ply.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def parse_bundle(path: str):
    """Parse bundle.txt natively. Returns (R, t, xyz, obs_kf, obs_kp, obs_uv)
    in the list-per-point layout mapio expects, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    h = lib.ssn_bundle_open(path.encode())
    if not h:
        return None
    try:
        counts = (ctypes.c_int64 * 3)()
        lib.ssn_bundle_counts(h, counts)
        k, p, m = counts[0], counts[1], counts[2]
        R = np.empty((k, 3, 3), np.float32)
        t = np.empty((k, 3), np.float32)
        xyz = np.empty((p, 3), np.float32)
        obs_off = np.empty((p + 1,), np.int32)
        obs_kf = np.empty((m,), np.int32)
        obs_kp = np.empty((m,), np.int32)
        obs_uv = np.empty((m, 2), np.float32)
        lib.ssn_bundle_fill(h, R, t, xyz, obs_off, obs_kf, obs_kp, obs_uv)
    finally:
        lib.ssn_bundle_close(h)
    okf = [obs_kf[obs_off[j]:obs_off[j + 1]] for j in range(p)]
    okp = [obs_kp[obs_off[j]:obs_off[j + 1]] for j in range(p)]
    ouv = [obs_uv[obs_off[j]:obs_off[j + 1]] for j in range(p)]
    return R, t, xyz, okf, okp, ouv


def write_ply(path: str, xyz: np.ndarray, rgb: Optional[np.ndarray] = None) -> bool:
    """Binary PLY writer (native if available, else NumPy)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    if rgb is None:
        rgb = np.full((len(xyz), 3), 200, np.uint8)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    lib = _load()
    if lib is not None:
        return lib.ssn_write_ply(path.encode(), xyz, rgb, len(xyz)) == 0
    header = (b"ply\nformat binary_little_endian 1.0\n"
              + f"element vertex {len(xyz)}\n".encode()
              + b"property float x\nproperty float y\nproperty float z\n"
              + b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
              + b"end_header\n")
    rec = np.zeros(len(xyz), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
    rec["xyz"] = xyz
    rec["rgb"] = rgb
    with open(path, "wb") as f:
        f.write(header)
        f.write(rec.tobytes())
    return True
