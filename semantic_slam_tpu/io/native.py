"""ctypes bridge to the C++ native runtime (libsemslam_native.so).

The reference implements all host-side I/O in C++ (text map parsers in
``src/Utility.cpp``, exporters in ``src/ORB_SLAM2/System.cc``); this framework
keeps the same native footprint for the hot host paths via a small C ABI:

  ssn_parse_bundle(path) -> counts + packed arrays (two-pass text parser)
  ssn_write_ply(...)     -> binary PLY point-cloud writer (viewer/TSDF export)
  ssn_image_*            -> PNG/JPEG/PNM decode (libpng/libjpeg; the
                            reference decodes via cv::imread,
                            examples/rgbd_tum.cpp:79-80)
  ssn_write_png          -> 8/16-bit PNG encode (debug dumps; reference
                            cv::imwrite, src/MaskRCNN.cpp:646)
  ssn_loader_*           -> threaded prefetch frame loader (decode workers
                            run ahead of the consumer through a slot ring;
                            replaces the reference's synchronous per-frame
                            imread loop, examples/rgbd_tum.cpp:76-118)

Build with ``make -C native`` (see native/Makefile). Python falls back to the
NumPy/PIL implementations when the library is absent.
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
    lib.ssn_image_open.argtypes = [ctypes.c_char_p]
    lib.ssn_image_open.restype = ctypes.c_void_p
    lib.ssn_image_info.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64)]
    lib.ssn_image_fill.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ssn_image_close.argtypes = [ctypes.c_void_p]
    lib.ssn_write_png.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int]
    lib.ssn_write_png.restype = ctypes.c_int
    lib.ssn_loader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.ssn_loader_open.restype = ctypes.c_void_p
    lib.ssn_loader_len.argtypes = [ctypes.c_void_p]
    lib.ssn_loader_len.restype = ctypes.c_int64
    lib.ssn_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.ssn_loader_next.restype = ctypes.c_int
    lib.ssn_loader_close.argtypes = [ctypes.c_void_p]
    lib.ssn_velodyne_range_image.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # Tr [3,4]
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # K fx,fy,cx,cy
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),  # out [H*W]
    ]
    lib.ssn_velodyne_range_image.restype = ctypes.c_int64
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


# ---------------------------------------------------------------------------
# Image codec (PNG / JPEG / PNM)
# ---------------------------------------------------------------------------

def imread(path: str) -> Optional[np.ndarray]:
    """Decode an image natively. Returns uint8 [H,W] / [H,W,3] or uint16
    [H,W] (16-bit grayscale PNGs — TUM depth maps), or None when the native
    library is absent or the file can't be decoded."""
    lib = _load()
    if lib is None:
        return None
    h = lib.ssn_image_open(path.encode())
    if not h:
        return None
    try:
        info = (ctypes.c_int64 * 4)()
        lib.ssn_image_info(h, info)
        rows, cols, c, depth = info[0], info[1], info[2], info[3]
        dtype = np.uint16 if depth == 16 else np.uint8
        shape = (rows, cols) if c == 1 else (rows, cols, c)
        out = np.empty(shape, dtype)
        lib.ssn_image_fill(h, out.ctypes.data_as(ctypes.c_void_p))
    finally:
        lib.ssn_image_close(h)
    return out


def write_png(path: str, img: np.ndarray) -> bool:
    """Encode uint8 gray/RGB or uint16 gray as PNG. Falls back to PIL."""
    img = np.ascontiguousarray(img)
    if img.dtype == np.uint16:
        depth, c = 16, 1
        if img.ndim != 2:
            raise ValueError("16-bit PNG must be single-channel")
    else:
        img = img.astype(np.uint8, copy=False)
        depth = 8
        c = 1 if img.ndim == 2 else img.shape[2]
    lib = _load()
    if lib is not None:
        return lib.ssn_write_png(path.encode(),
                                 img.ctypes.data_as(ctypes.c_void_p),
                                 img.shape[0], img.shape[1], c, depth) == 0
    from PIL import Image
    Image.fromarray(img).save(path)
    return True


def velodyne_range_image(path: str, Tr_velo_to_cam: np.ndarray,
                         K: np.ndarray, width: int, height: int,
                         min_z: float = 0.5) -> Optional[np.ndarray]:
    """Native KITTI .bin -> z-buffered camera range image (reference
    ``src/Utility.cpp:374-419,452-496`` semantics). None when the native
    library is absent or the scan can't be read — callers fall back to
    ``io.datasets.velodyne_to_range_image``."""
    lib = _load()
    if lib is None:
        return None
    Tr = np.ascontiguousarray(np.asarray(Tr_velo_to_cam,
                                         np.float32)[:3, :4])
    k4 = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float32)
    out = np.zeros((height, width), np.float32)
    n = lib.ssn_velodyne_range_image(path.encode(), Tr, k4, width, height,
                                     min_z, out.reshape(-1))
    return out if n >= 0 else None


# ---------------------------------------------------------------------------
# Threaded prefetch frame loader
# ---------------------------------------------------------------------------

#: Per-stream pixel conversion modes (see native/src/loader.cpp).
MODE_RGB_U8 = 0     # [H,W,3] uint8
MODE_GRAY_U8 = 1    # [H,W] uint8 (BT.601 luma)
MODE_SCALED_F32 = 2  # [H,W] float32 = raw * scale (16-bit depth PNGs)
MODE_GRAY_F32 = 3   # [H,W] float32 luma

_MODE_SPEC = {
    MODE_RGB_U8: (np.uint8, 3),
    MODE_GRAY_U8: (np.uint8, 1),
    MODE_SCALED_F32: (np.float32, 1),
    MODE_GRAY_F32: (np.float32, 1),
}


class FrameLoader:
    """In-order prefetching loader over one or two aligned image streams.

    Decode workers (libpng/libjpeg) run `prefetch` frames ahead of the
    consumer; ``next()`` blocks only when the pipeline hasn't caught up.
    This is the framework's host I/O pipeline component (SURVEY §2.3):
    deterministic queues instead of the reference's synchronous
    imread-in-the-tracking-loop (examples/rgbd_tum.cpp:76-118).

    Raises RuntimeError from the constructor when the native library is
    unavailable — callers (io.datasets) fall back to PIL paths.
    """

    def __init__(self, paths_a, paths_b=None, mode_a=MODE_RGB_U8,
                 mode_b=MODE_SCALED_F32, scale_a=1.0, scale_b=1.0,
                 n_threads=4, prefetch=8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        joined_a = "\n".join(paths_a).encode()
        joined_b = "\n".join(paths_b).encode() if paths_b else b""
        hw = (ctypes.c_int64 * 2)()
        self._h = lib.ssn_loader_open(joined_a, joined_b, mode_a, mode_b,
                                      scale_a, scale_b, n_threads, prefetch,
                                      hw)
        if not self._h:
            raise RuntimeError(f"loader open failed ({paths_a[:1]}...)")
        self.shape = (hw[0], hw[1])
        self._n = lib.ssn_loader_len(self._h)
        da, ca = _MODE_SPEC[mode_a]
        self._spec_a = (da, ca)
        self._spec_b = _MODE_SPEC[mode_b] if paths_b else None

    def __len__(self):
        return self._n

    def _alloc(self, spec):
        dtype, c = spec
        shape = self.shape if c == 1 else (*self.shape, c)
        return np.empty(shape, dtype)

    def next(self):
        """Next frame in order: array (single stream) or (a, b) tuple.
        Returns None past the end; raises on decode error."""
        if self._h is None:
            return None
        a = self._alloc(self._spec_a)
        b = self._alloc(self._spec_b) if self._spec_b else None
        rc = self._lib.ssn_loader_next(
            self._h, a.ctypes.data_as(ctypes.c_void_p),
            b.ctypes.data_as(ctypes.c_void_p) if b is not None else None)
        if rc == 1:
            return None
        if rc == 2:
            raise RuntimeError("native loader: frame decode failed")
        return (a, b) if b is not None else a

    def __iter__(self):
        while True:
            f = self.next()
            if f is None:
                return
            yield f

    def close(self):
        if self._h is not None:
            self._lib.ssn_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
