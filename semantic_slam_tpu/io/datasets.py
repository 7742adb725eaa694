"""Dataset loaders: TUM RGB-D, KITTI stereo/velodyne.

Parity with the reference drivers' loaders: TUM association parsing
(``examples/rgbd_tum.cpp:143-167``), KITTI sequence timestamps/image paths
(``examples/stereo_kitti.cpp:122-156``), Velodyne ``.bin`` scans projected to
range images with the HDL-64E calibration (``src/Utility.cpp:374-419,
452-496``; constants ``include/Utility.hpp:52-76``).

Image decoding uses imageio/PIL when present; 16-bit TUM depth PNGs are
scaled by DepthMapFactor (5000) like the reference drivers. The stage-2
lattice sparsification of ``label_instance_rgbd.cpp:89-100`` is provided as
an explicit helper.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


def _imread(path: str) -> np.ndarray:
    from semantic_slam_tpu.io import native

    img = native.imread(path)  # C++ libpng/libjpeg when built
    if img is not None:
        return img
    try:
        import imageio.v3 as iio
        return np.asarray(iio.imread(path))
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path))


class TumRgbdDataset:
    """TUM RGB-D sequence via an associations file."""

    def __init__(self, root: str, associations: Optional[str] = None,
                 depth_factor: float = 5000.0):
        from semantic_slam_tpu.io.mapio import read_associations

        self.root = root
        assoc = associations or os.path.join(root, "associations.txt")
        self.times, self.rgb_files, self.depth_files = read_associations(assoc)
        self.depth_factor = depth_factor

    def __len__(self):
        return len(self.times)

    def __getitem__(self, i) -> Tuple[float, np.ndarray, np.ndarray]:
        rgb = _imread(os.path.join(self.root, self.rgb_files[i]))
        depth_raw = _imread(os.path.join(self.root, self.depth_files[i]))
        depth = depth_raw.astype(np.float32) / self.depth_factor
        return float(self.times[i]), rgb, depth

    def gray(self, rgb: np.ndarray) -> np.ndarray:
        if rgb.ndim == 2:
            return rgb.astype(np.float32)
        return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2]).astype(np.float32)

    def stream(self, n_threads: int = 4, prefetch: int = 8):
        """Prefetching iterator of (t, rgb, depth) frames. Uses the native
        threaded loader (decode overlapped with consumer compute) when built,
        else falls back to sequential __getitem__ reads."""
        from semantic_slam_tpu.io import native

        try:
            loader = native.FrameLoader(
                [os.path.join(self.root, p) for p in self.rgb_files],
                [os.path.join(self.root, p) for p in self.depth_files],
                mode_a=native.MODE_RGB_U8, mode_b=native.MODE_SCALED_F32,
                scale_b=1.0 / self.depth_factor,
                n_threads=n_threads, prefetch=prefetch)
        except RuntimeError:
            for i in range(len(self)):
                yield self[i]
            return
        with loader:
            for i, (rgb, depth) in enumerate(loader):
                yield float(self.times[i]), rgb, depth


def lattice_sparsify_depth(depth: np.ndarray, row_step: int = 4,
                           col_step: int = 3) -> np.ndarray:
    """Keep depth only on a row_step x col_step pixel lattice (the stage-2
    driver preprocessing, reference ``label_instance_rgbd.cpp:89-100``)."""
    out = np.zeros_like(depth)
    out[::row_step, ::col_step] = depth[::row_step, ::col_step]
    return out


class KittiStereoDataset:
    """KITTI odometry sequence (image_0/image_1 + times.txt)."""

    def __init__(self, seq_dir: str):
        times_path = os.path.join(seq_dir, "times.txt")
        self.times = np.loadtxt(times_path) if os.path.exists(times_path) else None
        self.left_dir = os.path.join(seq_dir, "image_0")
        self.right_dir = os.path.join(seq_dir, "image_1")
        self.files = sorted(os.listdir(self.left_dir)) if os.path.isdir(
            self.left_dir) else []
        if self.times is None:
            self.times = np.arange(len(self.files)) * 0.1

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i):
        left = _imread(os.path.join(self.left_dir, self.files[i])).astype(np.float32)
        right = _imread(os.path.join(self.right_dir, self.files[i])).astype(np.float32)
        return float(self.times[i]), left, right

    def stream(self, n_threads: int = 4, prefetch: int = 8):
        """Prefetching iterator of (t, left_f32, right_f32) frames (native
        threaded loader when built, sequential fallback otherwise)."""
        from semantic_slam_tpu.io import native

        try:
            loader = native.FrameLoader(
                [os.path.join(self.left_dir, p) for p in self.files],
                [os.path.join(self.right_dir, p) for p in self.files],
                mode_a=native.MODE_GRAY_F32, mode_b=native.MODE_GRAY_F32,
                n_threads=n_threads, prefetch=prefetch)
        except RuntimeError:
            for i in range(len(self)):
                yield self[i]
            return
        with loader:
            for i, (left, right) in enumerate(loader):
                yield float(self.times[i]), left, right


# ---------------------------------------------------------------------------
# Velodyne HDL-64E range-image projection (Utility.cpp:374-419 semantics)
# ---------------------------------------------------------------------------

HDL64_FOV_UP = 2.0        # degrees
HDL64_FOV_DOWN = -24.8
HDL64_ROWS = 64
HDL64_COLS = 4500


def read_velodyne_bin(path: str) -> np.ndarray:
    """KITTI .bin -> [N, 4] (x, y, z, reflectance) float32."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def velodyne_to_range_image(
    scan: np.ndarray,
    Tr_velo_to_cam: np.ndarray,
    K: np.ndarray,
    width: int = 1242,
    height: int = 375,
) -> np.ndarray:
    """Project a Velodyne scan into a camera-frame *range* image.

    Each valid pixel holds the Euclidean range of the lidar return (the
    quantity the reference engine consumes with the range/√(x²+y²+1)
    backprojection rule). Z-buffered nearest return per pixel."""
    pts = scan[:, :3]
    ones = np.ones((len(pts), 1), np.float32)
    pc = (np.concatenate([pts, ones], 1) @ Tr_velo_to_cam.T)[:, :3]
    z = pc[:, 2]
    front = z > 0.5
    pc = pc[front]
    rng = np.linalg.norm(pc, axis=1)
    u = (K[0, 0] * pc[:, 0] / pc[:, 2] + K[0, 2]).astype(np.int32)
    v = (K[1, 1] * pc[:, 1] / pc[:, 2] + K[1, 2]).astype(np.int32)
    ok = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    u, v, rng = u[ok], v[ok], rng[ok]
    img = np.zeros((height, width), np.float32)
    # nearest return wins: process far-to-near so near overwrites
    order = np.argsort(-rng)
    img[v[order], u[order]] = rng[order]
    return img


def angle_ground_removal(range_img: np.ndarray, K: np.ndarray,
                         sensor_height: float = 1.73,
                         max_slope_deg: float = 10.0) -> np.ndarray:
    """Angle-based ground masking on a range image (Utility.cpp:498-553
    groundRemoval semantics): points whose backprojected height is near the
    ground plane with a shallow local slope are zeroed."""
    H, W = range_img.shape
    ys, xs = np.mgrid[0:H, 0:W]
    x = (xs - K[0, 2]) / K[0, 0]
    y = (ys - K[1, 2]) / K[1, 1]
    rim = np.sqrt(x * x + y * y + 1.0)
    d = range_img / rim
    py = y * d                                   # camera-down axis height
    ground = (range_img > 0) & (py > sensor_height * 0.8)
    out = range_img.copy()
    out[ground] = 0.0
    return out
