"""Batched pinhole camera model with radial-tangential distortion.

TPU-native replacement for the projection/undistortion math scattered through
the reference (``src/Engine.cpp:614-637`` ProjectIntoCurrentKF,
``src/Object.cpp:324-349`` ProjectObjectPoint, ``cv::undistortPoints`` calls in
``src/Object.cpp:603-608``, fundamental-matrix math ``src/Engine.cpp:644-669``).
Everything is vectorized over point sets; no per-point host loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry.se3 import skew


class Intrinsics(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    # distortion (OpenCV order k1 k2 p1 p2 k3)
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray

    @staticmethod
    def from_config(cam: CameraConfig, dtype=jnp.float32) -> "Intrinsics":
        return Intrinsics(*[jnp.asarray(v, dtype) for v in (
            cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2, cam.p1, cam.p2, cam.k3)])

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )


def project(intr: Intrinsics, pts_cam: jnp.ndarray, apply_distortion: bool = False):
    """Project camera-frame points [..., 3] to pixels [..., 2] (u, v).

    Returns (uv, z) where z is the camera-frame depth (for validity gating —
    the caller masks on z > 0 and image bounds, mirroring the frustum checks in
    reference ``Engine.cpp:344-349``).
    """
    z = pts_cam[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    x = pts_cam[..., 0] / zs
    y = pts_cam[..., 1] / zs
    if apply_distortion:
        x, y = distort(intr, x, y)
    u = intr.fx * x + intr.cx
    v = intr.fy * y + intr.cy
    return jnp.stack([u, v], axis=-1), z


def distort(intr: Intrinsics, x: jnp.ndarray, y: jnp.ndarray):
    """Apply radial-tangential distortion to normalized coords."""
    r2 = x * x + y * y
    radial = 1.0 + r2 * (intr.k1 + r2 * (intr.k2 + r2 * intr.k3))
    xd = x * radial + 2.0 * intr.p1 * x * y + intr.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + intr.p1 * (r2 + 2.0 * y * y) + 2.0 * intr.p2 * x * y
    return xd, yd


def undistort_points(intr: Intrinsics, uv: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Undistort pixel coords [..., 2] -> ideal pixel coords [..., 2].

    Fixed-point iteration (same scheme as cv::undistortPoints); a no-op when
    all distortion coefficients are zero. Fixed iteration count keeps the
    computation jittable with static control flow.
    """
    x0 = (uv[..., 0] - intr.cx) / intr.fx
    y0 = (uv[..., 1] - intr.cy) / intr.fy

    def body(_, xy):
        x, y = xy
        xd, yd = distort(intr, x, y)
        return (x + (x0 - xd), y + (y0 - yd))

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    u = intr.fx * x + intr.cx
    v = intr.fy * y + intr.cy
    return jnp.stack([u, v], axis=-1)


def backproject(intr: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray,
                sensor: int = 2) -> jnp.ndarray:
    """Pixels + depth/range -> camera-frame 3-D points [..., 3].

    sensor=2 (RGBD): depth is z directly.
    sensor=1 (lidar range image): depth is a *range*; z = range / sqrt(x²+y²+1)
    (reference ``src/Object.cpp:616-623``, ``src/DoN.cpp:93-99``).
    """
    x = (uv[..., 0] - intr.cx) / intr.fx
    y = (uv[..., 1] - intr.cy) / intr.fy
    if sensor == 1:
        rim = jnp.sqrt(x * x + y * y + 1.0)
        d = depth / rim
    else:
        d = depth
    return jnp.stack([d * x, d * y, d], axis=-1)


def in_image(uv: jnp.ndarray, width: int, height: int, margin: int = 0) -> jnp.ndarray:
    """Frustum bounds check (reference ``Engine.cpp:344-349`` IsInCurrentKF)."""
    u, v = uv[..., 0], uv[..., 1]
    return (u > margin) & (u < width - margin) & (v > margin) & (v < height - margin)


def fundamental_from_poses(K: jnp.ndarray, Tcw1: jnp.ndarray, Tcw2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix F12 between two cameras with shared intrinsics.

    Matches reference ``Engine.cpp:644-657``: R12 = R1 R2ᵀ, t12 = -R1 R2ᵀ t2 + t1,
    F = K⁻ᵀ [t12]ₓ R12 K⁻¹.
    """
    R1, t1 = Tcw1[..., :3, :3], Tcw1[..., :3, 3]
    R2, t2 = Tcw2[..., :3, :3], Tcw2[..., :3, 3]
    R12 = R1 @ jnp.swapaxes(R2, -1, -2)
    t12 = -jnp.einsum("...ij,...j->...i", R12, t2) + t1
    Kinv = jnp.linalg.inv(K)
    return jnp.swapaxes(Kinv, -1, -2) @ skew(t12) @ R12 @ Kinv


def point_line_distance(pt: jnp.ndarray, line: jnp.ndarray) -> jnp.ndarray:
    """|ax+by+c| / sqrt(a²+b²)  (reference ``Engine.cpp:676-680``)."""
    a, b, c = line[..., 0], line[..., 1], line[..., 2]
    return jnp.abs(a * pt[..., 0] + b * pt[..., 1] + c) / jnp.sqrt(a * a + b * b + 1e-12)


def triangulate_linear(Tcw1: jnp.ndarray, Tcw2: jnp.ndarray, K: jnp.ndarray,
                       uv1: jnp.ndarray, uv2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DLT two-view triangulation, batched over N correspondences.

    Returns (points_world [N,3], depth-in-cam1 [N]). Uses the 4x4 symmetric
    normal system (AᵀA) solved by eigh — batched and MXU-friendly, replacing
    per-point SVD in ORB-SLAM2's LocalMapping triangulation.
    """
    P1 = K @ Tcw1[..., :3, :4]
    P2 = K @ Tcw2[..., :3, :4]

    def rows(P, uv):
        # x * P[2] - P[0], y * P[2] - P[1]
        r0 = uv[..., 0:1] * P[2] - P[0]
        r1 = uv[..., 1:2] * P[2] - P[1]
        return r0, r1

    r0, r1 = rows(P1, uv1)
    r2, r3 = rows(P2, uv2)
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # [N, 4, 4]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]  # smallest eigenvalue eigenvector
    Xw = X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) > 1e-12, X[..., 3:], 1e-12)
    z1 = jnp.einsum("...j,...j->...", Tcw1[..., 2, :3], Xw) + Tcw1[..., 2, 3]
    return Xw, z1
