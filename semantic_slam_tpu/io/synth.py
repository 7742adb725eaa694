"""Synthetic scene generation for end-to-end tests and benchmarks.

There are no camera datasets in the build environment, so correctness is
established against *synthetic worlds with exact ground truth*: random
landmark clouds with stable binary descriptors, smooth camera trajectories,
analytic depth renders of box scenes. This replaces the role the TUM/KITTI
sequences play for the reference (its only fixtures, SURVEY.md §4) while
being stronger: ground-truth poses/depths are exact, so ATE asserts have no
dataset noise floor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from semantic_slam_tpu.config import CameraConfig


class SynthScene(NamedTuple):
    pts_w: np.ndarray        # [P, 3] landmark positions
    desc_pm1: np.ndarray     # [P, 256] int8 {-1,+1} stable landmark descriptors
    desc_u8: np.ndarray      # [P, 32] packed


def make_scene(n_points: int = 2000, extent: float = 4.0, depth_center: float = 3.0,
               seed: int = 0) -> SynthScene:
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-extent / 2, extent / 2, size=(n_points, 3))
    pts[:, 2] += depth_center
    bits = rs.randint(0, 2, size=(n_points, 256)).astype(bool)
    desc_pm1 = np.where(bits, 1, -1).astype(np.int8)
    weights = 2 ** np.arange(8)
    desc_u8 = (bits.reshape(n_points, 32, 8) * weights).sum(-1).astype(np.uint8)
    return SynthScene(pts.astype(np.float32), desc_pm1, desc_u8)


def orbit_trajectory(n_frames: int, radius: float = 0.6, look_at=(0.0, 0.0, 3.0),
                     wobble: float = 0.1, seed: int = 1) -> np.ndarray:
    """[N, 4, 4] world->camera poses (Tcw) on a smooth arc looking at a target."""
    rs = np.random.RandomState(seed)
    target = np.asarray(look_at, np.float64)
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(n_frames, 1) * 0.25   # quarter orbit
        center = np.array([radius * np.sin(a),
                           wobble * np.sin(3 * a),
                           radius * (1 - np.cos(a))])
        z = target - center
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], axis=1)               # columns = camera axes
        Twc = np.eye(4)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = center
        poses[i] = np.linalg.inv(Twc)
    return poses.astype(np.float32)


def observe(scene: SynthScene, Tcw: np.ndarray, cam: CameraConfig,
            max_kp: int = 512, px_noise: float = 0.3, depth_noise: float = 0.005,
            bit_flips: int = 12, seed: int = 0, drop: float = 0.1):
    """Simulate a frame: project landmarks, keep those in-frustum, corrupt.

    Returns dict with uv [max_kp,2], depth [max_kp], desc_pm1, desc_u8,
    level (all zeros), valid mask, and landmark_id [max_kp] ground-truth
    correspondence (for diagnostics only — never consumed by the SLAM code).
    """
    rs = np.random.RandomState(seed)
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = scene.pts_w @ R.T + t
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    vis = (z > 0.2) & (u > 8) & (u < cam.width - 8) & (v > 8) & (v < cam.height - 8)
    vis &= rs.uniform(size=len(z)) > drop
    ids = np.nonzero(vis)[0]
    rs.shuffle(ids)
    ids = ids[:max_kp]
    n = len(ids)

    uv = np.zeros((max_kp, 2), np.float32)
    depth = np.zeros((max_kp,), np.float32)
    desc = np.zeros((max_kp, 256), np.int8)
    lid = np.full((max_kp,), -1, np.int32)
    uv[:n, 0] = u[ids] + rs.normal(0, px_noise, n)
    uv[:n, 1] = v[ids] + rs.normal(0, px_noise, n)
    depth[:n] = z[ids] * (1.0 + rs.normal(0, depth_noise, n))
    d = scene.desc_pm1[ids].copy()
    for i in range(n):
        flip = rs.choice(256, size=bit_flips, replace=False)
        d[i, flip] *= -1
    desc[:n] = d
    lid[:n] = ids
    bits = desc > 0
    weights = 2 ** np.arange(8)
    desc_u8 = (bits.reshape(max_kp, 32, 8) * weights).sum(-1).astype(np.uint8)
    return dict(uv=uv, depth=depth, desc_pm1=desc, desc_u8=desc_u8,
                level=np.zeros((max_kp,), np.int32),
                valid=np.arange(max_kp) < n, landmark_id=lid)


# ---------------------------------------------------------------------------
# Dense renders (for DoN / TSDF / engine tests)
# ---------------------------------------------------------------------------


class BoxScene(NamedTuple):
    """Axis-aligned boxes over a ground plane at z-depth plane_depth."""
    boxes: np.ndarray   # [B, 6] (xmin, ymin, zmin, xmax, ymax, zmax) world
    labels: np.ndarray  # [B] semantic class per box


def make_box_scene(n_boxes: int = 3, seed: int = 0) -> BoxScene:
    rs = np.random.RandomState(seed)
    boxes = []
    for _ in range(n_boxes):
        cx, cy = rs.uniform(-0.8, 0.8, 2)
        cz = rs.uniform(1.5, 2.5)
        sx, sy, sz = rs.uniform(0.25, 0.5, 3)
        boxes.append([cx - sx / 2, cy - sy / 2, cz - sz / 2,
                      cx + sx / 2, cy + sy / 2, cz + sz / 2])
    labels = rs.choice([57, 63, 41], size=n_boxes)  # chair, laptop, cup
    return BoxScene(np.asarray(boxes, np.float32), labels.astype(np.int32))


def render_depth(scene: BoxScene, Twc: np.ndarray, cam: CameraConfig,
                 plane_depth: float = 3.0) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast depth + instance-id images from camera pose Twc (cam->world).

    Returns (depth [H, W] float32 z-depth, inst [H, W] int32 box index or -1
    for the background plane). Vectorized slab-test ray casting in NumPy.
    """
    H, W = cam.height, cam.width
    ys, xs = np.mgrid[0:H, 0:W]
    dirs_c = np.stack([(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy,
                       np.ones_like(xs, np.float32)], axis=-1).reshape(-1, 3)
    R, o = Twc[:3, :3], Twc[:3, 3]
    dirs_w = dirs_c @ R.T
    # ground plane z_w = plane_depth (a wall in front of the camera)
    dz = dirs_w[:, 2]
    t_plane = np.where(np.abs(dz) > 1e-6, (plane_depth - o[2]) / dz, np.inf)
    t_plane = np.where(t_plane > 0, t_plane, np.inf)
    best_t = t_plane
    best_id = np.full(len(dirs_w), -1, np.int32)
    for b, box in enumerate(scene.boxes):
        lo, hi = box[:3], box[3:]
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - o) / dirs_w
            t2 = (hi - o) / dirs_w
        tmin = np.nanmax(np.minimum(t1, t2), axis=1)
        tmax = np.nanmin(np.maximum(t1, t2), axis=1)
        hit = (tmax >= tmin) & (tmax > 0)
        t_hit = np.where(tmin > 0, tmin, tmax)
        closer = hit & (t_hit < best_t) & (t_hit > 0)
        best_t = np.where(closer, t_hit, best_t)
        best_id = np.where(closer, b, best_id)
    # convert ray param to camera z-depth
    pts_w = o + best_t[:, None] * dirs_w
    Tcw = np.linalg.inv(Twc)
    z = (pts_w @ Tcw[:3, :3].T + Tcw[:3, 3])[:, 2]
    z = np.where(np.isfinite(best_t), z, 0.0)
    return (z.reshape(H, W).astype(np.float32),
            best_id.reshape(H, W).astype(np.int32))


def render_rgb_from_inst(inst: np.ndarray, seed: int = 0) -> np.ndarray:
    """Flat-colored RGB uint8 render from an instance-id image (for display
    paths; the semantic engine consumes depth + masks, not textures)."""
    rs = np.random.RandomState(seed)
    colors = rs.randint(40, 255, size=(int(inst.max()) + 2, 3), dtype=np.uint8)
    return colors[inst + 1]
