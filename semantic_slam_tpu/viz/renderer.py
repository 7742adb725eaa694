"""Offline visualization: software point renderer + scene export.

Replaces the reference's Pangolin GL stack (``InstanceViewer``/
``ObjectDrawer``/``CloudViewer`` — live windows are meaningless on a headless
TPU pod) with deterministic offline artifacts:

  - ``render_map``: z-buffered point-splat render of the object map with
    per-object colors (probability-gated like ``ObjectDrawer::DrawMapPoints``),
    keyframe frusta and covisibility edges as line rasterization; writes PNG
    (or PPM fallback without imageio).
  - PLY exports via io/native for external viewers.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _save_image(path: str, img: np.ndarray):
    try:
        import imageio.v3 as iio
        iio.imwrite(path, img)
        return
    except ImportError:
        pass
    if not path.endswith(".ppm"):
        path = os.path.splitext(path)[0] + ".ppm"
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


def _project(pts: np.ndarray, Tcw: np.ndarray, K: np.ndarray):
    pc = pts @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = K[0, 0] * pc[:, 0] / z + K[0, 2]
        v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    return u, v, z


def _splat(img, zbuf, u, v, z, color, radius: int = 1):
    H, W, _ = img.shape
    ok = (z > 0.05) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    ui = u[ok].astype(int)
    vi = v[ok].astype(int)
    zi = z[ok]
    ci = color[ok] if color.ndim == 2 else np.tile(color, (ok.sum(), 1))
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            yy = np.clip(vi + dy, 0, H - 1)
            xx = np.clip(ui + dx, 0, W - 1)
            closer = zi < zbuf[yy, xx]
            img[yy[closer], xx[closer]] = ci[closer]
            zbuf[yy[closer], xx[closer]] = zi[closer]


def _line(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n).astype(int)
    ys = np.linspace(p0[1], p1[1], n).astype(int)
    H, W, _ = img.shape
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    img[ys[ok], xs[ok]] = color


def render_objects(bank, categories, prob_thd: float, view_Tcw: np.ndarray,
                   K: np.ndarray, width: int = 640, height: int = 480,
                   path: Optional[str] = None) -> np.ndarray:
    """Render the object bank from a virtual camera (InstanceViewer parity:
    per-object colors, probability-gated points)."""
    from semantic_slam_tpu.semantic.objects import point_prob

    img = np.full((height, width, 3), 18, np.uint8)
    zbuf = np.full((height, width), np.inf, np.float32)
    prob = np.asarray(point_prob(bank))
    valid = np.asarray(bank.pt_valid)
    xyz = np.asarray(bank.pt_xyz)
    colors = np.asarray(bank.obj_color)
    for o in np.nonzero(np.asarray(bank.obj_valid))[0]:
        good = valid[o] & (prob[o] >= prob_thd)
        if not good.any():
            continue
        u, v, z = _project(xyz[o][good], view_Tcw, K)
        c = (colors[o] * 255).astype(np.uint8)
        _splat(img, zbuf, u, v, z, c)
    if path:
        _save_image(path, img)
    return img


def render_map(m, view_Tcw: np.ndarray, K: np.ndarray, width: int = 640,
               height: int = 480, draw_graph: bool = True,
               path: Optional[str] = None) -> np.ndarray:
    """Render a MapArrays SLAM map: points, keyframe frusta, covis edges."""
    img = np.full((height, width, 3), 18, np.uint8)
    zbuf = np.full((height, width), np.inf, np.float32)
    pts = np.asarray(m.pt_xyz)[np.asarray(m.pt_valid)]
    u, v, z = _project(pts, view_Tcw, K)
    _splat(img, zbuf, u, v, z, np.array([180, 180, 180], np.uint8), radius=0)

    kf_valid = np.asarray(m.kf_valid)
    poses = np.asarray(m.kf_pose)
    centers = []
    for k in np.nonzero(kf_valid)[0]:
        Twc = np.linalg.inv(poses[k])
        centers.append(Twc[:3, 3])
    if centers:
        centers = np.stack(centers)
        u, v, z = _project(centers, view_Tcw, K)
        _splat(img, zbuf, u, v, z, np.array([80, 220, 80], np.uint8), radius=1)
        if draw_graph:
            covis = np.asarray(m.covis_idx)
            kf_ids = np.nonzero(kf_valid)[0]
            slot_to_row = {int(s): i for i, s in enumerate(kf_ids)}
            for i, s in enumerate(kf_ids):
                for j in covis[s]:
                    if j < 0 or int(j) not in slot_to_row:
                        continue
                    jj = slot_to_row[int(j)]
                    if jj <= i:
                        continue
                    if z[i] > 0.05 and z[jj] > 0.05:
                        _line(img, (u[i], v[i]), (u[jj], v[jj]),
                              np.array([60, 120, 60], np.uint8))
    if path:
        _save_image(path, img)
    return img


def export_map_ply(m, path: str):
    from semantic_slam_tpu.io.native import write_ply

    pts = np.asarray(m.pt_xyz)[np.asarray(m.pt_valid)]
    write_ply(path, pts)
