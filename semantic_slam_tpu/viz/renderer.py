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


# ---------------------------------------------------------------------------
# Debug overlay renders (reference show2d/display parity).
# ---------------------------------------------------------------------------

# Minimal 3x5 bitmap font (rows top->bottom, 3 bits each, MSB = left pixel).
_FONT = {
    "0": (0b111, 0b101, 0b101, 0b101, 0b111),
    "1": (0b010, 0b110, 0b010, 0b010, 0b111),
    "2": (0b111, 0b001, 0b111, 0b100, 0b111),
    "3": (0b111, 0b001, 0b111, 0b001, 0b111),
    "4": (0b101, 0b101, 0b111, 0b001, 0b001),
    "5": (0b111, 0b100, 0b111, 0b001, 0b111),
    "6": (0b111, 0b100, 0b111, 0b101, 0b111),
    "7": (0b111, 0b001, 0b010, 0b010, 0b010),
    "8": (0b111, 0b101, 0b111, 0b101, 0b111),
    "9": (0b111, 0b101, 0b111, 0b001, 0b111),
    "A": (0b010, 0b101, 0b111, 0b101, 0b101),
    "B": (0b110, 0b101, 0b110, 0b101, 0b110),
    "C": (0b011, 0b100, 0b100, 0b100, 0b011),
    "D": (0b110, 0b101, 0b101, 0b101, 0b110),
    "E": (0b111, 0b100, 0b110, 0b100, 0b111),
    "F": (0b111, 0b100, 0b110, 0b100, 0b100),
    "G": (0b011, 0b100, 0b101, 0b101, 0b011),
    "H": (0b101, 0b101, 0b111, 0b101, 0b101),
    "I": (0b111, 0b010, 0b010, 0b010, 0b111),
    "J": (0b001, 0b001, 0b001, 0b101, 0b010),
    "K": (0b101, 0b110, 0b100, 0b110, 0b101),
    "L": (0b100, 0b100, 0b100, 0b100, 0b111),
    "M": (0b101, 0b111, 0b111, 0b101, 0b101),
    "N": (0b101, 0b111, 0b111, 0b111, 0b101),
    "O": (0b010, 0b101, 0b101, 0b101, 0b010),
    "P": (0b110, 0b101, 0b110, 0b100, 0b100),
    "Q": (0b010, 0b101, 0b101, 0b110, 0b011),
    "R": (0b110, 0b101, 0b110, 0b110, 0b101),
    "S": (0b011, 0b100, 0b010, 0b001, 0b110),
    "T": (0b111, 0b010, 0b010, 0b010, 0b010),
    "U": (0b101, 0b101, 0b101, 0b101, 0b111),
    "V": (0b101, 0b101, 0b101, 0b101, 0b010),
    "W": (0b101, 0b101, 0b111, 0b111, 0b101),
    "X": (0b101, 0b101, 0b010, 0b101, 0b101),
    "Y": (0b101, 0b101, 0b010, 0b010, 0b010),
    "Z": (0b111, 0b001, 0b010, 0b100, 0b111),
    ".": (0b000, 0b000, 0b000, 0b000, 0b010),
    "-": (0b000, 0b000, 0b111, 0b000, 0b000),
    " ": (0b000, 0b000, 0b000, 0b000, 0b000),
}


def _put_text(img: np.ndarray, text: str, x: int, y: int, color,
              scale: int = 2):
    """Rasterize `text` with the built-in 3x5 font, top-left at (x, y)
    (putText stand-in — no font libraries on a headless pod)."""
    H, W, _ = img.shape
    cx = x
    for ch in str(text).upper():
        glyph = _FONT.get(ch, _FONT[" "])
        for r, bits in enumerate(glyph):
            for c in range(3):
                if bits & (0b100 >> c):
                    y0, x0 = y + r * scale, cx + c * scale
                    if 0 <= y0 < H - scale and 0 <= x0 < W - scale:
                        img[y0:y0 + scale, x0:x0 + scale] = color
        cx += 4 * scale


def _mask_outline(mask: np.ndarray) -> np.ndarray:
    """1-px outer contour of a boolean mask (findContours-drawContours
    stand-in): mask minus its 4-neighbour erosion."""
    m = np.asarray(mask).astype(bool)
    er = m.copy()
    er[1:, :] &= m[:-1, :]
    er[:-1, :] &= m[1:, :]
    er[:, 1:] &= m[:, :-1]
    er[:, :-1] &= m[:, 1:]
    return m & ~er


def _debug_color(i: int) -> np.ndarray:
    """Deterministic stand-in for the reference's rand()%255 colors."""
    return np.random.RandomState(9173 + int(i)).randint(
        60, 255, 3).astype(np.uint8)


def _as_rgb(image: Optional[np.ndarray], shape_hw) -> np.ndarray:
    if image is None:
        return np.full(tuple(shape_hw) + (3,), 18, np.uint8)
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return np.ascontiguousarray(img.astype(np.uint8))


def render_detections(image: Optional[np.ndarray], detections, categories,
                      path: Optional[str] = None) -> np.ndarray:
    """MaskRCNN::show2d parity (reference src/MaskRCNN.cpp:619-650): draw
    each detection's mask contour with a per-detection color, plus its score
    and category label near the bbox top-left; writes maskrcnn.png."""
    masks = np.asarray(detections.masks).astype(bool)
    valid = np.asarray(detections.valid)
    img = _as_rgb(image, masks.shape[1:])
    for i in np.nonzero(valid)[0]:
        color = _debug_color(i)
        img[_mask_outline(masks[i])] = color
        x0, y0 = (int(v) for v in np.asarray(detections.boxes[i])[:2])
        name = categories.get(int(detections.labels[i]), "?")
        _put_text(img, f"{float(detections.scores[i]):.2f}", x0 + 2,
                  max(y0 - 26, 0), color)
        _put_text(img, name, x0 + 2, max(y0 - 13, 0), color)
    if path:
        _save_image(path, img)
    return img


def render_clusters(image: Optional[np.ndarray], cluster_id: np.ndarray,
                    path: Optional[str] = None) -> np.ndarray:
    """DoN::show2d parity (reference src/DoN.cpp:462-527): paint every DoN
    cluster's pixels in a per-cluster color over the image; writes DoN.png."""
    cid = np.asarray(cluster_id)
    img = _as_rgb(image, cid.shape)
    for c in np.unique(cid[cid >= 0]):
        img[cid == c] = _debug_color(1000 + int(c))
    if path:
        _save_image(path, img)
    return img


def render_frame(image: Optional[np.ndarray], uv: np.ndarray,
                 valid: np.ndarray, matched: np.ndarray,
                 state: str, n_kf: int, n_pt: int, n_inliers: int,
                 width: int = 640, height: int = 480,
                 path: Optional[str] = None) -> np.ndarray:
    """FrameDrawer::DrawFrame parity (the per-frame tracked-features debug
    view the reference viewer consumes, src/ORB_SLAM2/System.cc:101-107):
    green boxes on keypoints matched to map points this frame, blue boxes
    on unmatched detections, plus a status footer with tracking state,
    keyframe/map-point counts, and the inlier count."""
    img = _as_rgb(image, (height, width))
    H, W, _ = img.shape
    uv = np.asarray(uv)
    valid = np.asarray(valid).astype(bool)
    matched = np.asarray(matched).astype(bool)
    green = np.array([40, 220, 60], np.uint8)
    blue = np.array([70, 120, 255], np.uint8)
    for i in np.nonzero(valid)[0]:
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if not (2 <= u < W - 2 and 2 <= v < H - 2):
            continue
        c = green if matched[i] else blue
        img[v - 2, u - 2:u + 3] = c
        img[v + 2, u - 2:u + 3] = c
        img[v - 2:v + 3, u - 2] = c
        img[v - 2:v + 3, u + 2] = c
    footer = (f"{state}  KFs {n_kf}  MPs {n_pt}  "
              f"matched {int(matched[valid].sum())}  inliers {n_inliers}")
    _put_text(img, footer, 4, H - 14, np.array([255, 255, 255], np.uint8))
    if path:
        _save_image(path, img)
    return img


def render_object_overlay(bank, oidx: int, mask: np.ndarray,
                          Tcw: np.ndarray, K: np.ndarray, categories,
                          prob_thd: float, min_depth: float, max_depth: float,
                          image: Optional[np.ndarray] = None,
                          border: int = 5,
                          path: Optional[str] = None) -> np.ndarray:
    """Engine::display parity (reference src/Engine.cpp:687-753): overlay one
    object's mask contour, its "label id" text, and its probability-gated
    object points projected into the current keyframe (frustum border and
    [min_depth, max_depth] range gates as in the reference); writes
    texture_geometry.png."""
    from semantic_slam_tpu.semantic.objects import point_prob

    m = np.asarray(mask).astype(bool)
    img = _as_rgb(image, m.shape)
    H, W, _ = img.shape
    color = np.asarray(bank.obj_color[oidx]) * 255
    color = color.astype(np.uint8)
    img[_mask_outline(m)] = color

    ys, xs = np.nonzero(m)
    if len(xs):
        name = categories.get(int(bank.obj_label[oidx]), "?")
        _put_text(img, f"{name} {oidx}", int(xs.min()) + 2,
                  max(int(ys.min()) - 13, 0), color)

    good = np.asarray(bank.pt_valid[oidx]) & (
        np.asarray(point_prob(bank)[oidx]) >= prob_thd)
    if good.any():
        xyz = np.asarray(bank.pt_xyz[oidx])[good]
        u, v, z = _project(xyz, np.asarray(Tcw), np.asarray(K))
        pc = xyz @ np.asarray(Tcw)[:3, :3].T + np.asarray(Tcw)[:3, 3]
        rng = np.sqrt((pc ** 2).sum(-1))
        ok = ((z > 0) & (u >= border) & (u < W - border) & (v >= border)
              & (v < H - border) & (rng >= min_depth) & (rng <= max_depth))
        ui, vi = u[ok].astype(int), v[ok].astype(int)
        img[vi, ui] = color
    if path:
        _save_image(path, img)
    return img
