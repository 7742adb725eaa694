"""FAST-9 corner detection, fully vectorized for the TPU VPU.

Replaces ORB-SLAM2's ``ORBextractor`` FAST stage (per-cell CPU loops with
iniThFAST/minThFAST fallback, reference ``config/TUM3.yaml:41-54`` knobs).
Design: instead of scalar pixel loops, the 16-pixel Bresenham circle becomes
16 shifted copies of the whole image (jnp.roll), the segment test becomes
circular boolean arithmetic over those planes, and non-max suppression is a
3x3 max-pool comparison — everything is dense elementwise work that XLA fuses
into a handful of VPU passes over the image.

The iniTh/minTh fallback ("if a cell found no corner at the high threshold,
retry at the low one", ORB-SLAM2 behavior) is reproduced *branchlessly*: both
thresholds are scored in one pass and a cell keeps low-threshold corners only
where it has no high-threshold corner.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 — the 16 FAST offsets in clockwise order.
FAST_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)
ARC_LEN = 9  # FAST-9: need >= 9 contiguous brighter/darker pixels


def _circle_planes(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [16, H, W]: pixel value at each circle offset.

    plane[i][y, x] = img[y + dy_i, x + dx_i] (offsets are (dy, dx)).
    """
    return jnp.stack([jnp.roll(img, (-dy, -dx), axis=(0, 1))
                      for dy, dx in FAST_OFFSETS])


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Per-pixel FAST-9 corner score map; 0 where not a corner.

    Score = sum over the circle of clamped excursions beyond the threshold for
    the winning polarity (a monotone proxy for OpenCV's max-threshold score;
    equally valid for NMS ranking).
    """
    img = img.astype(jnp.float32)
    planes = _circle_planes(img)                     # [16, H, W]
    diff = planes - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def has_arc(mask):
        # run[i] = AND of mask[(i + j) % 16] for j in [0, ARC_LEN)
        m2 = jnp.concatenate([mask, mask[: ARC_LEN - 1]], axis=0)
        run = m2[:16]
        for j in range(1, ARC_LEN):
            run = run & m2[j: j + 16]
        return jnp.any(run, axis=0)

    is_bright = has_arc(bright)
    is_dark = has_arc(dark)
    s_bright = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    s_dark = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.where(is_bright, s_bright, 0.0)
    score = jnp.where(is_dark & (s_dark > score), s_dark, score)
    return score


def fast_score_two_thresholds(img: jnp.ndarray, t_hi: float, t_lo: float):
    """Both threshold score maps from ONE set of circle planes (the 16
    rolled images and the diff tensor are the expensive part; sharing them
    halves the detection cost of the iniTh/minTh fallback scheme)."""
    img = img.astype(jnp.float32)
    planes = _circle_planes(img)
    diff = planes - img[None]

    def score_for(threshold):
        bright = diff > threshold
        dark = diff < -threshold

        def has_arc(mask):
            m2 = jnp.concatenate([mask, mask[: ARC_LEN - 1]], axis=0)
            run = m2[:16]
            for j in range(1, ARC_LEN):
                run = run & m2[j: j + 16]
            return jnp.any(run, axis=0)

        is_bright = has_arc(bright)
        is_dark = has_arc(dark)
        s_bright = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
        s_dark = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
        score = jnp.where(is_bright, s_bright, 0.0)
        return jnp.where(is_dark & (s_dark > score), s_dark, score)

    return score_for(t_hi), score_for(t_lo)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima in a 3x3 neighborhood (ties broken toward the
    lexicographically-first pixel via strict comparison on shifted copies)."""
    H, W = score.shape
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= neigh, score, 0.0) * (score > 0.0)


def _mask_border(score: jnp.ndarray, margin: int) -> jnp.ndarray:
    H, W = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (yy >= margin) & (yy < H - margin) & (xx >= margin) & (xx < W - margin)
    return jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "ini_threshold", "min_threshold", "cell", "per_cell", "max_kp", "margin"))
def detect_fast_grid(
    img: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
    *,
    cell: int = 32,
    per_cell: int = 8,
    max_kp: int = 512,
    margin: int = 19,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Grid-distributed FAST keypoints with static output shapes.

    Returns (uv [max_kp, 2] float32 (x, y), score [max_kp], valid [max_kp]).

    Spatial distribution: top-`per_cell` corners per `cell`x`cell` tile
    (replacing ORB-SLAM2's quadtree distribution with a TPU-shaped equivalent),
    then global top-`max_kp` by score. A cell that has high-threshold corners
    contributes only those; otherwise its low-threshold corners are eligible
    (iniThFAST/minThFAST fallback semantics).
    """
    H, W = img.shape
    if jax.default_backend() == "tpu":
        # Pallas strip kernel: bit-packed circle masks, all work in VMEM
        # (see ops/fast_pallas.py); identical on the interior, and the
        # margin mask below discards the border where they differ.
        from semantic_slam_tpu.ops.fast_pallas import fast_scores_pallas
        s_hi, s_lo = fast_scores_pallas(img, float(ini_threshold),
                                        float(min_threshold))
    else:
        s_hi, s_lo = fast_score_two_thresholds(img, ini_threshold,
                                               min_threshold)
    s_hi = _mask_border(nms3x3(s_hi), margin)
    s_lo = _mask_border(nms3x3(s_lo), margin)

    # pad to multiples of cell
    Hp = (H + cell - 1) // cell * cell
    Wp = (W + cell - 1) // cell * cell
    pad = ((0, Hp - H), (0, Wp - W))
    s_hi = jnp.pad(s_hi, pad)
    s_lo = jnp.pad(s_lo, pad)
    ncy, ncx = Hp // cell, Wp // cell

    def cells(s):
        return s.reshape(ncy, cell, ncx, cell).transpose(0, 2, 1, 3).reshape(
            ncy * ncx, cell * cell)

    c_hi = cells(s_hi)
    c_lo = cells(s_lo)
    cell_has_hi = jnp.any(c_hi > 0, axis=1, keepdims=True)
    c_eff = jnp.where(cell_has_hi, c_hi, c_lo)      # fallback semantics

    k = min(per_cell, cell * cell)
    top_s, top_i = jax.lax.top_k(c_eff, k)           # [ncells, k]
    cy = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, k), 0) // ncx
    cx = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, k), 0) % ncx
    py = top_i // cell
    px = top_i % cell
    ys = cy * cell + py
    xs = cx * cell + px

    flat_s = top_s.reshape(-1)
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    n = flat_s.shape[0]
    take = min(max_kp, n)
    sel_s, sel_i = jax.lax.top_k(flat_s, take)
    uv = jnp.stack([flat_x[sel_i], flat_y[sel_i]], axis=-1).astype(jnp.float32)
    valid = sel_s > 0
    if take < max_kp:
        uv = jnp.pad(uv, ((0, max_kp - take), (0, 0)))
        sel_s = jnp.pad(sel_s, (0, max_kp - take))
        valid = jnp.pad(valid, (0, max_kp - take))
    return uv, sel_s, valid


def fast_score_reference(img, threshold):
    """NumPy oracle for tests: direct per-pixel FAST-9 segment test."""
    import numpy as np

    img = np.asarray(img, np.float32)
    H, W = img.shape
    score = np.zeros((H, W), np.float32)
    for y in range(3, H - 3):
        for x in range(3, W - 3):
            p = img[y, x]
            vals = np.array([img[y + dy, x + dx] for dy, dx in FAST_OFFSETS])
            diff = vals - p
            for sign in (1, -1):
                mask = (sign * diff) > threshold
                ext = np.concatenate([mask, mask[: ARC_LEN - 1]])
                run = 0
                best = 0
                for v in ext:
                    run = run + 1 if v else 0
                    best = max(best, run)
                if best >= ARC_LEN:
                    s = np.maximum(sign * diff - threshold, 0).sum()
                    score[y, x] = max(score[y, x], s)
    return score
