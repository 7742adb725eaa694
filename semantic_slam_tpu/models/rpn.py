"""Region Proposal Network: anchors, head, proposal selection, box utils.

Static-shape TPU formulation: every stage works on padded fixed-size arrays
(top-k instead of thresholds, masked NMS instead of list filtering).
"""

from __future__ import annotations

import functools
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ANCHOR_RATIOS = (0.5, 1.0, 2.0)


class RPNHead(nn.Module):
    n_anchors: int = len(ANCHOR_RATIOS)
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                       precision=jax.lax.Precision.DEFAULT, name="conv")
        cls = nn.Conv(self.n_anchors, (1, 1), dtype=jnp.float32, name="cls")
        box = nn.Conv(self.n_anchors * 4, (1, 1), dtype=jnp.float32, name="box")
        logits, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            logits.append(cls(h))
            deltas.append(box(h))
        return logits, deltas


def level_anchors(hw: Tuple[int, int], stride: int, size: float) -> jnp.ndarray:
    """[H*W*A, 4] anchors (cx, cy, w, h) for one pyramid level."""
    H, W = hw
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * stride
    cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
    anchors = []
    for r in ANCHOR_RATIOS:
        w = size * (1.0 / r) ** 0.5
        h = size * r ** 0.5
        anchors.append(jnp.stack([cx, cy, jnp.full_like(cx, w),
                                  jnp.full_like(cx, h)], -1))
    return jnp.stack(anchors, -2).reshape(-1, 4)   # [H*W, A, 4] -> flat


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) anchors + (dx, dy, dw, dh) -> (x0, y0, x1, y1)."""
    cx = anchors[..., 0] + deltas[..., 0] * anchors[..., 2]
    cy = anchors[..., 1] + deltas[..., 1] * anchors[..., 3]
    w = anchors[..., 2] * jnp.exp(jnp.clip(deltas[..., 2], -4.0, 4.0))
    h = anchors[..., 3] * jnp.exp(jnp.clip(deltas[..., 3], -4.0, 4.0))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def encode_boxes(anchors: jnp.ndarray, boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Inverse of decode_boxes (for training targets)."""
    gw = jnp.maximum(boxes_xyxy[..., 2] - boxes_xyxy[..., 0], 1e-3)
    gh = jnp.maximum(boxes_xyxy[..., 3] - boxes_xyxy[..., 1], 1e-3)
    gx = (boxes_xyxy[..., 0] + boxes_xyxy[..., 2]) / 2
    gy = (boxes_xyxy[..., 1] + boxes_xyxy[..., 3]) / 2
    dx = (gx - anchors[..., 0]) / anchors[..., 2]
    dy = (gy - anchors[..., 1]) / anchors[..., 3]
    dw = jnp.log(gw / anchors[..., 2])
    dh = jnp.log(gh / anchors[..., 3])
    return jnp.stack([dx, dy, dw, dh], -1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] xyxy -> [N, M] IoU."""
    x0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "max_out"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
        *, iou_thresh: float = 0.7, max_out: int = 256):
    """Greedy NMS with static shapes: score-sort, then a fori_loop that
    suppresses by the IoU matrix. Returns (keep_idx [max_out], keep_valid)."""
    N = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]
    iou = box_iou(b, b)

    def body(i, alive):
        kill = (iou[i] > iou_thresh) & (jnp.arange(N) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, N, body, v)
    score_alive = jnp.where(alive, scores[order], -jnp.inf)
    sel = jnp.argsort(-score_alive)[:max_out]
    keep_idx = order[sel]
    keep_valid = alive[sel]
    return keep_idx, keep_valid
