"""ROIAlign + box/mask heads for the two-stage detector."""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def roi_align(feat: jnp.ndarray, boxes: jnp.ndarray, out_size: int,
              stride: float) -> jnp.ndarray:
    """Bilinear ROI pooling of [H, W, C] features at [N, 4] xyxy boxes
    (image coordinates) -> [N, out_size, out_size, C].

    One bilinear sample at each bin center (the sampling_ratio=1 variant) —
    gathers vectorize cleanly on TPU."""
    H, W, C = feat.shape
    n = boxes.shape[0]
    x0, y0, x1, y1 = [boxes[:, i] for i in range(4)]
    bw = jnp.maximum(x1 - x0, 1e-3)
    bh = jnp.maximum(y1 - y0, 1e-3)
    steps = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    sx = (x0[:, None] + steps[None, :] * bw[:, None]) / stride - 0.5   # [N, S]
    sy = (y0[:, None] + steps[None, :] * bh[:, None]) / stride - 0.5
    sx = jnp.clip(sx, 0.0, W - 1.001)
    sy = jnp.clip(sy, 0.0, H - 1.001)
    x0i = jnp.floor(sx).astype(jnp.int32)
    y0i = jnp.floor(sy).astype(jnp.int32)
    fx = sx - x0i
    fy = sy - y0i
    # gather 4 corners: [N, S, S, C]
    f = feat.astype(jnp.float32)

    def g(yi, xi):
        return f[yi[:, :, None], xi[:, None, :]]       # [N, Sy, Sx, C]

    v00 = g(y0i, x0i)
    v01 = g(y0i, x0i + 1)
    v10 = g(y0i + 1, x0i)
    v11 = g(y0i + 1, x0i + 1)
    wx = fx[:, None, :, None]
    wy = fy[:, :, None, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def multilevel_roi_align(pyramid: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         out_size: int, strides: Sequence[int]) -> jnp.ndarray:
    """FPN level assignment (k = floor(4 + log2(sqrt(area)/224)) clipped to
    P2..P5) then per-level ROIAlign, blended by one-hot level masks."""
    area = (jnp.clip(boxes[:, 2] - boxes[:, 0], 1.0)
            * jnp.clip(boxes[:, 3] - boxes[:, 1], 1.0))
    k = jnp.floor(4.0 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    k = jnp.clip(k, 2, 5).astype(jnp.int32) - 2                     # 0..3
    outs = [roi_align(pyramid[l], boxes, out_size, strides[l])
            for l in range(4)]
    stack = jnp.stack(outs)                                         # [4, N, S, S, C]
    onehot = jax.nn.one_hot(k, 4, dtype=stack.dtype)                # [N, 4]
    return jnp.einsum("lnhwc,nl->nhwc", stack, onehot)


class BoxHead(nn.Module):
    num_classes: int = 81
    head_dim: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois):
        """rois [N, 7, 7, C] -> (class logits [N, K], box deltas [N, K, 4])."""
        x = rois.reshape(rois.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.head_dim, dtype=self.dtype,
                             precision=jax.lax.Precision.DEFAULT)(x))
        x = nn.relu(nn.Dense(self.head_dim, dtype=self.dtype,
                             precision=jax.lax.Precision.DEFAULT)(x))
        logits = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32)(x)
        return logits, deltas.reshape(-1, self.num_classes, 4)


class MaskHead(nn.Module):
    num_classes: int = 81
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, rois):
        """rois [N, 14, 14, C] -> mask logits [N, 28, 28, K]."""
        x = rois.astype(self.dtype)
        for i in range(4):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                                dtype=self.dtype,
                                precision=jax.lax.Precision.DEFAULT)(x))
        x = nn.ConvTranspose(self.channels, (2, 2), (2, 2), dtype=self.dtype,
                             precision=jax.lax.Precision.DEFAULT)(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)


def paste_masks(mask28: jnp.ndarray, boxes: jnp.ndarray, height: int,
                width: int) -> jnp.ndarray:
    """[N, 28, 28] mask probs + [N, 4] xyxy boxes -> [N, H, W] pasted probs.

    Inverse-warp: for every image pixel, sample the 28x28 mask bilinearly
    where it falls inside the box. Bilinear sampling on a regular target
    grid is SEPARABLE, so the paste is two batched matmuls
    (Wy [N,H,S] @ mask [N,S,S] @ Wxᵀ [N,S,W]) on the MXU — the gather
    formulation (4 arbitrary-index taps × N·H·W) ran ~50× below HBM
    bandwidth and was the entire cost of full-image inference (~104 ms of a
    107 ms VGA forward; the matmul paste is sub-ms)."""
    N, S, _ = mask28.shape
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    x0 = boxes[:, 0][:, None]
    y0 = boxes[:, 1][:, None]
    bw = jnp.maximum(boxes[:, 2][:, None] - x0, 1e-3)
    bh = jnp.maximum(boxes[:, 3][:, None] - y0, 1e-3)
    u = (xs[None, :] - x0) / bw * S - 0.5            # [N, W] mask-grid coords
    v = (ys[None, :] - y0) / bh * S - 0.5            # [N, H]
    inside_x = (u > -0.5) & (u < S - 0.5)
    inside_y = (v > -0.5) & (v < S - 0.5)
    uc = jnp.clip(u, 0.0, S - 1.001)
    vc = jnp.clip(v, 0.0, S - 1.001)
    # triangle kernel == bilinear weights on the clipped coordinate (each
    # row has at most two nonzeros; identical taps/weights to the floor/frac
    # formulation including the edge clamp)
    grid = jnp.arange(S, dtype=jnp.float32)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(uc[:, :, None] - grid))  # [N, W, S]
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(vc[:, :, None] - grid))  # [N, H, S]
    m = jnp.einsum("nhs,nst,nwt->nhw", Wy,
                   mask28.astype(jnp.float32), Wx)
    return jnp.where(inside_y[:, :, None] & inside_x[:, None, :], m, 0.0)
