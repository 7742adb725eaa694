"""Binary-mask geometry ops (the OpenCV contour-machinery replacement).

The reference leans on cv::findContours / contourArea / pointPolygonTest /
matchShapes (Hu moments) for mask reasoning (``src/Engine.cpp:174-218,
420-433``). On TPU, masks stay rasterized: point-in-contour with an interior
margin becomes a lookup into an eroded mask; contour area becomes a pixel
count; Hu moments come from image-moment reductions — all dense, fused ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def mask_area(mask: jnp.ndarray) -> jnp.ndarray:
    """Pixel count of a [..., H, W] bool mask (contourArea equivalent)."""
    return jnp.sum(mask, axis=(-2, -1))


@functools.partial(jax.jit, static_argnames=("radius",))
def erode(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Binary erosion with a (2r+1)² square element via min-pooling.

    ``erode(mask, r)[p]`` True ⇔ every pixel within Chebyshev distance r of p
    is in the mask ⇔ interior distance > r — the rasterized equivalent of
    ``pointPolygonTest(contour, p, True) > r`` (reference mnDist gate).
    """
    if radius <= 0:
        return mask
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    pooled = -jax.lax.reduce_window(
        -m, -1.0, jax.lax.max, (1,) * (m.ndim - 2) + (k, k),
        (1,) * m.ndim, "SAME")
    return pooled > 0.5


@functools.partial(jax.jit, static_argnames=("radius",))
def dilate(mask: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    if radius <= 0:
        return mask
    m = mask.astype(jnp.float32)
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        m, 0.0, jax.lax.max, (1,) * (m.ndim - 2) + (k, k),
        (1,) * m.ndim, "SAME")
    return pooled > 0.5


def bbox_of_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[H, W] bool -> [4] (x, y, w, h) int32; zeros if empty."""
    H, W = mask.shape
    any_row = jnp.any(mask, axis=1)
    any_col = jnp.any(mask, axis=0)
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    y0 = jnp.min(jnp.where(any_row, rows, H))
    y1 = jnp.max(jnp.where(any_row, rows, -1))
    x0 = jnp.min(jnp.where(any_col, cols, W))
    x1 = jnp.max(jnp.where(any_col, cols, -1))
    empty = ~jnp.any(mask)
    out = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]).astype(jnp.int32)
    return jnp.where(empty, jnp.zeros(4, jnp.int32), out)


def hu_moments(mask: jnp.ndarray) -> jnp.ndarray:
    """Seven Hu invariant moments of a [H, W] bool/float mask.

    Used for the contour-similarity term (cv::matchShapes
    CV_CONTOURS_MATCH_I1, reference ``Engine.cpp:428``). Computed from
    *region* moments (filled mask) rather than arc moments — scale/rotation/
    translation invariance is identical.
    """
    m = mask.astype(jnp.float32)
    H, W = m.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    m00 = jnp.sum(m) + 1e-9
    cx = jnp.sum(xs * m) / m00
    cy = jnp.sum(ys * m) / m00
    dx = xs - cx
    dy = ys - cy

    def mu(p, q):
        return jnp.sum((dx ** p) * (dy ** q) * m)

    def eta(p, q):
        return mu(p, q) / (m00 ** (1.0 + (p + q) / 2.0))

    n20, n02, n11 = eta(2, 0), eta(0, 2), eta(1, 1)
    n30, n03, n21, n12 = eta(3, 0), eta(0, 3), eta(2, 1), eta(1, 2)
    h1 = n20 + n02
    h2 = (n20 - n02) ** 2 + 4 * n11 ** 2
    h3 = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h4 = (n30 + n12) ** 2 + (n21 + n03) ** 2
    h5 = ((n30 - 3 * n12) * (n30 + n12)
          * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2)
          + (3 * n21 - n03) * (n21 + n03)
          * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2))
    h6 = ((n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2)
          + 4 * n11 * (n30 + n12) * (n21 + n03))
    h7 = ((3 * n21 - n03) * (n30 + n12)
          * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2)
          - (n30 - 3 * n12) * (n21 + n03)
          * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2))
    return jnp.stack([h1, h2, h3, h4, h5, h6, h7])


def match_shapes_i1(hu_a: jnp.ndarray, hu_b: jnp.ndarray) -> jnp.ndarray:
    """cv::matchShapes CONTOURS_MATCH_I1: Σ |1/mᴬ − 1/mᴮ| with
    m = sign(h)·log10|h|."""
    def mlog(h):
        return jnp.sign(h) * jnp.log10(jnp.maximum(jnp.abs(h), 1e-30))

    ma = mlog(hu_a)
    mb = mlog(hu_b)
    usable = (jnp.abs(hu_a) > 1e-20) & (jnp.abs(hu_b) > 1e-20)
    term = jnp.abs(1.0 / ma - 1.0 / mb)
    return jnp.sum(jnp.where(usable, term, 0.0))


def mask_centroid(mask: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [2] (cx, cy) centroid from first-order moments
    (cv::moments m10/m00, m01/m00)."""
    m = mask.astype(jnp.float32)
    H, W = m.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    m00 = jnp.sum(m) + 1e-9
    return jnp.stack([jnp.sum(xs * m) / m00, jnp.sum(ys * m) / m00])


def mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    inter = jnp.sum(a & b, axis=(-2, -1))
    union = jnp.sum(a | b, axis=(-2, -1))
    return inter / jnp.maximum(union, 1)
