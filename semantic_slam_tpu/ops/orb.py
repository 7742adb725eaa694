"""ORB descriptors: image pyramid, intensity-centroid orientation, rotated
BRIEF — batched JAX, no per-keypoint host loops.

Replaces ORB-SLAM2's ``ORBextractor`` descriptor stage. Design notes:

  - The orientation moments (m10, m01 over a radius-15 circular patch) are
    computed for the *whole image* with two 31x31 convolutions (XLA convs run
    on the MXU), then gathered at keypoint locations — cheaper on TPU than
    per-keypoint patch extraction.
  - The BRIEF sampling pattern is a deterministic seeded Gaussian pattern
    (σ = patch/5, 256 pairs). We intentionally do NOT reuse OpenCV's learned
    table: descriptors never cross the framework boundary (matching, BoW and
    map storage are all internal), so only internal consistency matters.
  - Descriptors are produced in two layouts: packed uint8[32] (map storage
    parity with the reference's 32-byte ORB rows) and signed int8[256] bit
    planes whose dot product turns Hamming distance into an MXU matmul
    (see ops/match.py).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF_PATCH = 15
N_PAIRS = 256


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """[N_PAIRS, 4] (x1, y1, x2, y2) BRIEF test pattern, clipped to the patch."""
    rs = np.random.RandomState(seed)
    sigma = PATCH / 5.0
    pat = rs.normal(0.0, sigma, size=(N_PAIRS, 4))
    return np.clip(pat, -(HALF_PATCH - 2), HALF_PATCH - 2).astype(np.float32)


BRIEF_PATTERN = _make_pattern()


def _orientation_kernels() -> Tuple[np.ndarray, np.ndarray]:
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    circ = (xs ** 2 + ys ** 2) <= HALF_PATCH ** 2
    kx = (xs * circ).astype(np.float32)
    ky = (ys * circ).astype(np.float32)
    return kx, ky


_KX, _KY = _orientation_kernels()


def orientation_map(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H, W] patch orientation (radians) at every pixel.

    θ = atan2(m01, m10), intensity centroid over the radius-15 circular patch
    (IC method used by ORB). Two MXU convolutions.
    """
    x = img.astype(jnp.float32)[None, :, :, None]
    k = jnp.stack([jnp.asarray(_KX), jnp.asarray(_KY)], axis=-1)[:, :, None, :]
    m = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m10 = m[0, :, :, 0]
    m01 = m[0, :, :, 1]
    return jnp.arctan2(m01, m10)


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [H, W] image at float coords (clamped)."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


@jax.jit
def compute_descriptors(img: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray):
    """ORB descriptors at keypoints.

    Args: img [H, W] grayscale; uv [N, 2] (x, y) level coords; valid [N].
    Returns (desc_u8 [N, 32] uint8, desc_pm1 [N, 256] int8 in {-1, +1},
             angle [N] radians).
    """
    img = img.astype(jnp.float32)
    N = uv.shape[0]
    theta_map = orientation_map(img)
    xi = jnp.clip(uv[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
    yi = jnp.clip(uv[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
    angle = theta_map[yi, xi]                                    # [N]

    c = jnp.cos(angle)[:, None]
    s = jnp.sin(angle)[:, None]
    pat = jnp.asarray(BRIEF_PATTERN)                             # [256, 4]
    x1, y1, x2, y2 = pat[:, 0][None], pat[:, 1][None], pat[:, 2][None], pat[:, 3][None]
    # rotate pattern by keypoint angle (steered BRIEF)
    rx1 = c * x1 - s * y1 + uv[:, 0:1]
    ry1 = s * x1 + c * y1 + uv[:, 1:2]
    rx2 = c * x2 - s * y2 + uv[:, 0:1]
    ry2 = s * x2 + c * y2 + uv[:, 1:2]
    t1 = _bilinear(img, rx1, ry1)                                # [N, 256]
    t2 = _bilinear(img, rx2, ry2)
    bits = (t1 < t2)                                             # [N, 256] bool
    bits = bits & valid[:, None]

    # packed uint8[32]
    b = bits.reshape(N, 32, 8).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    desc_u8 = jnp.sum(b * weights[None, None, :], axis=-1).astype(jnp.uint8)
    # ±1 int8 planes for MXU Hamming
    desc_pm1 = jnp.where(bits, 1, -1).astype(jnp.int8)
    return desc_u8, desc_pm1, angle


def unpack_to_pm1(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 32] -> int8[..., 256] in {-1, +1} (for matching stored maps)."""
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    bits = (desc_u8[..., :, None] & weights) > 0                 # [..., 32, 8]
    return jnp.where(bits, 1, -1).astype(jnp.int8).reshape(
        desc_u8.shape[:-1] + (N_PAIRS,))


# ---------------------------------------------------------------------------
# Pyramid + full extraction
# ---------------------------------------------------------------------------


class PyramidLevel(NamedTuple):
    image: jnp.ndarray     # [Hl, Wl]
    scale: float           # cumulative scale: level coords * scale = level-0 coords


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[PyramidLevel]:
    """Gaussian-free area-resize pyramid (XLA resize), static per-level shapes."""
    H, W = img.shape
    out = [PyramidLevel(img.astype(jnp.float32), 1.0)]
    for lvl in range(1, n_levels):
        s = scale_factor ** lvl
        h, w = int(round(H / s)), int(round(W / s))
        im = jax.image.resize(img.astype(jnp.float32), (h, w), method="bilinear")
        out.append(PyramidLevel(im, s))
    return out


class Features(NamedTuple):
    """Static-shape keypoint set for one frame (level-0 coordinates)."""
    uv: jnp.ndarray        # [N, 2] float32 (x, y) in level-0 pixels
    level: jnp.ndarray     # [N] int32
    score: jnp.ndarray     # [N] float32
    angle: jnp.ndarray     # [N] float32
    desc_u8: jnp.ndarray   # [N, 32] uint8
    desc_pm1: jnp.ndarray  # [N, 256] int8
    valid: jnp.ndarray     # [N] bool


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Distribute the keypoint budget across levels like ORB-SLAM2 (geometric
    decay by 1/scale per level, remainder to the coarsest)."""
    inv = 1.0 / scale_factor
    total = sum(inv ** l for l in range(n_levels))
    budgets = [int(round(n_features * (inv ** l) / total)) for l in range(n_levels)]
    budgets[-1] = max(0, n_features - sum(budgets[:-1]))
    return budgets


def extract_orb(img: jnp.ndarray, cfg) -> Features:
    """Full multi-scale ORB extraction. cfg is an OrbConfig."""
    from semantic_slam_tpu.ops.fast import detect_fast_grid

    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    parts = []
    for lvl, (pl, budget) in enumerate(zip(levels, budgets)):
        if budget <= 0:
            continue
        budget = max(8, budget)
        uv, score, valid = detect_fast_grid(
            pl.image, float(cfg.ini_th_fast), float(cfg.min_th_fast),
            cell=cfg.cell_size, per_cell=cfg.max_kp_per_cell,
            max_kp=budget, margin=cfg.edge_margin)
        d8, dpm, ang = compute_descriptors(pl.image, uv, valid)
        parts.append(Features(
            uv=uv * pl.scale,
            level=jnp.full((budget,), lvl, jnp.int32),
            score=score, angle=ang, desc_u8=d8, desc_pm1=dpm, valid=valid))
    return Features(*[jnp.concatenate([getattr(p, f) for p in parts], axis=0)
                      for f in Features._fields])
