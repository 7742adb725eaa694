"""Ground-plane-fitting segmentation (GPF, ICRA'17).

Replaces the reference ``GroundRemoval`` (``src/GroundRemoval.cpp``: sort by
height, lowest-point-representative seeds, iterative SVD plane fit with
distance-threshold reclassification; constants sensor height 1.73 m, Niter
10, Nlpr 20 — ``include/GroundRemoval.hpp:63-69``). TPU formulation: the
sort becomes top_k, the per-iteration plane fit is a 3x3 eigendecomposition
of the weighted covariance, and reclassification is one batched dot —
everything jitted with a lax.scan over iterations, vmappable over the
``num_segments`` x-splits the reference supports.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GroundResult(NamedTuple):
    is_ground: jnp.ndarray   # [N] bool
    normal: jnp.ndarray      # [3] plane normal
    d: jnp.ndarray           # [] plane offset (n·x = d)


@functools.partial(jax.jit, static_argnames=("n_iter", "n_lpr"))
def fit_ground_plane(pts: jnp.ndarray, valid: jnp.ndarray,
                     *, sensor_height: float = 1.73,
                     th_seeds: float = 0.4, th_dist: float = 0.2,
                     n_iter: int = 10, n_lpr: int = 20) -> GroundResult:
    """pts [N, 3] with +y pointing down (camera convention).

    Seeds = points within th_seeds of the mean of the n_lpr lowest points
    (GroundRemoval.cpp:22-61), then n_iter rounds of plane fit +
    re-classification (mainLoop, :133-175)."""
    y = pts[:, 1]
    # lowest-point representative: n_lpr largest y (down = larger y), and
    # reject obvious under-ground noise beyond 1.5x sensor height
    plausible = valid & (y < 1.5 * sensor_height)
    score = jnp.where(plausible, y, -jnp.inf)
    top_y, _ = jax.lax.top_k(score, n_lpr)
    lpr = jnp.mean(jnp.where(jnp.isfinite(top_y), top_y, 0.0))
    seeds = plausible & (y > lpr - th_seeds)

    def plane_from(mask):
        w = mask.astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.sum(pts * w[:, None], 0) / wsum
        x = (pts - mu) * w[:, None]
        cov = x.T @ x / wsum
        _, V = jnp.linalg.eigh(cov)
        n = V[:, 0]                       # smallest-eigenvalue direction
        n = jnp.where(n[1] < 0, -n, n)    # normal points down(+y)
        return n, jnp.dot(n, mu)

    def body(mask, _):
        n, d = plane_from(mask)
        dist = pts @ n - d
        new_mask = valid & (jnp.abs(dist) < th_dist)
        return new_mask, (n, d)

    mask, (ns, ds) = jax.lax.scan(body, seeds, None, length=n_iter)
    return GroundResult(is_ground=mask, normal=ns[-1], d=ds[-1])


def segment_ground(pts: jnp.ndarray, valid: jnp.ndarray, n_segments: int = 3,
                   **kw) -> jnp.ndarray:
    """Optional x-split into `n_segments` strips, each fit independently
    (GroundRemoval.cpp:177-232 segment); returns combined ground mask."""
    if n_segments <= 1:
        return fit_ground_plane(pts, valid, **kw).is_ground
    x = pts[:, 0]
    xw = jnp.where(valid, x, 0.0)
    lo = jnp.min(jnp.where(valid, x, jnp.inf))
    hi = jnp.max(jnp.where(valid, x, -jnp.inf))
    edges = lo + (hi - lo) * jnp.arange(n_segments + 1) / n_segments
    out = jnp.zeros(pts.shape[0], bool)
    for s in range(n_segments):
        sel = valid & (x >= edges[s]) & (x <= edges[s + 1])
        res = fit_ground_plane(pts, sel, **kw)
        out = out | (res.is_ground & sel)
    return out
