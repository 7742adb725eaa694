"""DoN geometric segmentation pipeline (reference ``src/DoN.cpp`` parity).

extract(): depth/range image -> cluster-id image, replicating the reference
pipeline: organized backprojection (``loadCloud``, with the lidar
range/√(x²+y²+1) rule), two-scale normals, DoN magnitude filter
(``threshold``), Euclidean clustering at ``segradius`` with the 15/1e6 size
gates — all as one jitted program over dense images (see ops/normals.py and
ops/cluster.py for the TPU formulations).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.config import DonConfig
from semantic_slam_tpu.geometry.camera import Intrinsics
from semantic_slam_tpu.ops.cluster import compact_labels, connected_components
from semantic_slam_tpu.ops.normals import backproject_organized, don_field


class DonResult(NamedTuple):
    cluster_id: jnp.ndarray   # [H, W] int32 in [-1, max_clusters)
    sizes: jnp.ndarray        # [max_clusters] i32
    n_clusters: jnp.ndarray   # [] i32
    don_mag: jnp.ndarray      # [H, W] f32 DoN magnitude ("curvature")


class DoN:
    """Configured DoN segmenter (ctor parity: scale1, scale2, threshold,
    segradius, K, sensor — reference ``DoN.cpp:14-57``)."""

    def __init__(self, cfg: DonConfig, intr: Intrinsics, sensor: int = 2):
        self.cfg = cfg
        self.intr = intr
        self.sensor = sensor

    def extract(self, depth: jnp.ndarray) -> DonResult:
        return don_extract(depth, self.intr, self.cfg.scale1, self.cfg.scale2,
                           self.cfg.threshold, self.cfg.segradius,
                           sensor=self.sensor,
                           min_cluster=self.cfg.min_cluster_size,
                           max_cluster=self.cfg.max_cluster_size,
                           max_clusters=self.cfg.max_clusters)

    def extract_cloud(self, pts: jnp.ndarray,
                      valid: jnp.ndarray) -> "DonCloudResult":
        """Raw-cloud overload (reference DoN.cpp:275-408) — no range image
        required; see :func:`don_extract_cloud`."""
        return don_extract_cloud(pts, valid, self.cfg.scale1, self.cfg.scale2,
                                 self.cfg.threshold, self.cfg.segradius,
                                 min_cluster=self.cfg.min_cluster_size,
                                 max_cluster=self.cfg.max_cluster_size,
                                 max_clusters=self.cfg.max_clusters)


@functools.partial(jax.jit, static_argnames=(
    "sensor", "min_cluster", "max_cluster", "max_clusters"))
def don_extract(depth: jnp.ndarray, intr: Intrinsics, scale1: float,
                scale2: float, threshold: float, segradius: float,
                *, sensor: int = 2, min_cluster: int = 15,
                max_cluster: int = 1000000, max_clusters: int = 64) -> DonResult:
    pts, valid = backproject_organized(depth, intr, sensor)
    _, mag, ok = don_field(pts, valid, intr.fx, scale1, scale2)
    keep = ok & (mag > threshold)          # "curvature" GT filter, DoN.cpp:226-239
    if jax.default_backend() == "tpu":
        # in-VMEM Pallas flood (ops/cluster_pallas.py): ~3x the XLA
        # segmented-scan path, identical labels
        from semantic_slam_tpu.ops.cluster_pallas import (
            connected_components_pallas)
        labels = connected_components_pallas(pts, keep, segradius)
    else:
        labels = connected_components(pts, keep, segradius)
    cid, sizes, n = compact_labels(labels, min_size=min_cluster,
                                   max_size=max_cluster,
                                   max_clusters=max_clusters)
    return DonResult(cluster_id=cid, sizes=sizes, n_clusters=n, don_mag=mag)


class DonCloudResult(NamedTuple):
    """Raw-cloud DoN outputs (indices parallel to the input point array)."""
    cluster_id: jnp.ndarray   # [N] int32 in [-1, max_clusters)
    sizes: jnp.ndarray        # [max_clusters] i32
    n_clusters: jnp.ndarray   # [] i32
    don_mag: jnp.ndarray      # [N] f32 DoN magnitude ("curvature")
    normals_small: jnp.ndarray  # [N, 3] unit normals at scale1
    normals_large: jnp.ndarray  # [N, 3] unit normals at scale2


def _radius_normals(pts: jnp.ndarray, valid: jnp.ndarray, d2: jnp.ndarray,
                    radius: float):
    """PCA normal per point from all neighbors within `radius`, flipped
    toward the PCL viewpoint convention (+inf,+inf,+inf ⇒ n·(1,1,1) ≥ 0 —
    reference DoN.cpp:313-315 setViewPoint). Brute-force neighborhoods as
    matmuls: S_i = Σ_j w_ij p_j p_jᵀ is one [N,N]×[N,9] contraction on the
    MXU — the TPU-native replacement for the kd-tree radius search."""
    w = (d2 <= radius * radius) & valid[None, :] & valid[:, None]  # [N, N]
    wf = w.astype(jnp.float32)
    cnt = jnp.sum(wf, axis=1)                                      # [N]
    mu = (wf @ pts) / jnp.maximum(cnt, 1.0)[:, None]               # [N, 3]
    outer = (pts[:, :, None] * pts[:, None, :]).reshape(-1, 9)     # [N, 9]
    S = (wf @ outer).reshape(-1, 3, 3) / jnp.maximum(cnt, 1.0)[:, None, None]
    C = S - mu[:, :, None] * mu[:, None, :]                        # [N, 3, 3]
    C = C + 1e-9 * jnp.eye(3)
    _, vecs = jnp.linalg.eigh(C)             # ascending eigenvalues
    n = vecs[:, :, 0]                        # smallest-eigval eigenvector
    flip = jnp.sign(jnp.sum(n, axis=1))
    n = n * jnp.where(flip == 0, 1.0, flip)[:, None]
    ok = cnt >= 3.0                          # PCL: <3 neighbors ⇒ NaN normal
    return n, ok


@functools.partial(jax.jit, static_argnames=(
    "min_cluster", "max_cluster", "max_clusters"))
def don_extract_cloud(pts: jnp.ndarray, valid: jnp.ndarray, scale1: float,
                      scale2: float, threshold: float, segradius: float,
                      *, min_cluster: int = 15, max_cluster: int = 1000000,
                      max_clusters: int = 64) -> DonCloudResult:
    """DoN segmentation of an UNORGANIZED point cloud — the reference's
    second ``DoN::extract`` overload (``src/DoN.cpp:275-408``): two-scale
    radius-search normals (NormalEstimationOMP + kd-tree), DoN
    curvature = ‖(n_s − n_l)/2‖ (DifferenceOfNormalsEstimation), GT-threshold
    conditional removal, and EuclideanClusterExtraction at ``segradius``
    with the min/max size gates.

    TPU formulation: one [N,N] squared-distance matrix (matmul Gram trick)
    feeds both radius searches and the clustering adjacency; neighborhood
    covariances are [N,N]@[N,9] contractions; Euclidean clustering is
    min-label propagation to fixpoint over the adjacency (≤ ⌈log2 N⌉
    effective iterations, data-independent bound). Memory is O(N²) — size
    for ≤8k points (a post-ground-removal lidar scan); the organized
    range-image path (`don_extract`) remains the hot-loop route.
    """
    N = pts.shape[0]
    pts = pts.astype(jnp.float32)
    sq = jnp.sum(pts * pts, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (pts @ pts.T)           # [N, N]
    d2 = jnp.maximum(d2, 0.0)

    n_s, ok_s = _radius_normals(pts, valid, d2, scale1)
    n_l, ok_l = _radius_normals(pts, valid, d2, scale2)
    mag = 0.5 * jnp.linalg.norm(n_s - n_l, axis=1)
    keep = valid & ok_s & ok_l & (mag > threshold)

    # Euclidean clustering: connected components of the `segradius` graph
    adj = (d2 <= segradius * segradius) & keep[None, :] & keep[:, None]
    init = jnp.where(keep, jnp.arange(N, dtype=jnp.int32), jnp.int32(2 ** 30))

    def body(state):
        labels, _ = state
        nxt = jnp.min(jnp.where(adj, labels[None, :], 2 ** 30), axis=1)
        nxt = jnp.minimum(labels, nxt)
        return nxt, jnp.any(nxt != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body, (init, jnp.bool_(True)))
    labels = jnp.where(keep, labels, -1)

    # size gates + compact relabel (mirrors ops/cluster.compact_labels on a
    # flat index space)
    root = jnp.where(labels == jnp.arange(N), 1, 0)
    sizes_by_root = jnp.sum(
        jax.nn.one_hot(jnp.where(labels >= 0, labels, N), N,
                       dtype=jnp.int32), axis=0)                   # [N]
    good_root = (root > 0) & (sizes_by_root >= min_cluster) & \
                (sizes_by_root <= max_cluster)
    new_id = jnp.cumsum(good_root.astype(jnp.int32)) - 1           # [N]
    new_id = jnp.where(good_root & (new_id < max_clusters), new_id, -1)
    cid = jnp.where(labels >= 0, new_id[jnp.clip(labels, 0, N - 1)], -1)
    n_out = jnp.minimum(jnp.sum(good_root), max_clusters).astype(jnp.int32)
    sizes = jnp.zeros(max_clusters, jnp.int32).at[
        jnp.clip(cid, 0, max_clusters - 1)].add(
        jnp.where(cid >= 0, 1, 0))
    return DonCloudResult(cluster_id=cid.astype(jnp.int32), sizes=sizes,
                          n_clusters=n_out, don_mag=mag,
                          normals_small=n_s, normals_large=n_l)
