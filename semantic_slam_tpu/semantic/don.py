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
