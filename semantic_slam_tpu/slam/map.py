"""Array-native SLAM map state.

The reference's pointer-web world model (``ORB_SLAM2::Map`` holding
``KeyFrame*``/``MapPoint*`` graphs with per-object mutexes) becomes a set of
fixed-capacity structure-of-arrays with validity masks — the idiomatic shape
for XLA: every operation over the map is a masked batched array op, and the
whole state is a pytree that moves through jit/pjit unchanged.

Capacity model: ``MapConfig`` fixes max keyframes K, max points P, max
keypoints-per-frame N, max observations-per-point O. Growth = writing into the
next free slot (host-side counter); deletion = clearing the valid bit
(mirrors ORB-SLAM2 bad flags, reference ``System.cc:371-375``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import MapConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MapArrays:
    """The whole SLAM map as one pytree of arrays.

    Mirrors the information content of the reference's Map/KeyFrame/MapPoint
    classes plus the text checkpoint (bundle.txt/coords.txt/camera_graph.txt,
    reference ``System.cc:884-1120``).
    """

    # --- keyframes -------------------------------------------------------
    kf_pose: jnp.ndarray       # [K, 4, 4] Tcw (world->camera), f32
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] i32 source frame index
    kf_kp_uv: jnp.ndarray      # [K, N, 2] keypoint pixel coords, f32
    kf_kp_level: jnp.ndarray   # [K, N] i32 pyramid level
    kf_kp_valid: jnp.ndarray   # [K, N] bool
    kf_desc: jnp.ndarray       # [K, N, 32] uint8 ORB descriptors
    kf_kp_depth: jnp.ndarray   # [K, N] f32 per-keypoint depth (RGBD/stereo), 0 = none
    # --- map points ------------------------------------------------------
    pt_xyz: jnp.ndarray        # [P, 3] world positions
    pt_valid: jnp.ndarray      # [P] bool
    pt_desc: jnp.ndarray       # [P, 32] uint8 representative descriptor
    pt_obs_kf: jnp.ndarray     # [P, O] i32 observing keyframe slot (-1 = none)
    pt_obs_kp: jnp.ndarray     # [P, O] i32 keypoint index within that keyframe
    pt_obs_n: jnp.ndarray      # [P] i32 number of valid observations
    # --- covisibility (dense capped adjacency; CSR-like with fixed width) -
    covis_idx: jnp.ndarray     # [K, C] i32 neighbor keyframe slots (-1 = none)
    covis_w: jnp.ndarray       # [K, C] i32 shared-point weights
    # --- spanning tree / loop edges (for pose graph + viewer parity) ------
    kf_parent: jnp.ndarray     # [K] i32 parent keyframe (-1 = root/none)
    loop_edges: jnp.ndarray    # [K, 8] i32 loop-closure partner slots (-1 = none)
    # --- scalar counters (host-managed, static-shape int32 scalars) -------
    n_kf: jnp.ndarray          # [] i32
    n_pt: jnp.ndarray          # [] i32

    @staticmethod
    def empty(cfg: MapConfig, dtype=jnp.float32) -> "MapArrays":
        K, P, N, O, C = (cfg.max_keyframes, cfg.max_points, cfg.max_kp_per_frame,
                         cfg.max_obs_per_point, cfg.covis_max_neighbors)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (K, 4, 4))
        return MapArrays(
            kf_pose=eye,
            kf_valid=jnp.zeros((K,), bool),
            kf_frame_id=jnp.full((K,), -1, jnp.int32),
            kf_kp_uv=jnp.zeros((K, N, 2), dtype),
            kf_kp_level=jnp.zeros((K, N), jnp.int32),
            kf_kp_valid=jnp.zeros((K, N), bool),
            kf_desc=jnp.zeros((K, N, 32), jnp.uint8),
            kf_kp_depth=jnp.zeros((K, N), dtype),
            pt_xyz=jnp.zeros((P, 3), dtype),
            pt_valid=jnp.zeros((P,), bool),
            pt_desc=jnp.zeros((P, 32), jnp.uint8),
            pt_obs_kf=jnp.full((P, O), -1, jnp.int32),
            pt_obs_kp=jnp.full((P, O), -1, jnp.int32),
            pt_obs_n=jnp.zeros((P,), jnp.int32),
            covis_idx=jnp.full((K, C), -1, jnp.int32),
            covis_w=jnp.zeros((K, C), jnp.int32),
            kf_parent=jnp.full((K,), -1, jnp.int32),
            loop_edges=jnp.full((K, 8), -1, jnp.int32),
            n_kf=jnp.asarray(0, jnp.int32),
            n_pt=jnp.asarray(0, jnp.int32),
        )

    # Convenience host-side accessors ------------------------------------
    def num_keyframes(self) -> int:
        return int(self.n_kf)

    def num_points(self) -> int:
        return int(self.n_pt)

    def valid_kf_indices(self) -> np.ndarray:
        return np.nonzero(np.asarray(self.kf_valid))[0]

    def valid_pt_indices(self) -> np.ndarray:
        return np.nonzero(np.asarray(self.pt_valid))[0]


def covis_from_observations(m: MapArrays, min_weight: int = 15) -> MapArrays:
    """Recompute the covisibility graph from point observations.

    Weight(i, j) = number of map points observed by both keyframes i and j;
    edges kept when weight >= min_weight (ORB-SLAM2 semantics). Fully batched:
    builds a [P, K] one-hot observation incidence and computes the KxK
    co-observation matrix with one MXU matmul — the TPU-native replacement for
    ORB-SLAM2's per-KF UpdateConnections map-counting loops.
    """
    K = m.kf_pose.shape[0]
    P, O = m.pt_obs_kf.shape
    obs_valid = (m.pt_obs_kf >= 0) & m.pt_valid[:, None]
    onehot = jnp.zeros((P, K), jnp.float32)
    rows = jnp.broadcast_to(jnp.arange(P)[:, None], (P, O))
    cols = jnp.where(obs_valid, m.pt_obs_kf, 0)
    onehot = onehot.at[rows.ravel(), cols.ravel()].add(obs_valid.ravel().astype(jnp.float32))
    onehot = jnp.minimum(onehot, 1.0)
    W = (onehot.T @ onehot).astype(jnp.int32)          # [K, K] co-observation counts
    W = W - jnp.diag(jnp.diag(W))
    both_valid = m.kf_valid[:, None] & m.kf_valid[None, :]
    W = jnp.where(both_valid & (W >= min_weight), W, 0)
    C = m.covis_idx.shape[1]
    w_top, idx_top = jax.lax.top_k(W, C)
    covis_idx = jnp.where(w_top > 0, idx_top, -1)
    return dataclasses.replace(m, covis_idx=covis_idx, covis_w=w_top)
