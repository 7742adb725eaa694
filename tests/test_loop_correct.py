"""End-to-end loop correction: inject drift into a SLAM map, close the loop
with a known Sim3, verify poses and points snap back."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.geometry import se3_exp
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
from semantic_slam_tpu.slam.loop import LoopCloser
from semantic_slam_tpu.slam.vocab import train_vocabulary


def test_loop_correct_removes_drift():
    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=64, max_points=8192,
                                    max_kp_per_frame=512, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    scene = synth.make_scene(2500, extent=3.0, depth_center=2.0, seed=71)
    traj = synth.orbit_trajectory(80, radius=0.5, look_at=(0, 0, 2.0))
    for i, Tcw in enumerate(traj):
        obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=300 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
            timestamp=float(i)))
    K = sys_.n_kf
    assert K >= 4

    clean_poses = sys_.kf_pose[:K].copy()
    clean_pts = sys_.pt_xyz.copy()

    # inject incremental drift into the poses of keyframes 1..K-1 and move
    # each point consistently with its reference keyframe (as real drift
    # would): X' = Twc_drifted @ Tcw_clean @ X
    drift_step = np.asarray(se3_exp(jnp.asarray(
        [0.01, 0.004, -0.006, 0.004, -0.003, 0.002], jnp.float32)))
    acc = np.eye(4, dtype=np.float32)
    per_kf_drift = [np.eye(4, dtype=np.float32)]
    for k in range(1, K):
        acc = (acc @ drift_step).astype(np.float32)
        sys_.kf_pose[k] = acc @ clean_poses[k]
        per_kf_drift.append(acc.copy())
    pts = np.nonzero(sys_.pt_valid)[0]
    ref = np.clip(sys_.pt_obs_kf[pts, 0], 0, K - 1)
    for k in range(K):
        sel = pts[ref == k]
        if len(sel) == 0:
            continue
        Tc = clean_poses[k]
        Twc_d = np.linalg.inv(sys_.kf_pose[k])
        X = clean_pts[sel]
        Xc = X @ Tc[:3, :3].T + Tc[:3, 3]
        sys_.pt_xyz[sel] = Xc @ Twc_d[:3, :3].T + Twc_d[:3, 3]

    drift_end = np.linalg.norm(sys_.kf_pose[K - 1][:3, 3]
                               - clean_poses[K - 1][:3, 3])
    assert drift_end > 0.05  # drift is substantial

    # loop closer: S_corr is the drift of the current (last) keyframe's
    # world measured against the loop keyframe's (clean) world = acc
    desc = np.asarray(jnp.asarray(sys_.pt_desc[sys_.pt_valid][:512]))
    from semantic_slam_tpu.ops.orb import unpack_to_pm1
    vocab = train_vocabulary(
        np.asarray(unpack_to_pm1(jnp.asarray(desc))),
        np.ones(len(desc), bool), n_words=32, iters=2)
    lc = LoopCloser(sys_, vocab)
    S_corr = per_kf_drift[K - 1]
    lc._correct(K - 1, 0, jnp.asarray(S_corr))

    end_err = np.linalg.norm(sys_.kf_pose[K - 1][:3, 3]
                             - clean_poses[K - 1][:3, 3])
    assert end_err < drift_end * 0.35, (drift_end, end_err)
    # map points moved back toward their clean positions too
    pt_err = np.linalg.norm(sys_.pt_xyz[pts] - clean_pts[pts], axis=1)
    assert np.median(pt_err) < 0.06, np.median(pt_err)
