"""Multi-loop north-star: two interacting loop closures on one map.

Round-2 gap: the persistent loop-edge machinery (``slam/loop.py`` — loop
edges enter the essential graph of every later pose-graph optimization) was
never exercised with interacting loops. Here the camera runs a spiral
staircase: one lap of the lower wall band (first closure), a vertical ramp
into an unmapped upper band, then a lap of the upper band (second closure).
The second closure's Sim3 pose-graph optimization spans the whole essential
graph including the first loop's edge; the assertions check the second
correction does NOT reopen the first loop, and shutdown GBA keeps both
closed. Reference behavior: LoopClosing::CorrectLoop + the KeyFrame loop
edges consumed by the essential-graph optimization (ORB-SLAM2 via
``include/ORB_SLAM2/System.h:208-210``).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import unpack_to_pm1
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
from semantic_slam_tpu.slam.vocab import train_vocabulary


def _cam_center(Tcw):
    return -Tcw[:3, :3].T @ Tcw[:3, 3]


def _kf_errors(sys_, poses, valid, ts, gt_rel):
    errs = {}
    for k in range(sys_.K):
        if valid[k]:
            errs[k] = np.linalg.norm(
                _cam_center(poses[k]) - _cam_center(gt_rel[int(ts[k])]))
    return errs


def test_second_loop_closure_preserves_first():
    N = 920
    scene = synth.make_ring_scene(n_points=16000, height=3.2, seed=0)
    traj = synth.spiral_ring_trajectory(N, radius=3.5)
    gt_rel = np.stack([traj[i] @ np.linalg.inv(traj[0]) for i in range(N)])

    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=192, max_points=24576,
                                    max_kp_per_frame=512, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    vocab = train_vocabulary(
        np.asarray(unpack_to_pm1(jnp.asarray(scene.desc_u8[:2048]))),
        np.ones(2048, bool), n_words=128, iters=4)
    sys_.attach_loop_closing(vocab, run_global_ba=True)
    lc = sys_._loop_closer

    # snapshot map state before and after each correction
    events = []
    orig_correct = lc._correct

    def snapping_correct(kf_cur, kf_loop, S):
        pre = (sys_.kf_pose.copy(), sys_.kf_valid.copy(),
               sys_.kf_timestamps.copy())
        out = orig_correct(kf_cur, kf_loop, S)
        post = (sys_.kf_pose.copy(), sys_.kf_valid.copy(),
                sys_.kf_timestamps.copy())
        events.append(dict(kf_cur=kf_cur, kf_loop=kf_loop, pre=pre,
                           post=post, frame=len(states)))
        return out

    lc._correct = snapping_correct

    states = []
    lost = 0
    for i in range(N):
        obs = synth.observe(scene, traj[i], cfg.camera, max_kp=512,
                            px_noise=0.8, depth_noise=0.01, seed=1000 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
            timestamp=float(i)))
        states.append(sys_.state)
        lost += sys_.state == "LOST"

    assert lost == 0, f"tracking lost on {lost} frames"
    assert len(events) >= 2, (
        f"expected two loop closures, got {len(events)} "
        f"(loops={lc.loops})")
    ev1, ev2 = events[0], events[-1]
    # the two closures anchor in different wall bands (different laps)
    t1 = float(ev1["pre"][2][ev1["kf_cur"]])
    t2 = float(ev2["pre"][2][ev2["kf_cur"]])
    assert t2 - t1 > 200, (t1, t2)

    # closure 1 corrected real drift
    e1_pre = _kf_errors(sys_, *ev1["pre"], gt_rel)
    e1_post = _kf_errors(sys_, *ev1["post"], gt_rel)
    k1 = ev1["kf_cur"]
    assert e1_pre[k1] > 0.08, f"first-loop drift too small: {e1_pre[k1]}"
    assert e1_post[k1] < e1_pre[k1] / 3.0, (e1_pre[k1], e1_post[k1])

    # closure 2 corrected its own drift...
    e2_pre = _kf_errors(sys_, *ev2["pre"], gt_rel)
    e2_post = _kf_errors(sys_, *ev2["post"], gt_rel)
    k2 = ev2["kf_cur"]
    assert e2_post[k2] < e2_pre[k2], (e2_pre[k2], e2_post[k2])

    # ...WITHOUT reopening the first loop: the first loop's keyframe stays
    # at post-closure-1 accuracy after the second correction (if the first
    # loop edge were absent from the essential graph, the second Sim3
    # optimization would be free to re-stretch that part of the trajectory)
    if k1 in e2_post:       # k1 may have been culled at capacity
        assert e2_post[k1] < max(3.0 * e1_post[k1], 0.12), (
            e1_post[k1], e2_post[k1])

    # shutdown GBA keeps both loops closed
    sys_.shutdown()
    e_fin = _kf_errors(sys_, sys_.kf_pose, sys_.kf_valid,
                       sys_.kf_timestamps, gt_rel)
    if k1 in e_fin:
        assert e_fin[k1] < max(3.0 * e1_post[k1], 0.12), (
            e1_post[k1], e_fin[k1])
    assert e_fin[k2] < max(e2_post[k2] * 1.5, 0.12), (
        e2_post[k2], e_fin[k2])
