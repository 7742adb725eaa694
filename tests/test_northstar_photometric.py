"""Pixels-first north-star: the FULL front end inside the accuracy loop.

The other north-stars feed ``synth.observe``'s pre-made descriptors; here
every frame is a photometric render of a textured ring corridor
(``synth.render_ring_textured``: world-anchored multi-scale cell texture +
blocky 3D relief, supersampled pixel integration, pixel/depth noise) and the
SLAM system runs its real image path: pyramid + Pallas FAST + steered BRIEF
extraction, depth sampling, matching, pose GN — the fused
``track_rgbd_frame`` program — then keyframing, local BA, BoW loop
detection over a vocabulary trained from the SAME extracted descriptors,
Sim3 verification, loop correction, and shutdown GBA.

Assertions mirror tests/test_northstar.py (the reference bar: ORB-SLAM2
loop pipeline via /root/reference include/ORB_SLAM2/System.h:205-210):
  (a) pre-closure drift at the loop keyframe is substantial (> 0.1 m),
  (b) loop correction shrinks that error >= 5x (whole-map ATE improves),
  (c) shutdown GBA keeps the loop closed.

This sequence is also the regression harness for map-point slot recycling
(SlamSystem._alloc_points/_free_points): 500 frames of fresh territory
allocate ~25k point slots while only ~8k are concurrently valid — without
recycling the bump allocator exhausts max_points mid-lap and tracking
starves (LOST) before the loop ever closes.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import extract_orb
from semantic_slam_tpu.slam.system import SlamSystem
from semantic_slam_tpu.slam.vocab import train_vocabulary


def _cam_center(Tcw):
    return -Tcw[:3, :3].T @ Tcw[:3, 3]


def _kf_errors(sys_, poses, valid, ts, gt_rel):
    return {k: np.linalg.norm(_cam_center(poses[k]) -
                              _cam_center(gt_rel[int(ts[k])]))
            for k in range(sys_.K) if valid[k]}


def _ate(errs, keys):
    return float(np.sqrt(np.mean([errs[k] ** 2 for k in keys])))


def test_northstar_photometric_ring():
    N = 500
    base = SlamConfig()
    # half-resolution keeps the 500-frame CPU render+track loop affordable;
    # all intrinsics scale with it
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, fx=267.7, fy=269.6,
                                   cx=160.05, cy=123.8, width=320,
                                   height=240),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      max_kp_per_frame=512, max_obs_per_point=8),
        orb=dataclasses.replace(base.orb, n_features=512))
    cam = cfg.camera
    traj = synth.ring_trajectory(N, radius=3.5, laps=1.25)
    gt_rel = np.stack([traj[i] @ np.linalg.inv(traj[0]) for i in range(N)])

    # the vocabulary comes from the same front end it will score: ORB
    # descriptors extracted from renders at a handful of spread viewpoints
    descs, valids = [], []
    for i in range(0, N, N // 6):
        g, _ = synth.render_ring_textured(traj[i], cam, seed=7 * i)
        f = extract_orb(jnp.asarray(g, jnp.float32), cfg.orb)
        descs.append(np.asarray(f.desc_pm1))
        valids.append(np.asarray(f.valid))
    vocab = train_vocabulary(np.concatenate(descs), np.concatenate(valids),
                             n_words=128, iters=3)

    sys_ = SlamSystem(cfg)
    sys_.attach_loop_closing(vocab, run_global_ba=True)
    lc = sys_._loop_closer

    snaps = {}
    orig_correct = lc._correct

    def snapping_correct(kf_cur, kf_loop, S):
        if "pre" not in snaps:
            snaps["pre"] = (sys_.kf_pose.copy(), sys_.kf_valid.copy(),
                            sys_.kf_timestamps.copy(), kf_cur, kf_loop)
        return orig_correct(kf_cur, kf_loop, S)

    lc._correct = snapping_correct

    lost = 0
    for i in range(N):
        gray, depth = synth.render_ring_textured(
            traj[i], cam, seed=1000 + i, px_noise=2.0, depth_noise=0.01)
        sys_.track_rgbd(gray, depth, timestamp=float(i))
        lost += sys_.state == "LOST"

    assert lost == 0, f"tracking lost on {lost} frames"
    assert lc.loops, "loop closure never fired over 1.25 laps"
    # the recycler really ran: more slots were allocated than exist
    assert sys_.n_pt == sys_.P and sys_.pt_free, \
        (sys_.n_pt, len(sys_.pt_free))

    pre_p, pre_v, pre_t, kf_cur, kf_loop = snaps["pre"]
    e_pre = _kf_errors(sys_, pre_p, pre_v, pre_t, gt_rel)
    e_post = _kf_errors(sys_, sys_.kf_pose, sys_.kf_valid,
                        sys_.kf_timestamps, gt_rel)

    # (a) genuine accumulated drift at the loop keyframe
    assert e_pre[kf_cur] > 0.1, f"drift too small: {e_pre[kf_cur]}"
    # (b) closure shrinks the loop-KF error by >= 5x
    ratio = e_pre[kf_cur] / max(e_post[kf_cur], 1e-9)
    assert ratio >= 5.0, (e_pre[kf_cur], e_post[kf_cur], ratio)
    common = sorted(set(e_pre) & set(e_post))
    ate_pre, ate_post = _ate(e_pre, common), _ate(e_post, common)
    assert ate_post < ate_pre * 0.75, (ate_pre, ate_post)

    # (c) shutdown's final GBA keeps the loop closed
    sys_.shutdown()
    e_fin = _kf_errors(sys_, sys_.kf_pose, sys_.kf_valid,
                       sys_.kf_timestamps, gt_rel)
    assert e_fin[kf_cur] < e_pre[kf_cur] / 5.0, (e_pre[kf_cur], e_fin[kf_cur])
    ate_fin = _ate(e_fin, sorted(set(e_pre) & set(e_fin)))
    assert ate_fin <= ate_post * 1.10, (ate_post, ate_fin)
