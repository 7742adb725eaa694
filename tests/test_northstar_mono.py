"""Monocular north-star: scale-drifting ring loop closed by Sim3.

The monocular counterpart of test_northstar.py — no depth anywhere, so the
map is built purely by two-view initialization + triangulation, the world
scale is arbitrary, and drift includes a SCALE component that only a Sim3
(7-dof) closure can absorb (the scale-drift-aware pose graph of ORB-SLAM2's
monocular mode — reference consumes it via System.h:208-210).

Also exercises, end-to-end at capacity: eager mono keyframe insertion
(thRefRatio=0.9 parity), keyframe culling + slot reuse (the run saturates
max_keyframes=128 and must keep tracking), and relocalization-free survival
over 400 frames (lost == 0).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.geometry.se3 import sim3_decompose
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import unpack_to_pm1
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
from semantic_slam_tpu.slam.vocab import train_vocabulary


def _cam_center(T):
    return -T[:3, :3].T @ T[:3, 3]


def _sim3_align(P, Q):
    """Umeyama similarity: s, R, t minimizing ||s R P + t - Q||."""
    mp, mq = P.mean(0), Q.mean(0)
    Pc, Qc = P - mp, Q - mq
    U, D, Vt = np.linalg.svd(Qc.T @ Pc / len(P))
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ S @ Vt
    s = (D * S.diagonal()).sum() / (Pc ** 2).sum() * len(P)
    return s, R, mq - s * R @ mp


def test_northstar_mono_ring_sim3_closure():
    N = 400
    scene = synth.make_ring_scene(seed=3)
    traj = synth.ring_trajectory(N, radius=3.5, laps=1.25)
    gt_rel = np.stack([traj[i] @ np.linalg.inv(traj[0]) for i in range(N)])

    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=128, max_points=16384,
                                    max_kp_per_frame=256, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    sys_.mono = True
    # synth.observe descriptors come from the scene points directly (no
    # viewpoint decay), so the dense keyframing real pixels need (see
    # SlamSystem.mono_kf_max_gap) would only add 400 redundant keyframes
    sys_.mono_kf_max_gap = 20
    vocab = train_vocabulary(
        np.asarray(unpack_to_pm1(jnp.asarray(scene.desc_u8[:2048]))),
        np.ones(2048, bool), n_words=128, iters=4)
    sys_.attach_loop_closing(vocab, run_global_ba=True)
    lc = sys_._loop_closer

    snaps = {}
    orig = lc._correct

    def snapping(kf_cur, kf_loop, S):
        if "pre" not in snaps:
            snaps["pre"] = (sys_.kf_pose.copy(), sys_.kf_valid.copy(),
                            sys_.kf_timestamps.copy(), kf_cur, kf_loop,
                            np.asarray(S))
        return orig(kf_cur, kf_loop, S)

    lc._correct = snapping

    lost = 0
    for i in range(N):
        obs = synth.observe(scene, traj[i], cfg.camera, max_kp=256,
                            px_noise=0.5, seed=4000 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"],
            depth=np.zeros(256, np.float32), timestamp=float(i)))
        lost += sys_.state == "LOST"

    assert lost == 0, f"mono tracking lost on {lost} frames"
    assert lc.loops, "Sim3 loop closure never fired"

    def errors(poses, valid, ts):
        ks = sorted((k for k in range(sys_.K) if valid[k]),
                    key=lambda k: ts[k])
        est = np.stack([_cam_center(poses[k]) for k in ks])
        gt = np.stack([_cam_center(gt_rel[int(ts[k])]) for k in ks])
        s, R, t = _sim3_align(est[:10], gt[:10])   # gauge from early segment
        return ks, np.linalg.norm(est @ (s * R).T + t - gt, axis=1)

    pre_p, pre_v, pre_t, kf_cur, kf_loop, S = snaps["pre"]
    # the verifier produced a genuine Sim3 with a near-unity scale estimate
    sc = float(np.asarray(sim3_decompose(jnp.asarray(S))[0]))
    assert 0.9 < sc < 1.1, sc

    ks_pre, e_pre = errors(pre_p, pre_v, pre_t)
    ks_post, e_post = errors(sys_.kf_pose, sys_.kf_valid, sys_.kf_timestamps)
    i_pre = ks_pre.index(kf_cur)
    i_post = ks_post.index(kf_cur)
    assert e_pre[i_pre] > 0.025, f"drift too small: {e_pre[i_pre]}"
    ratio = e_pre[i_pre] / max(e_post[i_post], 1e-9)
    assert ratio >= 5.0, (e_pre[i_pre], e_post[i_post], ratio)
    ate_pre = float(np.sqrt((e_pre ** 2).mean()))
    ate_post = float(np.sqrt((e_post ** 2).mean()))
    assert ate_post < ate_pre, (ate_pre, ate_post)
