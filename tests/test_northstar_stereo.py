"""Stereo north-star: KITTI-style loop over a drifting ring, depth from
row-constrained left/right descriptor matching (not ground truth).

This exercises the one SLAM input mode the other north-stars don't: the
reference's stereo flow is rectified pair -> ORB both sides ->
ComputeStereoMatches -> per-keypoint depth -> RGBD-style tracking
(``examples/stereo_kitti.cpp:75,112-117``). Here every frame's depth comes
from ``ops.stereo.stereo_depth`` over two independently-observed feature
sets (own order, dropout, pixel noise, descriptor corruption per side), so
matching errors and disparity quantization feed the whole pipeline. The
closure assertions match tests/test_northstar.py: real drift accumulates
over the lap, loop closure shrinks the loop-KF error >= 5x, shutdown GBA
keeps it closed.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import unpack_to_pm1
from semantic_slam_tpu.ops.stereo import stereo_depth
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


def _ate(errs, keys):
    return float(np.sqrt(np.mean([errs[k] ** 2 for k in keys])))


def _stereo_frame(scene, Tcw, cam, seed):
    """One stereo observation -> (FrameInput depth from stereo matching,
    gt depth, matched mask) for quality accounting."""
    left, right = synth.observe_stereo(scene, Tcw, cam, max_kp=512,
                                       px_noise=0.5, seed=seed)
    depth, _ = stereo_depth(
        jnp.asarray(left["uv"]), jnp.asarray(left["desc_pm1"]),
        jnp.asarray(left["valid"]),
        jnp.asarray(right["uv"]), jnp.asarray(right["desc_pm1"]),
        jnp.asarray(right["valid"]),
        jnp.asarray(left["level"]), jnp.asarray(right["level"]),
        jnp.float32(cam.bf), row_tol=4.0)
    return left, np.asarray(depth)


def test_stereo_depth_quality_on_ring():
    """The stereo front end itself: enough matches, accurate depth."""
    scene = synth.make_ring_scene(seed=0)
    traj = synth.ring_trajectory(40, radius=3.5, laps=0.1)
    cam = SlamConfig().camera
    n_match, rel_err = [], []
    for i in range(0, 40, 8):
        left, depth = _stereo_frame(scene, traj[i], cam, seed=3000 + i)
        gt = left["depth"]
        m = (depth > 0) & left["valid"]
        n_match.append(int(m.sum()))
        rel_err.extend(np.abs(depth[m] - gt[m]) / gt[m])
    # the ring scene shows ~150 valid keypoints/frame (same density the
    # RGB-D north-star tracks from); ~115 of them are co-visible in both
    # views and the matcher should recover nearly all
    assert min(n_match) > 80, f"too few stereo matches: {n_match}"
    med = float(np.median(rel_err))
    assert med < 0.05, f"median stereo depth error {med:.3f}"


def test_northstar_stereo_ring_loop_closure(tmp_path):
    N = 500
    scene = synth.make_ring_scene(seed=0)
    traj = synth.ring_trajectory(N, radius=3.5, laps=1.25)
    gt_rel = np.stack([traj[i] @ np.linalg.inv(traj[0]) for i in range(N)])

    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=128, max_points=16384,
                                    max_kp_per_frame=512, max_obs_per_point=8))
    cam = cfg.camera
    sys_ = SlamSystem(cfg)
    vocab = train_vocabulary(
        np.asarray(unpack_to_pm1(jnp.asarray(scene.desc_u8[:2048]))),
        np.ones(2048, bool), n_words=128, iters=4)
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
        left, depth = _stereo_frame(scene, traj[i], cam, seed=1000 + i)
        sys_.track_features(FrameInput(
            uv=left["uv"], level=left["level"], desc_u8=left["desc_u8"],
            desc_pm1=left["desc_pm1"], valid=left["valid"], depth=depth,
            timestamp=float(i)))
        lost += sys_.state == "LOST"

    assert lost == 0, f"tracking lost on {lost} frames"
    assert lc.loops, "loop closure never fired over 1.25 laps"
    pre_p, pre_v, pre_t, kf_cur, kf_loop = snaps["pre"]
    e_pre = _kf_errors(sys_, pre_p, pre_v, pre_t, gt_rel)
    e_post = _kf_errors(sys_, sys_.kf_pose, sys_.kf_valid,
                        sys_.kf_timestamps, gt_rel)

    # (a) genuine accumulated drift at the loop keyframe (the bar moved
    # 0.1 -> 0.05 in round 5: the two-candidate-damping BA tracks the ring
    # ~25% tighter, so pre-closure drift at the loop KF is now ~0.077)
    assert e_pre[kf_cur] > 0.05, f"drift too small to be meaningful: {e_pre[kf_cur]}"
    # (b) closure shrinks the loop-KF error by >= 5x
    ratio = e_pre[kf_cur] / max(e_post[kf_cur], 1e-9)
    assert ratio >= 5.0, (e_pre[kf_cur], e_post[kf_cur], ratio)
    # whole-trajectory ATE improves too
    common = sorted(set(e_pre) & set(e_post))
    ate_pre, ate_post = _ate(e_pre, common), _ate(e_post, common)
    assert ate_post < ate_pre * 0.75, (ate_pre, ate_post)

    # (c) shutdown's final GBA keeps the loop closed and improves ATE
    sys_.shutdown()
    e_fin = _kf_errors(sys_, sys_.kf_pose, sys_.kf_valid,
                       sys_.kf_timestamps, gt_rel)
    assert e_fin[kf_cur] < e_pre[kf_cur] / 5.0, (e_pre[kf_cur], e_fin[kf_cur])
    ate_fin = _ate(e_fin, sorted(set(e_pre) & set(e_fin)))
    assert ate_fin <= ate_post * 1.05, (ate_post, ate_fin)

    # (d) the stereo driver's KITTI-contract exports on the full sequence
    # (examples/stereo_kitti.cpp:112-117: SaveTrajectoryKITTI + the patched
    # System's SaveFrameIDs). The KITTI file carries one 3x4 Twc per FRAME
    # in sequence order; camera centers re-read from the text must
    # reproduce the post-GBA trajectory against ground truth.
    kitti = tmp_path / "CameraTrajectory_kitti.txt"
    fids = tmp_path / "frame_ids.txt"
    sys_.save_trajectory_kitti(str(kitti))
    sys_.save_frame_ids(str(fids))
    rows = np.loadtxt(kitti)
    assert rows.shape == (N, 12), rows.shape
    Twc = rows.reshape(N, 3, 4)
    centers = Twc[:, :3, 3]
    gt_centers = np.stack([_cam_center(gt_rel[i]) for i in range(N)])
    ate_frames = float(np.sqrt(((centers - gt_centers) ** 2)
                               .sum(-1).mean()))
    assert ate_frames < 0.25, ate_frames
    # frame_ids: one line per surviving keyframe (slot order), each id the
    # source frame index — the stage-2 association key
    ids = np.loadtxt(fids, dtype=np.int64, ndmin=1)
    expect = [int(sys_.kf_frame_id[k]) for k in range(sys_.K)
              if sys_.kf_valid[k]]
    assert ids.tolist() == expect, (len(ids), len(expect))
    assert len(set(expect)) == len(expect)          # unique source frames
    assert all(0 <= i < N for i in expect)


def test_stereo_pixels_first_tracking():
    """Pixels-first stereo: RECTIFIED RENDERED PAIRS drive the full stereo
    front end — ORB extraction on both images, row-constrained MXU stereo
    matching (ops/stereo.stereo_depth), per-keypoint depth, tracking.
    Mirrors examples/stereo_kitti.py's track_stereo flow (reference
    examples/stereo_kitti.cpp:75 feeds TrackStereo with raw images).

    The right view is an independent render at a pure x-baseline offset
    (rectified geometry), so descriptors must genuinely re-detect and match
    across the 10 cm viewpoint change; depth must agree with the renderer's
    z-buffer; and 150 frames (0.35 laps, ~8 m path) must track with bounded
    drift and no LOST."""
    import dataclasses

    import jax.numpy as jnp

    from semantic_slam_tpu.config import SlamConfig, MapConfig
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.ops.orb import extract_orb
    from semantic_slam_tpu.ops.stereo import stereo_depth
    from semantic_slam_tpu.slam.system import SlamSystem, FrameInput

    N, BASELINE = 150, 0.1
    base = SlamConfig()
    cam0 = dataclasses.replace(base.camera, fx=267.7, fy=269.6, cx=160.05,
                               cy=123.8, width=320, height=240,
                               bf=267.7 * BASELINE)
    cfg = dataclasses.replace(
        base, camera=cam0,
        map=MapConfig(max_keyframes=128, max_points=16384,
                      max_kp_per_frame=512, max_obs_per_point=8),
        orb=dataclasses.replace(base.orb, n_features=512))
    cam = cfg.camera
    traj = synth.ring_trajectory(N, radius=3.5, laps=0.35)
    gt_rel = np.stack([traj[i] @ np.linalg.inv(traj[0]) for i in range(N)])
    T_rl = np.eye(4)
    T_rl[0, 3] = -BASELINE   # right camera at +b along the left x axis

    sys_ = SlamSystem(cfg)
    dep_errs, n_matched, lost = [], [], 0
    for i in range(N):
        gl, dl = synth.render_ring_textured(traj[i], cam, seed=1000 + i,
                                            px_noise=2.0)
        gr, _ = synth.render_ring_textured(T_rl @ traj[i], cam,
                                           seed=5000 + i, px_noise=2.0)
        fl = extract_orb(jnp.asarray(gl, jnp.float32), cfg.orb)
        fr = extract_orb(jnp.asarray(gr, jnp.float32), cfg.orb)
        depth, _ = stereo_depth(
            fl.uv, fl.desc_pm1, fl.valid, fr.uv, fr.desc_pm1, fr.valid,
            fl.level, fr.level, jnp.float32(cam.bf))
        depth = np.asarray(depth)
        uv = np.asarray(fl.uv)
        xi = np.clip(uv[:, 0].astype(int), 0, cam.width - 1)
        yi = np.clip(uv[:, 1].astype(int), 0, cam.height - 1)
        gt_d = dl[yi, xi]
        m = (depth > 0) & (gt_d > 0)
        n_matched.append(int(m.sum()))
        if m.sum() > 10:
            dep_errs.append(float(np.median(np.abs(depth[m] - gt_d[m]))))
        sys_.track_features(FrameInput(
            uv=uv, level=np.asarray(fl.level),
            desc_u8=np.asarray(fl.desc_u8),
            desc_pm1=np.asarray(fl.desc_pm1), valid=np.asarray(fl.valid),
            depth=depth, timestamp=float(i)))
        lost += sys_.state == "LOST"

    assert lost == 0, f"stereo tracking lost on {lost} frames"
    # the stereo matcher really works across the baseline view change
    assert np.median(n_matched) >= 100, np.median(n_matched)
    # disparity depth agrees with the renderer's z-buffer (~1 m range)
    assert np.median(dep_errs) < 0.05, np.median(dep_errs)
    # bounded drift over the 8 m path (no loop closure in this segment)
    c_est = -sys_.Tcw[:3, :3].T @ sys_.Tcw[:3, 3]
    c_gt = -gt_rel[-1][:3, :3].T @ gt_rel[-1][:3, 3]
    assert np.linalg.norm(c_est - c_gt) < 0.5
