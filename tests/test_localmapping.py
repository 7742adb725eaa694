"""LocalMapping parity: map-point fusion (SearchInNeighbors), keyframe
culling with slot reuse, shutdown-time global refinement.

Reference behaviors: LocalMapping fuses duplicated map points across
covisible keyframes and culls redundant keyframes
(``include/ORB_SLAM2/System.h:205-206``, ``src/ORB_SLAM2/System.cc:371-375``
consumes culled flags); System::Shutdown is where final refinement hooks.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig, OrbConfig
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.io.evaluate import ate_rmse
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput


def make_system(max_keyframes=64):
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg, map=MapConfig(max_keyframes=max_keyframes, max_points=8192,
                           max_kp_per_frame=512, max_obs_per_point=8),
        orb=OrbConfig(n_features=512))
    return SlamSystem(cfg)


def frame_from_obs(obs, t):
    return FrameInput(uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
                      desc_pm1=obs["desc_pm1"], valid=obs["valid"],
                      depth=obs["depth"], timestamp=t)


def _project(cam, Tcw, pts_w):
    pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    return (np.stack([cam.fx * pc[:, 0] / z + cam.cx,
                      cam.fy * pc[:, 1] / z + cam.cy], -1).astype(np.float32),
            z.astype(np.float32))


def test_fuse_merges_duplicate_points():
    """Two keyframes observing the same landmarks, 40% of which were
    erroneously re-created as duplicate points bound to KF1: fusion must
    merge them into the originals (winner keeps both observations)."""
    sys_ = make_system()
    cam = sys_.cfg.camera
    # keep all depths under the close-point gate bf/fx*th_depth ~ 2.99 m
    scene = synth.make_scene(200, extent=1.2, depth_center=2.2, seed=3)
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = (0.05, 0.0, 0.0)

    uv0, z0 = _project(cam, T0, scene.pts_w)
    uv1, z1 = _project(cam, T1, scene.pts_w)
    inb = ((uv0 > 10) & (uv0 < (cam.width - 10, cam.height - 10))).all(1) \
        & ((uv1 > 10) & (uv1 < (cam.width - 10, cam.height - 10))).all(1)
    ids = np.nonzero(inb)[0][:150]
    n = len(ids)
    assert n >= 100

    def fi(uv, z):
        pad = sys_.N - n
        return FrameInput(
            uv=np.pad(uv[ids], ((0, pad), (0, 0))),
            level=np.zeros(sys_.N, np.int32),
            desc_u8=np.pad(scene.desc_u8[ids], ((0, pad), (0, 0))),
            desc_pm1=np.pad(scene.desc_pm1[ids], ((0, pad), (0, 0))),
            valid=np.arange(sys_.N) < n,
            depth=np.pad(z[ids], (0, pad)), timestamp=0.0)

    # KF0 creates all n map points from depth
    sys_.Tcw = T0
    k0 = sys_._insert_keyframe(fi(uv0, z0))
    assert sys_.n_pt == n

    # KF1: match the first 60% to existing points (shared obs -> covis),
    # leave the rest unmatched so insertion re-creates them as duplicates
    n_shared = int(0.6 * n)
    match_pt = np.full(sys_.N, -1, np.int32)
    match_pt[:n_shared] = np.arange(n_shared)
    inlier = match_pt >= 0
    sys_.Tcw = T1
    k1 = sys_._insert_keyframe(fi(uv1, z1), match_pt=match_pt,
                               inlier_kp=inlier)
    n_dup = n - n_shared
    assert sys_.n_pt == n + n_dup          # duplicates created
    assert int(sys_.covis_w[k1].max()) >= n_shared  # covisible

    n_valid_before = int(sys_.pt_valid.sum())
    sys_._fuse_map_points(k1)
    n_valid_after = int(sys_.pt_valid.sum())
    # most duplicates fused away (descriptor window matching; allow slack)
    assert n_valid_after <= n_valid_before - int(0.8 * n_dup), (
        n_valid_before, n_valid_after, n_dup)
    # winners now observe both keyframes
    fused = sys_.pt_valid[:n]
    both = ((sys_.pt_obs_kf[:n] == k0).any(1)
            & (sys_.pt_obs_kf[:n] == k1).any(1))
    assert (both[fused].mean()) > 0.9


def test_keyframe_culling_caps_map_growth():
    """A long re-visiting sequence with a small keyframe capacity: culling
    must free redundant keyframes so insertion never exhausts capacity (the
    round-1 design raised RuntimeError at max_keyframes), and accuracy must
    hold."""
    sys_ = make_system(max_keyframes=12)
    scene = synth.make_scene(3000, extent=3.0, depth_center=2.0, seed=11)
    # 3 laps over the same quarter-orbit: heavy viewpoint redundancy
    lap = synth.orbit_trajectory(100, radius=0.5, look_at=(0, 0, 2.0))
    traj = np.concatenate([lap, lap[::-1], lap])
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, sys_.cfg.camera, max_kp=512,
                            px_noise=0.3, depth_noise=0.003, bit_flips=8,
                            seed=500 + i)
        sys_.track_features(frame_from_obs(obs, float(i)))
    assert sys_.state == "OK"
    assert len(sys_.kf_order) <= 12
    assert int(sys_.kf_valid.sum()) == len(sys_.kf_order)
    assert len(sys_.kf_free) + len(sys_.kf_order) == sys_.n_kf
    est = np.stack([T for _, T in sys_.trajectory])
    est_twc = np.asarray(se3_inverse(jnp.asarray(est)))
    gt_twc = np.asarray(se3_inverse(jnp.asarray(traj)))
    err = ate_rmse(est_twc[:, :3, 3], gt_twc[:, :3, 3], align=True)
    assert err < 0.05, f"ATE {err}"


def test_culled_keyframe_leaves_consistent_state():
    sys_ = make_system(max_keyframes=16)
    scene = synth.make_scene(2000, extent=3.0, depth_center=2.0, seed=12)
    traj = synth.orbit_trajectory(140, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, sys_.cfg.camera, max_kp=512,
                            seed=900 + i)
        sys_.track_features(frame_from_obs(obs, float(i)))
    if not sys_.kf_free:
        # force one cull to exercise the removal path
        victims = [j for j in sys_.kf_order[1:-3]]
        assert victims
        sys_._remove_keyframe(victims[0])
    freed = sys_.kf_free[0]
    # no observation, covis edge, or parent pointer references the slot
    assert not sys_.kf_valid[freed]
    assert not (sys_.pt_obs_kf[sys_.pt_valid] == freed).any()
    assert not (sys_.covis_idx == freed).any()
    assert not (sys_.kf_parent[sys_.kf_valid] == freed).any()
    # exporters skip it
    m = sys_.to_map_arrays()
    assert int(np.asarray(m.kf_valid).sum()) == len(sys_.kf_order)


def test_shutdown_runs_final_gba():
    sys_ = make_system()
    scene = synth.make_scene(2000, extent=3.0, depth_center=2.0, seed=13)
    traj = synth.orbit_trajectory(30, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, sys_.cfg.camera, max_kp=512,
                            seed=100 + i)
        sys_.track_features(frame_from_obs(obs, float(i)))
    # perturb a mid keyframe; shutdown's GBA must pull it back
    k = sys_.kf_order[len(sys_.kf_order) // 2]
    clean = sys_.kf_pose[k].copy()
    sys_.kf_pose[k, :3, 3] += (0.03, -0.02, 0.04)
    sys_.shutdown()
    err = np.linalg.norm(sys_.kf_pose[k][:3, 3] - clean[:3, 3])
    assert err < 0.02, err


def test_point_slot_recycling():
    """Map-point slots freed by culling/Replace are reused (scrubbed) once
    the bump region is exhausted. The reference deletes MapPoints outright
    (unbounded heap); the static-shape bank must recycle or long
    exploration starves point creation (SURVEY §7.4)."""
    sys_ = make_system()
    P = sys_.P
    sl = sys_._alloc_points(P + 100)          # over-ask drains the bump region
    assert len(sl) == P and sys_.n_pt == P
    sys_.pt_valid[sl] = True
    sys_.pt_obs_kf[:, 0] = 3                  # stale observation state
    sys_.pt_obs_n[:] = 2

    assert len(sys_._alloc_points(4)) == 0    # full, nothing free
    sys_._free_points(np.asarray([5, 7, 9]))
    assert not sys_.pt_valid[[5, 7, 9]].any()

    sl2 = sys_._alloc_points(10)              # only the 3 freed come back
    assert sorted(int(i) for i in sl2) == [5, 7, 9]
    # recycled slots are scrubbed of the previous tenant's observations
    assert (sys_.pt_obs_kf[sl2] == -1).all()
    assert (sys_.pt_obs_kp[sl2] == -1).all()
    assert (sys_.pt_obs_n[sl2] == 0).all()
    assert (sys_.pt_found[sl2] == 0).all()

    # boolean-mask variant
    m = np.zeros(P, bool)
    m[42] = True
    sys_._free_points(m)
    assert sys_._alloc_points(1)[0] == 42
