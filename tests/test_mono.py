"""Monocular SLAM: two-view initializer + full mono tracking.

The reference supports monocular input through ORB-SLAM2's
``System::TrackMonocular`` (``include/ORB_SLAM2/System.h:64-68,85-90``).
These tests validate the TPU-native equivalent: batched-RANSAC two-view
reconstruction (slam/initializer.py), triangulation-based map growth, and
up-to-scale trajectory accuracy on a synthetic sequence.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_slam_tpu.config import SlamConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.initializer import two_view_init, accept_init
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput


@pytest.fixture(scope="module")
def cam_cfg():
    return SlamConfig()


def _project(pts_w, Tcw, cam):
    pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-9) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-9) + cam.cy
    vis = (z > 0.1) & (u > 0) & (u < cam.width) & (v > 0) & (v < cam.height)
    return np.stack([u, v], -1).astype(np.float32), vis


def _two_views(cam, planar=False, n=300, noise=0.4, seed=3):
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-1.5, 1.5, (n, 3))
    pts[:, 2] = 0.0 if planar else rs.uniform(-0.8, 0.8, n)
    pts[:, 2] += 3.0
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    # camera 2: translated + slightly rotated
    th = 0.05
    T2[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)],
                           [0, 1, 0],
                           [-np.sin(th), 0, np.cos(th)]], np.float32)
    T2[:3, 3] = [-0.3, 0.02, 0.05]
    uv1, v1 = _project(pts, T1, cam)
    uv2, v2 = _project(pts, T2, cam)
    uv1 += rs.normal(0, noise, uv1.shape)
    uv2 += rs.normal(0, noise, uv2.shape)
    return pts, T1, T2, uv1, uv2, (v1 & v2)


def test_two_view_init_recovers_pose(cam_cfg):
    cam = cam_cfg.camera
    intr = Intrinsics.from_config(cam)
    pts, T1, T2, uv1, uv2, valid = _two_views(cam)
    res = two_view_init(intr, jnp.asarray(uv1), jnp.asarray(uv2),
                        jnp.asarray(valid))
    assert accept_init(res, int(valid.sum()))
    R = np.asarray(res.R)
    t = np.asarray(res.t)
    # ground-truth relative pose cam1 -> cam2 (T1 = I): R2, t2
    R_gt = T2[:3, :3]
    t_gt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
    assert np.abs(np.trace(R.T @ R_gt) - 3.0) < 1e-2        # < ~4.7 deg
    assert np.dot(t, t_gt) > 0.995                           # direction
    # triangulated structure matches GT up to the recovered scale
    good = np.asarray(res.good)
    assert int(res.n_good) > 0.7 * valid.sum()
    scale = np.linalg.norm(T2[:3, 3])                        # |t| was unit
    err = np.linalg.norm(np.asarray(res.pts1)[good] * scale - pts[good],
                         axis=-1)
    assert np.median(err) < 0.05


def test_two_view_init_reconstructs_planar(cam_cfg):
    """Pure-plane scene WITH baseline: the Faugeras homography branch
    (upstream Initializer::ReconstructH) must recover the true motion —
    the 8-point E is degenerate on coplanar points, so this exercises the
    family selection by triangulation support."""
    cam = cam_cfg.camera
    intr = Intrinsics.from_config(cam)
    _, _, T2, uv1, uv2, valid = _two_views(cam, planar=True)
    R_gt, t_gt = T2[:3, :3], T2[:3, 3]
    res = two_view_init(intr, jnp.asarray(uv1), jnp.asarray(uv2),
                        jnp.asarray(valid))
    assert accept_init(res, int(valid.sum()))
    R = np.asarray(res.R)
    ang = np.degrees(np.arccos(np.clip((np.trace(R @ R_gt.T) - 1) / 2,
                                       -1, 1)))
    t_est = np.asarray(res.t)
    t_dir = t_gt / np.linalg.norm(t_gt)
    assert ang < 1.5, f"planar R error {ang} deg"
    assert abs(float(t_est @ t_dir)) > 0.98


def test_two_view_init_rejects_pure_rotation(cam_cfg):
    """No baseline => no parallax: must not initialize."""
    cam = cam_cfg.camera
    intr = Intrinsics.from_config(cam)
    rs = np.random.RandomState(7)
    pts = rs.uniform(-1.5, 1.5, (300, 3))
    pts[:, 2] += 3.0
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    th = 0.06
    T2[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                           [-np.sin(th), 0, np.cos(th)]], np.float32)
    uv1, v1 = _project(pts, T1, cam)
    uv2, v2 = _project(pts, T2, cam)
    uv1 += rs.normal(0, 0.4, uv1.shape)
    uv2 += rs.normal(0, 0.4, uv2.shape)
    res = two_view_init(intr, jnp.asarray(uv1), jnp.asarray(uv2),
                        jnp.asarray(v1 & v2))
    assert not accept_init(res, int((v1 & v2).sum()))


def _mono_frame(scene, Tcw, cam, i):
    obs = synth.observe(scene, Tcw, cam, max_kp=512, seed=i,
                        px_noise=0.3, drop=0.05)
    return FrameInput(uv=obs["uv"], level=obs["level"],
                      desc_u8=obs["desc_u8"], desc_pm1=obs["desc_pm1"],
                      valid=obs["valid"],
                      depth=np.zeros(len(obs["uv"]), np.float32),
                      timestamp=float(i) / 30.0)


def test_mono_slam_end_to_end():
    """Synthetic orbit: mono system must initialize from two views, grow the
    map by triangulation, and track with small up-to-scale ATE."""
    from semantic_slam_tpu.io.evaluate import ate_rmse

    cfg = SlamConfig()
    sys_ = SlamSystem(cfg)
    sys_.mono = True
    scene = synth.make_scene(1500, seed=11)
    traj = synth.orbit_trajectory(40, radius=0.9, look_at=(0, 0, 3.0), seed=2)
    for i, Tcw in enumerate(traj):
        sys_.track_features(_mono_frame(scene, Tcw, cfg.camera, i))
    assert sys_.state == "OK"
    assert sys_.n_kf >= 2
    assert int(sys_.pt_valid.sum()) > 100
    est = np.stack([np.linalg.inv(T)[:3, 3] for _, T in sys_.trajectory])
    gt = np.stack([np.linalg.inv(T)[:3, 3] for T in traj])
    # skip pre-init identity frames
    first = next(i for i, (_, T) in enumerate(sys_.trajectory)
                 if not np.allclose(T, np.eye(4)))
    ate = ate_rmse(est[first:], gt[first:], with_scale=True)
    span = np.linalg.norm(gt.max(0) - gt.min(0))
    assert ate < 0.05 * span, f"mono ATE {ate:.4f} vs span {span:.3f}"


def test_mono_triangulation_grows_map():
    """Map point count must grow beyond the two-view seed."""
    cfg = SlamConfig()
    sys_ = SlamSystem(cfg)
    sys_.mono = True
    scene = synth.make_scene(1500, seed=13)
    traj = synth.orbit_trajectory(30, radius=0.9, look_at=(0, 0, 3.0), seed=4)
    seeded = None
    for i, Tcw in enumerate(traj):
        sys_.track_features(_mono_frame(scene, Tcw, cfg.camera, i))
        if sys_.state == "OK" and seeded is None:
            seeded = int(sys_.pt_valid.sum())
    assert seeded is not None
    assert int(sys_.pt_valid.sum()) > seeded
    # all mono points must carry >= 2 observations (triangulated, not depth)
    live = sys_.pt_valid
    assert (sys_.pt_obs_n[live] >= 2).all()
