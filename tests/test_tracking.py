import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics, se3_exp, se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.io.evaluate import ate_rmse
from semantic_slam_tpu.slam.tracking import pose_optimize, track_with_map

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def test_pose_optimize_recovers_pose(rng):
    """Perturb a ground-truth pose; GN must pull it back from exact matches."""
    scene = synth.make_scene(400, seed=3)
    Tcw_gt = synth.orbit_trajectory(10)[5]
    obs = synth.observe(scene, Tcw_gt, CAM, px_noise=0.0, bit_flips=0, seed=1)
    lid = obs["landmark_id"]
    valid = obs["valid"] & (lid >= 0)
    pts_w = scene.pts_w[np.clip(lid, 0, None)]
    xi = rng.normal(size=(6,)) * np.array([0.05, 0.05, 0.05, 0.02, 0.02, 0.02])
    Tcw0 = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ Tcw_gt
    res = pose_optimize(INTR, jnp.asarray(Tcw0), jnp.asarray(pts_w),
                        jnp.asarray(obs["uv"]), jnp.asarray(valid),
                        jnp.ones((len(valid),)))
    err_t = np.linalg.norm(np.asarray(res.Tcw)[:3, 3] - Tcw_gt[:3, 3])
    assert err_t < 1e-3
    assert int(res.n_inliers) > 100


def test_pose_optimize_robust_to_outliers(rng):
    scene = synth.make_scene(400, seed=4)
    Tcw_gt = synth.orbit_trajectory(10)[2]
    obs = synth.observe(scene, Tcw_gt, CAM, px_noise=0.5, bit_flips=0, seed=2)
    lid = obs["landmark_id"]
    valid = obs["valid"] & (lid >= 0)
    pts_w = scene.pts_w[np.clip(lid, 0, None)].copy()
    # corrupt 25% of the correspondences with wrong 3D points
    n = valid.sum()
    bad = rng.choice(np.nonzero(valid)[0], size=n // 4, replace=False)
    pts_w[bad] += rng.normal(0, 1.0, size=(len(bad), 3))
    Tcw0 = Tcw_gt.copy()
    Tcw0[:3, 3] += 0.03
    res = pose_optimize(INTR, jnp.asarray(Tcw0), jnp.asarray(pts_w),
                        jnp.asarray(obs["uv"]), jnp.asarray(valid),
                        jnp.ones((len(valid),)))
    err_t = np.linalg.norm(np.asarray(res.Tcw)[:3, 3] - Tcw_gt[:3, 3])
    assert err_t < 5e-3
    # outliers detected
    assert (~np.asarray(res.inliers)[bad]).mean() > 0.9


def test_track_with_map_sequence():
    """Localization-only tracking along a trajectory against a fixed synthetic
    map: the minimum end-to-end slice (SURVEY.md §7.3) — per-frame ATE must be
    at sub-centimeter level."""
    scene = synth.make_scene(1500, seed=5)
    traj = synth.orbit_trajectory(25)
    pt_xyz = jnp.asarray(scene.pts_w)
    pt_desc = jnp.asarray(scene.desc_pm1)
    pt_valid = jnp.ones((len(scene.pts_w),), bool)

    est = []
    Tcw_prev = jnp.asarray(traj[0])
    vel = jnp.eye(4)
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, CAM, max_kp=512, px_noise=0.3,
                            bit_flips=10, seed=100 + i)
        Tcw_pred = vel @ Tcw_prev
        res = track_with_map(
            INTR, Tcw_pred, pt_xyz, pt_desc, pt_valid,
            jnp.asarray(obs["uv"]), jnp.asarray(obs["desc_pm1"]),
            jnp.asarray(obs["valid"]), jnp.asarray(obs["level"]),
            CAM.width, CAM.height, radius=20.0, max_dist=60)
        assert int(res.n_inliers) > 50, f"frame {i}: {int(res.n_inliers)} inliers"
        vel = res.Tcw @ np.asarray(se3_inverse(Tcw_prev))
        Tcw_prev = res.Tcw
        est.append(np.asarray(res.Tcw))

    est = np.stack(est)
    est_twc = np.asarray(se3_inverse(jnp.asarray(est)))
    gt_twc = np.asarray(se3_inverse(jnp.asarray(traj)))
    err = ate_rmse(est_twc[:, :3, 3], gt_twc[:, :3, 3], align=False)
    assert err < 0.01, f"ATE {err}"
