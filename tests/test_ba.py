import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics, se3_exp
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.ba import BAProblem, bundle_adjust

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def make_ba_problem(rng, n_cams=8, n_pts=300, obs_per_pt=6, px_noise=0.3,
                    pose_pert=0.02, pt_pert=0.02):
    scene = synth.make_scene(n_pts, seed=7)
    traj = synth.orbit_trajectory(n_cams)
    pts = scene.pts_w

    obs_kf = np.full((n_pts, obs_per_pt), -1, np.int32)
    obs_uv = np.zeros((n_pts, obs_per_pt, 2), np.float32)
    obs_w = np.zeros((n_pts, obs_per_pt), np.float32)
    for p in range(n_pts):
        cams = rng.choice(n_cams, size=obs_per_pt, replace=False)
        for o, k in enumerate(cams):
            R, t = traj[k][:3, :3], traj[k][:3, 3]
            pc = R @ pts[p] + t
            if pc[2] < 0.2:
                continue
            u = CAM.fx * pc[0] / pc[2] + CAM.cx
            v = CAM.fy * pc[1] / pc[2] + CAM.cy
            if not (0 < u < CAM.width and 0 < v < CAM.height):
                continue
            obs_kf[p, o] = k
            obs_uv[p, o] = (u + rng.normal(0, px_noise), v + rng.normal(0, px_noise))
            obs_w[p, o] = 1.0

    # Two fixed cameras: one pins SE3 gauge, the second pins the monocular
    # scale gauge (a single fixed camera leaves global scale about its center
    # unobservable — BA can slide along it under outliers).
    pose0 = traj.copy()
    for k in range(2, n_cams):
        xi = rng.normal(size=6) * pose_pert
        pose0[k] = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32))) @ pose0[k]
    pts0 = pts + rng.normal(0, pt_pert, pts.shape).astype(np.float32)

    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[:2] = True
    prob = BAProblem(
        kf_pose=jnp.asarray(pose0), pt_xyz=jnp.asarray(pts0),
        obs_kf=jnp.asarray(obs_kf), obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.asarray(obs_w), cam_fixed=jnp.asarray(cam_fixed),
        pt_valid=jnp.ones((n_pts,), bool))
    return prob, traj, pts


def test_ba_converges(rng):
    prob, traj_gt, pts_gt = make_ba_problem(rng)
    res = bundle_adjust(INTR, prob, iters=12)
    assert float(res.cost) < float(res.initial_cost) * 0.05
    pose_err = np.linalg.norm(
        np.asarray(res.kf_pose)[:, :3, 3] - traj_gt[:, :3, 3], axis=1)
    assert pose_err.max() < 0.01, pose_err
    # only points that are actually constrained (>=2 observations); the
    # expected depth error at 0.3px noise with this baseline/depth ratio is
    # ~1 cm (triangulation noise floor), not the perturbation scale.
    observed = (np.asarray(prob.obs_w) > 0).sum(1) >= 2
    pt_err = np.linalg.norm(np.asarray(res.pt_xyz) - pts_gt, axis=1)
    assert np.median(pt_err[observed]) < 0.02


def test_ba_respects_fixed_cameras(rng):
    prob, traj_gt, _ = make_ba_problem(rng)
    res = bundle_adjust(INTR, prob, iters=8)
    np.testing.assert_allclose(np.asarray(res.kf_pose[0]), traj_gt[0], atol=1e-7)


def test_ba_robust_to_outlier_observations(rng):
    prob, traj_gt, pts_gt = make_ba_problem(rng)
    # corrupt 10% of observations with 50px offsets
    obs_uv = np.asarray(prob.obs_uv).copy()
    w = np.asarray(prob.obs_w)
    live = np.argwhere(w > 0)
    bad = live[rng.choice(len(live), size=len(live) // 10, replace=False)]
    obs_uv[bad[:, 0], bad[:, 1]] += rng.normal(0, 50, size=(len(bad), 2))
    prob = prob._replace(obs_uv=jnp.asarray(obs_uv))
    res = bundle_adjust(INTR, prob, iters=15)
    pose_err = np.linalg.norm(
        np.asarray(res.kf_pose)[:, :3, 3] - traj_gt[:, :3, 3], axis=1)
    assert pose_err.max() < 2e-2, pose_err
