"""Trajectory evaluation: ATE / RPE metrics and quaternion helpers.

The reference has no evaluation code (quality was assessed externally against
the ORB-SLAM2 paper numbers); this module makes the BASELINE.md accuracy
targets (TUM fr3_office ATE RMSE, KITTI rel. translation/rotation) first-class
and testable.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM convention."""
    R = np.asarray(R, dtype=np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity alignment dst ~ s * R @ src + t (Umeyama)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var_s
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, align: bool = True,
             with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after (optional) SE3/Sim3 alignment."""
    if align:
        R, t, s = umeyama_alignment(est_xyz, gt_xyz, with_scale=with_scale)
        est_xyz = (s * (R @ est_xyz.T)).T + t
    err = est_xyz - gt_xyz
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over pose pairs spaced by `delta` frames.

    Returns (trans_rmse, rot_rmse_deg). Poses are [N, 4, 4] camera-to-world.
    """
    n = len(est_poses) - delta
    terr = np.zeros(n)
    rerr = np.zeros(n)
    for i in range(n):
        de = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        dg = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        e = np.linalg.inv(dg) @ de
        terr[i] = np.linalg.norm(e[:3, 3])
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerr[i] = np.degrees(np.arccos(c))
    return float(np.sqrt((terr ** 2).mean())), float(np.sqrt((rerr ** 2).mean()))


def read_trajectory_tum(path: str):
    """Read TUM trajectory -> (times [N], poses_twc [N,4,4])."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    times = data[:, 0]
    poses = np.tile(np.eye(4), (len(data), 1, 1))
    for i, row in enumerate(data):
        poses[i, :3, :3] = quat_to_rotmat(row[4:8])
        poses[i, :3, 3] = row[1:4]
    return times, poses
