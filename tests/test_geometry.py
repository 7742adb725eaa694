import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.geometry import (
    se3_exp, se3_log, so3_exp, so3_log, se3_inverse, transform_points,
    sim3_exp, sim3_log, sim3_inverse, sim3_compose,
    Intrinsics, project, backproject, undistort_points,
    fundamental_from_poses,
)
from semantic_slam_tpu.config import CameraConfig


def random_twists(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, jnp.float32)


def test_so3_exp_log_roundtrip(rng):
    phi = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
    R = so3_exp(phi)
    # orthonormality
    err = jnp.abs(R @ jnp.swapaxes(R, -1, -2) - jnp.eye(3)).max()
    assert err < 1e-5
    phi2 = so3_log(R)
    np.testing.assert_allclose(np.asarray(so3_exp(phi2)), np.asarray(R), atol=1e-4)


def test_so3_small_angle(rng):
    phi = jnp.asarray(rng.normal(size=(8, 3)) * 1e-6, jnp.float32)
    R = so3_exp(phi)
    np.testing.assert_allclose(np.asarray(so3_log(R)), np.asarray(phi), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = random_twists(rng, 32)
    T = se3_exp(xi)
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(se3_exp(xi2)), np.asarray(T), atol=1e-4)


def test_se3_inverse(rng):
    T = se3_exp(random_twists(rng, 16))
    I = T @ se3_inverse(T)
    np.testing.assert_allclose(np.asarray(I), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5)


def test_transform_points(rng):
    T = se3_exp(random_twists(rng, 4))
    pts = jnp.asarray(rng.normal(size=(4, 100, 3)), jnp.float32)
    out = transform_points(T, pts)
    ref = (np.einsum("bij,bnj->bni", np.asarray(T[:, :3, :3]), np.asarray(pts))
           + np.asarray(T[:, :3, 3])[:, None])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sim3_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
    S = sim3_exp(xi)
    S2 = sim3_exp(sim3_log(S))
    np.testing.assert_allclose(np.asarray(S2), np.asarray(S), atol=1e-3)
    I = sim3_compose(S, sim3_inverse(S))
    np.testing.assert_allclose(np.asarray(I), np.tile(np.eye(4), (16, 1, 1)), atol=1e-4)


def test_project_backproject_rgbd(rng):
    intr = Intrinsics.from_config(CameraConfig())
    uv = jnp.asarray(rng.uniform(10, 600, size=(200, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(200,)), jnp.float32)
    pts = backproject(intr, uv, depth, sensor=2)
    uv2, z = project(intr, pts)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-5)


def test_backproject_lidar_range(rng):
    """Lidar: stored value is range; |backprojected point| == range."""
    intr = Intrinsics.from_config(CameraConfig())
    uv = jnp.asarray(rng.uniform(10, 600, size=(50, 2)), jnp.float32)
    rng_vals = jnp.asarray(rng.uniform(2.0, 30.0, size=(50,)), jnp.float32)
    pts = backproject(intr, uv, rng_vals, sensor=1)
    norms = jnp.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), np.asarray(rng_vals), rtol=1e-5)


def test_undistort_roundtrip(rng):
    cam = CameraConfig(k1=0.1, k2=-0.05, p1=0.001, p2=-0.002)
    intr = Intrinsics.from_config(cam)
    # generate ideal points, distort, then undistort back
    uv_ideal = jnp.asarray(rng.uniform(100, 500, size=(100, 2)), jnp.float32)
    x = (uv_ideal[:, 0] - intr.cx) / intr.fx
    y = (uv_ideal[:, 1] - intr.cy) / intr.fy
    from semantic_slam_tpu.geometry.camera import distort
    xd, yd = distort(intr, x, y)
    uv_dist = jnp.stack([intr.fx * xd + intr.cx, intr.fy * yd + intr.cy], -1)
    uv_rec = undistort_points(intr, uv_dist, iters=8)
    np.testing.assert_allclose(np.asarray(uv_rec), np.asarray(uv_ideal), atol=0.05)


def test_fundamental_epipolar_constraint(rng):
    """x2' F12 x1 = 0 for corresponding points (F maps cam1 pts to cam2 lines)."""
    intr = Intrinsics.from_config(CameraConfig())
    K = intr.K
    T1 = se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32))
    T2 = se3_exp(jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32))
    pts_w = jnp.asarray(rng.uniform(-1, 1, size=(50, 3)), jnp.float32)
    pts_w = pts_w.at[:, 2].add(5.0)
    c1 = transform_points(T1, pts_w[None])[0]
    c2 = transform_points(T2, pts_w[None])[0]
    uv1, _ = project(intr, c1)
    uv2, _ = project(intr, c2)
    # reference convention (Engine.cpp:644-657): F12 = F(KF1=current, KF2=other)
    # satisfies x1^T F12 x2 = 0
    F12 = fundamental_from_poses(K, T1, T2)
    h1 = jnp.concatenate([uv1, jnp.ones((50, 1))], -1)
    h2 = jnp.concatenate([uv2, jnp.ones((50, 1))], -1)
    resid = jnp.einsum("ni,ij,nj->n", h1, F12, h2)
    assert float(jnp.abs(resid).max()) < 1e-2
