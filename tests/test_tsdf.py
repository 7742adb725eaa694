import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.tsdf import (
    TsdfVolume, tsdf_integrate, tsdf_integrate_batch, tsdf_surface_points,
    tsdf_integrate_reference, origin_from_depth,
)

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def test_integrate_matches_cuda_semantics_oracle(rng):
    D = 32
    depth = rng.uniform(0.5, 3.0, size=(48, 64)).astype(np.float32)
    depth[rng.uniform(size=depth.shape) < 0.2] = 0.0
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    intr = Intrinsics(*[jnp.asarray(v, jnp.float32) for v in
                        (60.0, 60.0, 32.0, 24.0, 0, 0, 0, 0, 0)])
    origin = np.array([-0.5, -0.5, 0.5], np.float32)
    base2world = np.eye(4, dtype=np.float32)
    cam2world = np.eye(4, dtype=np.float32)
    cam2world[:3, 3] = (0.05, -0.03, -0.1)
    vs, tm = 0.03, 0.15

    vol = TsdfVolume.create(origin, base2world, dim=D)
    vol = tsdf_integrate(vol, jnp.asarray(depth), jnp.asarray(cam2world), intr,
                         voxel_size=vs, trunc_margin=tm)

    ref_t = np.ones((D, D, D), np.float32)
    ref_w = np.zeros((D, D, D), np.float32)
    ref_t, ref_w = tsdf_integrate_reference(ref_t, ref_w, origin, base2world,
                                            depth, cam2world, K, vs, tm)
    # voxels projecting exactly onto pixel boundaries may round differently
    # between compilation paths; they must be a vanishing fraction and agree
    # everywhere else.
    w_ours = np.asarray(vol.weight)
    t_ours = np.asarray(vol.tsdf)
    w_boundary = np.abs(w_ours - ref_w) > 0
    t_boundary = np.abs(t_ours - ref_t) > 1e-4
    assert w_boundary.mean() < 0.01, w_boundary.mean()
    assert t_boundary.mean() < 0.01, t_boundary.mean()


def test_running_weighted_average():
    """Two integrations of walls at different depths: interior voxels hit both
    times must hold the mean of the two dist values (tsdf.cu:55-58 rule)."""
    D = 16
    vs, tm = 0.05, 0.25
    vol = TsdfVolume.create(np.array([-0.4, -0.4, 1.0], np.float32),
                            np.eye(4, dtype=np.float32), dim=D)
    d1 = np.full((CAM.height, CAM.width), 1.6, np.float32)
    d2 = np.full((CAM.height, CAM.width), 1.65, np.float32)
    vol = tsdf_integrate(vol, jnp.asarray(d1), jnp.eye(4), INTR,
                         voxel_size=vs, trunc_margin=tm)
    vol = tsdf_integrate(vol, jnp.asarray(d2), jnp.eye(4), INTR,
                         voxel_size=vs, trunc_margin=tm)
    w = np.asarray(vol.weight)
    t = np.asarray(vol.tsdf)
    # voxel plane z = 1.0 + 14*0.05 = 1.70 (behind both walls, inside trunc):
    # dist1 = (1.6-1.7)/0.25 = -0.4, dist2 = (1.65-1.7)/0.25 = -0.2 -> avg -0.3
    plane = 14
    sel = w[plane] == 2
    assert sel.any()
    np.testing.assert_allclose(t[plane][sel], -0.3, atol=1e-5)
    # voxel plane z = 1.20 (well in front, saturated): dist = 1 both times
    sel0 = w[4] == 2
    assert sel0.any()
    np.testing.assert_allclose(t[4][sel0], 1.0, atol=1e-6)


def test_surface_extraction_flat_wall():
    """Integrate a synthetic flat wall at depth 2m; extracted surface points
    must lie on that plane."""
    D = 64
    depth = np.full((CAM.height, CAM.width), 2.0, np.float32)
    vol = TsdfVolume.create(np.array([-1.0, -1.0, 1.0]), np.eye(4), dim=D)
    vs = 0.05
    for _ in range(3):
        vol = tsdf_integrate(vol, jnp.asarray(depth), jnp.eye(4), INTR,
                             voxel_size=vs, trunc_margin=5 * vs)
    pts, valid = tsdf_surface_points(vol, max_points=16384, voxel_size=vs,
                                     tsdf_thresh=0.25)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 100
    assert np.abs(pts[:, 2] - 2.0).max() < 2.5 * vs


def test_origin_from_depth_rule():
    depth = np.zeros((CAM.height, CAM.width), np.float32)
    depth[200:280, 300:400] = 1.5
    o = np.asarray(origin_from_depth(jnp.asarray(depth), INTR))
    # x_min at col 300, y_min at row 200, z_min = 1.5
    x_expect = (300 - CAM.cx) / CAM.fx * 1.5
    y_expect = (200 - CAM.cy) / CAM.fy * 1.5
    np.testing.assert_allclose(o, [x_expect, y_expect, 1.5], atol=1e-3)


def test_batched_objects_integrate(rng):
    """vmap over 4 per-object volumes with masked depths."""
    import jax
    D = 32
    scene = synth.make_box_scene(2, seed=3)
    Twc = np.eye(4, dtype=np.float32)
    depth, inst = synth.render_depth(scene, Twc, CAM)
    B = 4
    vols = jax.vmap(lambda i: TsdfVolume.create(
        jnp.asarray([-1.0, -1.0, 0.5]), jnp.eye(4), dim=D))(jnp.arange(B))
    masked = np.stack([np.where(inst == (b % 2), depth, 0.0) for b in range(B)])
    out = tsdf_integrate_batch(vols, jnp.asarray(masked), jnp.eye(4), INTR,
                               voxel_size=0.06, trunc_margin=0.3)
    w = np.asarray(out.weight)
    assert w.shape == (B, D, D, D)
    assert (w.reshape(B, -1).sum(1) > 0).all()
    # same mask -> same result; different mask -> different
    np.testing.assert_allclose(w[0], w[2])
    assert not np.allclose(w[0], w[1])
