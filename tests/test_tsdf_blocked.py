"""Blocked (hierarchically-culled) TSDF must match the naive kernel exactly."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.tsdf import (
    TsdfVolume, tsdf_integrate, tsdf_integrate_blocked,
    tsdf_blocked_create, tsdf_blocked_to_dense,
)

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def _compare(depth, origin, c2w, dim=64, vs=0.02, tm=0.1, max_mixed=4096,
             tol_frac=0.0):
    """tol_frac: allowed fraction of voxels whose (u,v) rounds differently
    between the two arithmetic orderings (ULP-level pixel-boundary skew —
    relevant only when the depth image has sharp validity discontinuities)."""
    v1 = TsdfVolume.create(origin, np.eye(4, dtype=np.float32), dim=dim)
    v1 = tsdf_integrate(v1, jnp.asarray(depth), jnp.asarray(c2w), INTR,
                        voxel_size=vs, trunc_margin=tm)
    v2 = tsdf_blocked_create(origin, np.eye(4, dtype=np.float32), dim=dim,
                             block=8)
    v2 = tsdf_integrate_blocked(v2, jnp.asarray(depth), jnp.asarray(c2w), INTR,
                                voxel_size=vs, trunc_margin=tm, block=8,
                                max_mixed=max_mixed)
    v2 = tsdf_blocked_to_dense(v2, dim, 8)
    w_bad = np.abs(np.asarray(v2.weight) - np.asarray(v1.weight)) > 1e-5
    t_bad = np.abs(np.asarray(v2.tsdf) - np.asarray(v1.tsdf)) > 1e-4
    assert w_bad.mean() <= tol_frac, w_bad.mean()
    assert t_bad.mean() <= tol_frac, t_bad.mean()
    return v1, v2


def test_blocked_matches_naive_box_scene():
    scene = synth.make_box_scene(2, seed=9)
    depth, _ = synth.render_depth(scene, np.eye(4), CAM)
    depth[depth > 5.9] = 0.0
    _compare(depth, np.array([-0.7, -0.7, 1.2], np.float32),
             np.eye(4, dtype=np.float32))


def test_blocked_matches_naive_rotated_pose(rng):
    from semantic_slam_tpu.geometry import se3_exp
    scene = synth.make_box_scene(1, seed=10)
    Tcw = np.asarray(se3_exp(jnp.asarray([0.05, -0.02, 0.1, 0.1, -0.08, 0.05],
                                         jnp.float32)))
    Twc = np.linalg.inv(Tcw).astype(np.float32)
    depth, _ = synth.render_depth(scene, Twc, CAM)
    _compare(depth, np.array([-0.6, -0.6, 1.0], np.float32), Twc)


def test_blocked_matches_with_invalid_depth(rng):
    """Holes (depth=0) must classify conservatively, not as free space."""
    scene = synth.make_box_scene(2, seed=11)
    depth, _ = synth.render_depth(scene, np.eye(4), CAM)
    holes = rng.uniform(size=depth.shape) < 0.3
    depth = np.where(holes, 0.0, depth)
    _compare(depth, np.array([-0.7, -0.7, 1.2], np.float32),
             np.eye(4, dtype=np.float32), tol_frac=5e-4)


def test_blocked_volume_partially_outside_frustum():
    depth = np.full((CAM.height, CAM.width), 2.0, np.float32)
    # origin far off-axis: much of the volume projects outside the image
    _compare(depth, np.array([0.5, 0.5, 0.2], np.float32),
             np.eye(4, dtype=np.float32))


def test_masked_seq_matches_sequential_blocked(rng):
    """The accumulation-form sequence integrator (one (Σdist, n) fold at
    scan end — the GpuIntegrate update is a weighted running mean, so the
    result is order-invariant) must match T sequential blocked integrates
    to f32-association tolerance, including padding rows as no-ops."""
    from semantic_slam_tpu.geometry import se3_exp
    from semantic_slam_tpu.ops.tsdf import tsdf_integrate_masked_seq

    scene = synth.make_box_scene(2, seed=12)
    T_steps, dim = 4, 64
    origin = np.array([-0.7, -0.7, 1.2], np.float32)
    masks, depths, c2ws = [], [], []
    for i in range(T_steps):
        xi = rng.normal(size=6).astype(np.float32) * 0.03
        Tcw = np.asarray(se3_exp(jnp.asarray(xi)))
        Twc = np.linalg.inv(Tcw).astype(np.float32)
        depth, _ = synth.render_depth(scene, Twc, CAM)
        mask = rng.uniform(size=depth.shape) < 0.7
        masks.append(mask)
        depths.append(depth)
        c2ws.append(Twc)
    valid = np.array([True, True, True, False])   # last row = padding

    # reference: sequential per-frame blocked integrates
    v_ref = tsdf_blocked_create(origin, np.eye(4, dtype=np.float32),
                                dim=dim, block=8)
    for i in range(T_steps):
        if not valid[i]:
            continue
        md = np.where(masks[i], depths[i], 0.0).astype(np.float32)
        v_ref = tsdf_integrate_blocked(
            v_ref, jnp.asarray(md), jnp.asarray(c2ws[i]), INTR,
            voxel_size=0.02, trunc_margin=0.1, block=8, max_mixed=4096)

    v_seq = tsdf_blocked_create(origin, np.eye(4, dtype=np.float32),
                                dim=dim, block=8)
    v_seq = tsdf_integrate_masked_seq(
        v_seq, jnp.asarray(np.stack(masks)),
        jnp.asarray(np.stack(depths), jnp.float32),
        jnp.asarray(np.stack(c2ws)), jnp.asarray(valid), INTR,
        voxel_size=0.02, trunc_margin=0.1, block=8, max_mixed=4096)

    w_ref, w_seq = np.asarray(v_ref.weight), np.asarray(v_seq.weight)
    t_ref, t_seq = np.asarray(v_ref.tsdf), np.asarray(v_seq.tsdf)
    np.testing.assert_allclose(w_seq, w_ref, atol=1e-4)
    upd = w_ref > 0
    assert np.abs(t_seq - t_ref)[upd].max() < 1e-4
