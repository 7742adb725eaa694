import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.ops.stereo import stereo_depth
from semantic_slam_tpu.semantic.ground import fit_ground_plane, segment_ground

CAM = CameraConfig()


def test_stereo_depth_recovers_z(rng):
    """Synthetic rectified stereo: right keypoints = left shifted by bf/z."""
    n = 200
    z = rng.uniform(1.0, 20.0, n).astype(np.float32)
    uv_l = rng.uniform(120, 500, (n, 2)).astype(np.float32)
    disp = CAM.bf / z
    uv_r = uv_l.copy()
    uv_r[:, 0] -= disp
    uv_r[:, 1] += rng.normal(0, 0.3, n)  # rectification noise
    bits = rng.integers(0, 2, (n, 256)).astype(bool)
    d_l = np.where(bits, 1, -1).astype(np.int8)
    d_r = d_l.copy()
    for i in range(n):
        f = rng.choice(256, 10, replace=False)
        d_r[i, f] *= -1
    valid = jnp.ones(n, bool)
    lvl = jnp.zeros(n, jnp.int32)
    depth, res = stereo_depth(jnp.asarray(uv_l), jnp.asarray(d_l), valid,
                              jnp.asarray(uv_r), jnp.asarray(d_r), valid,
                              lvl, lvl, jnp.float32(CAM.bf))
    depth = np.asarray(depth)
    matched = depth > 0
    assert matched.mean() > 0.9
    rel = np.abs(depth[matched] - z[matched]) / z[matched]
    assert np.median(rel) < 0.02


def test_ground_plane_fit(rng):
    """Flat ground at y=+1.73 (camera down) + objects above it."""
    n_g, n_o = 2000, 500
    gx = rng.uniform(-10, 10, n_g)
    gz = rng.uniform(2, 30, n_g)
    gy = np.full(n_g, 1.73) + rng.normal(0, 0.03, n_g)
    ground = np.stack([gx, gy, gz], -1)
    ox = rng.uniform(-5, 5, n_o)
    oz = rng.uniform(5, 20, n_o)
    oy = rng.uniform(-1.0, 1.2, n_o)      # above ground (smaller y = higher)
    objs = np.stack([ox, oy, oz], -1)
    pts = jnp.asarray(np.concatenate([ground, objs]), jnp.float32)
    valid = jnp.ones(len(pts), bool)
    res = fit_ground_plane(pts, valid)
    is_g = np.asarray(res.is_ground)
    assert is_g[:n_g].mean() > 0.95          # ground recalled
    assert is_g[n_g:].mean() < 0.05          # objects kept
    # normal close to the y axis
    assert abs(float(res.normal[1])) > 0.99

    seg = np.asarray(segment_ground(pts, valid, n_segments=3))
    assert seg[:n_g].mean() > 0.9
