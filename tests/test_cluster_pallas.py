"""Pallas connected-components kernel vs the XLA segmented-scan path."""

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.ops.cluster import connected_components
from semantic_slam_tpu.ops.cluster_pallas import connected_components_pallas


def _grid_pts(H, W, spacing=0.01):
    pts = np.zeros((H, W, 3), np.float32)
    pts[..., 0] = np.arange(W)[None, :] * spacing
    pts[..., 1] = np.arange(H)[:, None] * spacing
    pts[..., 2] = 1.0
    return pts


def test_pallas_cc_matches_xla_blobs():
    H, W = 48, 160
    pts = _grid_pts(H, W)
    mask = np.zeros((H, W), bool)
    mask[5:20, 10:40] = True          # blob A
    mask[25:40, 60:100] = True        # blob B
    mask[8, 45:60] = True             # bridge near A (disconnected from A)
    a = connected_components(jnp.asarray(pts), jnp.asarray(mask), 0.02)
    b = connected_components_pallas(jnp.asarray(pts), jnp.asarray(mask),
                                    0.02, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_cc_spiral():
    """Winding component (worst case for sweep counts) still converges."""
    H, W = 32, 128
    pts = _grid_pts(H, W)
    mask = np.zeros((H, W), bool)
    # serpentine: alternating full rows joined at alternating ends
    for r in range(2, 30, 4):
        mask[r, 2:-2] = True
    for i, r in enumerate(range(2, 26, 4)):
        col = -3 if i % 2 == 0 else 2
        mask[r:r + 5, col] = True
    a = connected_components(jnp.asarray(pts), jnp.asarray(mask), 0.02)
    b = connected_components_pallas(jnp.asarray(pts), jnp.asarray(mask),
                                    0.02, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # one serpentine => exactly one component label among masked pixels
    labs = np.unique(np.asarray(b)[mask])
    assert len(labs) == 1


def test_pallas_cc_distance_tolerance_split():
    """Adjacent pixels farther than the tolerance must not merge."""
    H, W = 16, 128
    pts = _grid_pts(H, W, spacing=0.01)
    pts[:, 64:, 2] += 0.5             # depth step splits left/right halves
    mask = np.ones((H, W), bool)
    b = connected_components_pallas(jnp.asarray(pts), jnp.asarray(mask),
                                    0.02, interpret=True)
    b = np.asarray(b)
    assert (b[:, :64] == b[0, 0]).all()
    assert (b[:, 64:] == b[0, 64]).all()
    assert b[0, 0] != b[0, 64]
