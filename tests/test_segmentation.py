import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.normals import (
    backproject_organized, organized_normals, don_field,
)
from semantic_slam_tpu.ops.cluster import connected_components, compact_labels

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def test_normals_flat_wall():
    """Normals of a fronto-parallel wall must be (0, 0, ±1), flipped to +sum."""
    depth = np.full((120, 160), 2.0, np.float32)
    intr = Intrinsics(*[jnp.asarray(v, jnp.float32) for v in
                        (100.0, 100.0, 80.0, 60.0, 0, 0, 0, 0, 0)])
    pts, valid = backproject_organized(jnp.asarray(depth), intr)
    n, ok = organized_normals(pts, valid, 0.1, intr.fx)
    n = np.asarray(n)[10:-10, 10:-10]
    assert np.asarray(ok)[10:-10, 10:-10].all()
    # normal along z, sign-flipped so sum >= 0
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-2)
    assert (n.sum(-1) >= -1e-3).all()


def test_normals_sloped_plane():
    """45-degree plane z = 2 + x: normal must be (∓1, 0, ±1)/√2."""
    H, W = 120, 160
    intr = Intrinsics(*[jnp.asarray(v, jnp.float32) for v in
                        (100.0, 100.0, 80.0, 60.0, 0, 0, 0, 0, 0)])
    xs = (np.arange(W) - 80.0) / 100.0
    # z = 2 / (1 - x_n) gives world plane z = 2 + x  (x = x_n * z)
    depth = np.tile(2.0 / np.clip(1.0 - xs, 0.4, None), (H, 1)).astype(np.float32)
    pts, valid = backproject_organized(jnp.asarray(depth), intr)
    n, ok = organized_normals(pts, valid, 0.08, intr.fx)
    n = np.asarray(n)[30:-30, 40:-40]
    expected = np.array([-1.0, 0.0, 1.0]) / np.sqrt(2)
    dots = np.abs(n @ expected)
    assert np.percentile(dots, 10) > 0.98, np.percentile(dots, 10)


def test_don_magnitude_discriminates_edges():
    """DoN magnitude should be ~0 on flat regions and high near a box edge."""
    scene = synth.make_box_scene(1, seed=4)
    depth, inst = synth.render_depth(scene, np.eye(4), CAM)
    pts, valid = backproject_organized(jnp.asarray(depth), INTR)
    don, mag, ok = don_field(pts, valid, INTR.fx, 0.05, 0.5)
    mag = np.asarray(mag)
    inst_np = np.asarray(inst)
    # flat background far from any box: low magnitude
    bg = (inst_np < 0)
    from scipy.ndimage import binary_erosion
    bg_interior = binary_erosion(bg, iterations=40)
    box = binary_erosion(inst_np >= 0, iterations=3) & ~binary_erosion(
        inst_np >= 0, iterations=12)
    assert np.median(mag[bg_interior & np.asarray(ok)]) < 0.1
    # near box boundary (geometry change): higher magnitude
    assert np.median(mag[box & np.asarray(ok)]) > np.median(
        mag[bg_interior & np.asarray(ok)])


def test_connected_components_two_blobs():
    H, W = 64, 64
    pts = np.zeros((H, W, 3), np.float32)
    pts[..., 2] = 1.0
    pts[..., 0] = np.arange(W)[None, :] * 0.01
    pts[..., 1] = np.arange(H)[:, None] * 0.01
    mask = np.zeros((H, W), bool)
    mask[10:20, 10:20] = True
    mask[40:60, 40:60] = True
    labels = np.asarray(connected_components(jnp.asarray(pts),
                                             jnp.asarray(mask), 0.05))
    l1 = np.unique(labels[10:20, 10:20])
    l2 = np.unique(labels[40:60, 40:60])
    assert len(l1) == 1 and len(l2) == 1 and l1[0] != l2[0]
    assert (labels[~mask] == -1).all()


def test_connected_components_depth_discontinuity_splits():
    """Adjacent pixels with a 3-D gap beyond tolerance must not merge."""
    H, W = 32, 32
    pts = np.zeros((H, W, 3), np.float32)
    pts[..., 0] = np.arange(W)[None, :] * 0.01
    pts[:, :16, 2] = 1.0
    pts[:, 16:, 2] = 2.0   # 1 m jump at the column boundary
    mask = np.ones((H, W), bool)
    labels = np.asarray(connected_components(jnp.asarray(pts),
                                             jnp.asarray(mask), 0.05))
    assert len(np.unique(labels[:, :16])) == 1
    assert len(np.unique(labels[:, 16:])) == 1
    assert labels[0, 0] != labels[0, 20]


def test_compact_labels_size_gates():
    H, W = 64, 64
    pts = np.zeros((H, W, 3), np.float32)
    pts[..., 0] = np.arange(W)[None, :] * 0.01
    pts[..., 1] = np.arange(H)[:, None] * 0.01
    pts[..., 2] = 1.0
    mask = np.zeros((H, W), bool)
    mask[5:25, 5:25] = True        # 400 px
    mask[40:43, 40:43] = True      # 9 px -> below min_size 15
    labels = connected_components(jnp.asarray(pts), jnp.asarray(mask), 0.05)
    cid, sizes, n = compact_labels(labels, min_size=15, max_clusters=8)
    cid = np.asarray(cid)
    assert int(n) == 1
    assert int(np.asarray(sizes)[0]) == 400
    assert (cid[5:25, 5:25] == 0).all()
    assert (cid[40:43, 40:43] == -1).all()
