"""Debug-overlay render parity tests (MaskRCNN/DoN show2d + Engine display —
reference src/MaskRCNN.cpp:619-650, src/DoN.cpp:462-527,
src/Engine.cpp:687-753)."""

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.semantic.detector import Detections
from semantic_slam_tpu.semantic.objects import ObjectBank
from semantic_slam_tpu.viz import (render_clusters, render_detections,
                                   render_object_overlay)

H, W = 48, 64
CATEGORIES = {1: "person", 62: "chair"}


def _square_mask(y0, x0, s):
    m = np.zeros((H, W), bool)
    m[y0:y0 + s, x0:x0 + s] = True
    return m


def test_render_detections_draws_contour_and_text():
    masks = np.stack([_square_mask(10, 10, 12), _square_mask(25, 40, 10)])
    dets = Detections(
        boxes=np.array([[10, 10, 12, 12], [40, 25, 10, 10]], np.float32),
        masks=masks, labels=np.array([1, 62], np.int32),
        scores=np.array([0.95, 0.85], np.float32),
        valid=np.array([True, True]))
    base = np.zeros((H, W, 3), np.uint8)
    img = render_detections(base, dets, CATEGORIES)
    assert img.shape == (H, W, 3)
    # contour pixels painted, interior untouched
    assert (img[10, 10:22] != 0).any()
    assert (img[16, 16] == 0).all()
    # some text pixels appeared above the first bbox area
    assert (img[:10] != 0).any()
    # invalid detection draws nothing
    dets0 = dets._replace(valid=np.array([False, False]))
    assert (render_detections(base, dets0, CATEGORIES) == 0).all()


def test_render_clusters_colors_each_cluster_distinctly():
    cid = np.full((H, W), -1, np.int32)
    cid[5:15, 5:15] = 0
    cid[30:40, 30:40] = 3
    img = render_clusters(None, cid)
    c0 = img[10, 10].copy()
    c3 = img[35, 35].copy()
    assert (c0 != c3).any()                       # distinct colors
    assert (img[0, 0] == 18).all()                # background untouched
    # deterministic
    assert (render_clusters(None, cid)[10, 10] == c0).all()


def test_render_object_overlay_gates_points():
    bank = ObjectBank.empty(2, 8)
    # object 0: 3 points in front of the camera at z=2, one behind, one
    # low-probability
    xyz = np.zeros((2, 8, 3), np.float32)
    xyz[0, 0] = (0.0, 0.0, 2.0)
    xyz[0, 1] = (0.2, 0.1, 2.0)
    xyz[0, 2] = (0.0, 0.0, -1.0)      # behind camera -> gated
    xyz[0, 3] = (0.1, 0.0, 2.0)      # low prob -> gated
    valid = np.zeros((2, 8), bool)
    valid[0, :4] = True
    fg = np.zeros((2, 8), np.float32)
    bg = np.zeros((2, 8), np.float32)
    fg[0, :3] = 1.0
    bg[0, 3] = 1.0
    import dataclasses
    bank = dataclasses.replace(
        bank,
        obj_valid=jnp.array([True, False]),
        obj_label=jnp.array([1, -1], jnp.int32),
        obj_color=jnp.array([[1.0, 0.2, 0.2], [0, 0, 0]], jnp.float32),
        pt_xyz=jnp.asarray(xyz), pt_valid=jnp.asarray(valid),
        pt_fg=jnp.asarray(fg), pt_bg=jnp.asarray(bg),
        pt_n=jnp.array([4, 0], jnp.int32))
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    mask = _square_mask(12, 20, 16)
    img = render_object_overlay(
        bank, 0, mask, np.eye(4), K, CATEGORIES, prob_thd=0.5,
        min_depth=0.1, max_depth=5.0)
    color = (np.array([1.0, 0.2, 0.2]) * 255).astype(np.uint8)
    # principal-point projection of point 0 painted in the object color
    assert (img[H // 2, W // 2] == color).all()
    # mask contour painted
    assert (img[12, 20] == color).all()
    # tighten max_depth below 2 m: projected points disappear
    img2 = render_object_overlay(
        bank, 0, mask, np.eye(4), K, CATEGORIES, prob_thd=0.5,
        min_depth=0.1, max_depth=1.0)
    assert not (img2[H // 2, W // 2] == color).all()


def test_render_frame_tracked_features(tmp_path):
    from semantic_slam_tpu.viz.renderer import render_frame

    uv = np.array([[50.0, 40.0], [100.0, 80.0], [630.0, 470.0],
                   [1.0, 1.0]], np.float32)
    valid = np.array([True, True, True, False])
    matched = np.array([True, False, True, True])
    img = render_frame(None, uv, valid, matched, "OK", n_kf=3, n_pt=120,
                       n_inliers=42, width=640, height=480,
                       path=str(tmp_path / "frame.png"))
    assert img.shape == (480, 640, 3)
    green = np.array([40, 220, 60], np.uint8)
    blue = np.array([70, 120, 255], np.uint8)
    assert (img[40 - 2, 50 - 2:50 + 3] == green).all()     # matched box
    assert (img[80 - 2, 100 - 2:100 + 3] == blue).all()    # unmatched box
    # invalid keypoint (index 3) leaves its area untouched
    assert (img[1, 1] == img[5, 300]).all()
    assert (tmp_path / "frame.png").exists()


def test_system_render_current_frame():
    import dataclasses
    from semantic_slam_tpu.config import SlamConfig, MapConfig
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.slam.system import SlamSystem, FrameInput

    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=8, max_points=2048,
                                    max_kp_per_frame=256, max_obs_per_point=4))
    sys_ = SlamSystem(cfg)
    scene = synth.make_scene(800, extent=3.0, depth_center=2.0, seed=5)
    traj = synth.orbit_trajectory(4, radius=0.3, look_at=(0, 0, 2.0))
    for i, Tcw in enumerate(traj):
        obs = synth.observe(scene, Tcw, cfg.camera, max_kp=256, seed=i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"],
            depth=obs["depth"], timestamp=float(i)))
    img = sys_.render_current_frame()
    assert img.shape == (cfg.camera.height, cfg.camera.width, 3)
    green = np.array([40, 220, 60], np.uint8)
    assert (img.reshape(-1, 3) == green).all(-1).any()  # some matched boxes
