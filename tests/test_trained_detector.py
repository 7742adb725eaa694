"""The flagship semantic capability with TRAINED weights: the shipped
Mask R-CNN checkpoint (trained in-framework on procedural shape scenes,
tools/train_maskrcnn.py) must produce real detections that drive the
semantic engine to the same object maps the oracle does.

Reference contract: maskrcnn-benchmark R-50-FPN with pretrained weights,
score-sorted, confidence >= 0.8, COCO-81 ids (``src/MaskRCNN.py.in``,
bridge ``src/MaskRCNN.cpp:452-520``).
"""

import dataclasses
import os

import numpy as np
import pytest

from semantic_slam_tpu.config import (DonConfig, EngineConfig, SlamConfig,
                                      load_categories)
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.semantic import Engine, OracleDetector
from semantic_slam_tpu.semantic.detector import (MaskRCNNDetector,
                                                 default_checkpoint_path)

pytestmark = pytest.mark.skipif(
    not os.path.exists(default_checkpoint_path()),
    reason="shipped checkpoint missing")


def test_full_checkpoint_meets_raised_bars():
    """The CONTRACT-SIZE R-50-FPN checkpoint (models/maskrcnn.py defaults,
    the reference's MaskRCNN.py.in architecture; 44M params, trained by
    tools/train_maskrcnn.py --variant full) at the round-3 acceptance bars:
    frac IoU>=0.7 must be >= 0.85 and label accuracy >= 0.9 on held-out
    scenes at the 0.8 confidence gate."""
    from semantic_slam_tpu.semantic.detector import full_checkpoint_path

    if not os.path.exists(full_checkpoint_path()):
        pytest.skip("full-size checkpoint missing")
    cam = half_cam()
    det = MaskRCNNDetector(max_masks=8,
                           checkpoint_path=full_checkpoint_path())
    assert det.infer_hw == (240, 320)
    assert sum(x.size for x in __import__("jax").tree_util.tree_leaves(
        det.params)) > 40e6, "not the contract-size architecture"
    rs = np.random.RandomState(424242)
    ious, labels_ok, n_gt = [], [], 0
    for t in range(4):
        scene = synth.make_shape_scene(3, seed=50_000 + t)
        Twc = synth.random_viewpoint(rs)
        _, inst = synth.render_scene(scene, Twc, cam)
        rgb = synth.render_rgb_textured(scene, Twc, cam, seed=t)
        out = det.predict(rgb)
        for b in range(len(scene.labels)):
            gt = inst == b
            if gt.sum() < 100:
                continue
            n_gt += 1
            best, best_lab = 0.0, False
            for m in range(len(out.labels)):
                if not out.valid[m]:
                    continue
                iou = _gt_iou(out.masks[m], gt)
                if iou > best:
                    best = iou
                    best_lab = int(out.labels[m]) == int(scene.labels[b])
            ious.append(best)
            labels_ok.append(best_lab)
    assert n_gt >= 6
    ious = np.asarray(ious)
    assert (ious >= 0.7).mean() >= 0.85, ious
    assert np.mean(labels_ok) >= 0.9, labels_ok


def half_cam():
    from semantic_slam_tpu.config import CameraConfig

    return CameraConfig(fx=267.7, fy=269.6, cx=160.05, cy=123.8,
                        width=320, height=240)


def _gt_iou(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = (pred & gt).sum()
    union = (pred | gt).sum()
    return inter / max(union, 1)


def test_checkpoint_detections_iou70_at_train_res():
    """Held-out scenes at the training resolution: the 0.8-confidence
    detections must cover the ground truth at IoU >= 0.7 with correct
    labels (the VERDICT round-2 acceptance bar)."""
    cam = half_cam()
    det = MaskRCNNDetector(max_masks=8)
    assert det.infer_hw == (240, 320)
    rs = np.random.RandomState(424242)
    ious, labels_ok, n_gt = [], [], 0
    for t in range(4):
        scene = synth.make_shape_scene(3, seed=10_000 + t)
        Twc = synth.random_viewpoint(rs)
        _, inst = synth.render_scene(scene, Twc, cam)
        rgb = synth.render_rgb_textured(scene, Twc, cam, seed=t)
        out = det.predict(rgb)
        for b in range(len(scene.labels)):
            gt = inst == b
            if gt.sum() < 100:
                continue
            n_gt += 1
            best, best_lab = 0.0, False
            for m in range(len(out.labels)):
                if not out.valid[m]:
                    continue
                iou = _gt_iou(out.masks[m], gt)
                if iou > best:
                    best = iou
                    best_lab = int(out.labels[m]) == int(scene.labels[b])
            ious.append(best)
            labels_ok.append(best_lab)
    assert n_gt >= 6
    ious = np.asarray(ious)
    assert (ious >= 0.7).mean() >= 0.7, ious
    assert np.mean(labels_ok) >= 0.8, labels_ok


def test_checkpoint_detections_at_full_res():
    """640x480 frames (the TUM camera) go through the 2x mean-pool path;
    masks/boxes scale back to full resolution."""
    cfg = SlamConfig()
    cam = cfg.camera
    det = MaskRCNNDetector(max_masks=8)
    rs = np.random.RandomState(77)
    scene = synth.make_shape_scene(2, seed=20_001)
    Twc = synth.random_viewpoint(rs)
    _, inst = synth.render_scene(scene, Twc, cam)
    rgb = synth.render_rgb_textured(scene, Twc, cam, seed=1)
    out = det.predict(rgb)
    assert out.masks.shape[1:] == (cam.height, cam.width)
    hits = 0
    for b in range(len(scene.labels)):
        gt = inst == b
        if gt.sum() < 400:
            continue
        best = max((_gt_iou(out.masks[m], gt)
                    for m in range(len(out.labels)) if out.valid[m]),
                   default=0.0)
        if best >= 0.5:
            hits += 1
    assert hits >= 1


def test_engine_driven_by_trained_model_matches_oracle():
    """Replace OracleDetector with the trained MaskRCNNDetector end-to-end:
    the engine must still build an object map with the scene's labels."""
    import jax.numpy as jnp

    from semantic_slam_tpu.geometry import se3_inverse

    scene = synth.make_shape_scene(2, seed=31_337)
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                            min_area=25, max_area=250000, min_point_count=15,
                            prob_thd=0.5, min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                      segradius=0.05, max_clusters=32))
    cats = load_categories()
    traj_tcw = synth.orbit_trajectory(3, radius=0.2, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))

    det = MaskRCNNDetector(max_masks=8)
    oracle = OracleDetector(scene, cfg.camera, max_masks=8)
    eng = Engine(cats, cfg)
    eng_o = Engine(cats, cfg)
    for i in range(len(traj_tcw)):
        depth, _ = synth.render_scene(scene, traj_twc[i], cfg.camera)
        rgb = synth.render_rgb_textured(scene, traj_twc[i], cfg.camera,
                                        seed=i)
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i],
                detections=det.predict(rgb))
        eng_o.run(None, depth, kf_id=i, Tcw=traj_tcw[i],
                  detections=oracle.predict(traj_twc[i]))

    objs = eng.objects_summary()
    objs_o = eng_o.objects_summary()
    assert objs, "trained detector produced no engine objects"
    labels = {o["label"] for o in objs}
    labels_o = {o["label"] for o in objs_o}
    assert labels <= set(scene.labels.tolist())
    # the trained model finds the same object categories the oracle does
    assert labels == labels_o, (labels, labels_o)
    for o in objs:
        assert o["n_points"] > 15
