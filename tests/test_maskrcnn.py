"""Mask R-CNN model tests: contract shapes, NMS, ROIAlign, loss gradients.

Small image sizes keep CPU runtime sane; shapes are fully dynamic in H/W.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.models.heads import roi_align, paste_masks
from semantic_slam_tpu.models.rpn import (
    box_iou, decode_boxes, encode_boxes, level_anchors, nms,
)


def test_box_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(50, 200, size=(40, 4)), jnp.float32)
    boxes = jnp.stack([
        anchors[:, 0] - 20, anchors[:, 1] - 10,
        anchors[:, 0] + 25, anchors[:, 1] + 30], -1)
    deltas = encode_boxes(anchors, boxes)
    rec = decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-3)


def test_box_iou_oracle():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [10, 10, 20, 20]], jnp.float32)
    iou = np.asarray(box_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(iou[1, 1], 25.0 / 175.0, atol=1e-5)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep_idx, keep_valid = nms(boxes, scores, jnp.ones(3, bool),
                               iou_thresh=0.5, max_out=3)
    kept = set(np.asarray(keep_idx)[np.asarray(keep_valid)].tolist())
    assert kept == {0, 2}


def test_roi_align_constant_region():
    feat = jnp.zeros((32, 32, 2))
    feat = feat.at[8:16, 8:16, 0].set(5.0)
    out = roi_align(feat, jnp.asarray([[8.0, 8.0, 16.0, 16.0]]), 4, 1.0)
    np.testing.assert_allclose(np.asarray(out)[0, 1:3, 1:3, 0], 5.0, atol=1e-4)


def test_paste_masks_box_coverage():
    m = jnp.ones((1, 28, 28))
    pasted = paste_masks(m, jnp.asarray([[10.0, 20.0, 30.0, 40.0]]), 64, 64)
    p = np.asarray(pasted)[0]
    assert p[30, 20] > 0.9       # inside box
    assert p[10, 50] == 0.0      # outside


def test_level_anchors_count():
    a = level_anchors((8, 8), 4, 32.0)
    assert a.shape == (8 * 8 * 3, 4)
    # centers at (stride/2 + i*stride)
    assert float(a[0, 0]) == 2.0 and float(a[0, 1]) == 2.0


def test_model_inference_and_loss_small():
    """Forward + loss + gradient flow on a tiny 64x64 image (structure test;
    random weights)."""
    from semantic_slam_tpu.models.maskrcnn import MaskRCNN, init_params

    model = MaskRCNN(pre_nms=64, post_nms=16, roi_samples=8)
    img = jnp.asarray(np.random.RandomState(0).uniform(0, 255, (64, 64, 3)),
                      jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(params, img)
    n_det = min(32, model.post_nms)
    assert out["boxes"].shape == (n_det, 4)
    assert out["masks"].shape == (n_det, 64, 64)
    assert out["labels"].shape == (n_det,)

    gt_boxes = jnp.asarray([[10.0, 10.0, 40.0, 40.0]] * 4)
    gt_labels = jnp.asarray([57] * 4)
    gt_masks = jnp.zeros((4, 64, 64)).at[:, 12:38, 12:38].set(1.0)
    gt_valid = jnp.asarray([True, False, False, False])

    def loss_fn(p):
        return model.apply(p, img, gt_boxes, gt_labels, gt_masks, gt_valid,
                           method=MaskRCNN.loss)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0.0
