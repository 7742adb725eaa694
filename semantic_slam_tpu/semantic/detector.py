"""Instance-segmentation detector interface.

The reference's detection contract (``src/MaskRCNN.py.in`` + the C++ bridge
``src/MaskRCNN.cpp``): per image, score-sorted {boxes, masks, labels,
scores ≥ 0.8} over the 81 COCO categories. Implementations:

  - ``MaskRCNNDetector`` — the Flax Mask R-CNN in models/ (TPU inference).
  - ``OracleDetector`` — ground-truth masks from synthetic instance renders
    (the test/benchmark substrate; no dataset or weights needed).

All return padded static-shape arrays with a validity mask.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class Detections(NamedTuple):
    boxes: np.ndarray    # [M, 4] (x, y, w, h) float32
    masks: np.ndarray    # [M, H, W] bool — host np OR device jnp (the
                         # MaskRCNNDetector fast path keeps masks on device;
                         # consumers that need host pixels np.asarray them)
    labels: np.ndarray   # [M] int32 COCO category id
    scores: np.ndarray   # [M] float32
    valid: np.ndarray    # [M] bool (host)


def pad_detections(boxes, masks, labels, scores, max_masks: int) -> Detections:
    M = len(labels)
    H, W = masks.shape[1:] if M > 0 else (0, 0)
    order = np.argsort(-np.asarray(scores)) if M else np.array([], int)
    boxes, masks = np.asarray(boxes)[order], np.asarray(masks)[order]
    labels, scores = np.asarray(labels)[order], np.asarray(scores)[order]
    m = min(M, max_masks)
    out_boxes = np.zeros((max_masks, 4), np.float32)
    out_masks = np.zeros((max_masks,) + tuple(masks.shape[1:]), bool)
    out_labels = np.zeros(max_masks, np.int32)
    out_scores = np.zeros(max_masks, np.float32)
    out_valid = np.zeros(max_masks, bool)
    out_boxes[:m] = boxes[:m]
    out_masks[:m] = masks[:m]
    out_labels[:m] = labels[:m]
    out_scores[:m] = scores[:m]
    out_valid[:m] = True
    return Detections(out_boxes, out_masks, out_labels, out_scores, out_valid)


class OracleDetector:
    """Detections from a synthetic instance-id render (io/synth.BoxScene)."""

    def __init__(self, scene, cam, max_masks: int = 16, score: float = 0.9):
        self.scene = scene
        self.cam = cam
        self.max_masks = max_masks
        self.score = score

    def predict(self, Twc: np.ndarray) -> Detections:
        from semantic_slam_tpu.io import synth

        _, inst = synth.render_depth(self.scene, Twc, self.cam)
        boxes, masks, labels, scores = [], [], [], []
        for b in range(len(self.scene.labels)):
            m = inst == b
            if m.sum() < 4:
                continue
            ys, xs = np.nonzero(m)
            boxes.append([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                          ys.max() - ys.min() + 1])
            masks.append(m)
            labels.append(int(self.scene.labels[b]))
            scores.append(self.score)
        if not masks:
            H, W = inst.shape
            return pad_detections(np.zeros((0, 4)), np.zeros((0, H, W), bool),
                                  np.zeros(0, int), np.zeros(0), self.max_masks)
        return pad_detections(boxes, np.stack(masks), labels, scores,
                              self.max_masks)


def default_checkpoint_path() -> str:
    import os

    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "maskrcnn_synth.npz")


def full_checkpoint_path() -> str:
    """The contract-size R-50-FPN checkpoint (models/maskrcnn.py defaults —
    the reference's MaskRCNN.py.in architecture), trained in-framework on
    the synth curriculum (tools/train_maskrcnn.py --variant full)."""
    import os

    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "maskrcnn_full.npz")


def _model_for_checkpoint(path):
    """Pick the architecture variant recorded in the checkpoint's meta json
    (written by tools/train_maskrcnn.py); synth-compact when absent."""
    import json
    import os

    from semantic_slam_tpu.models.maskrcnn import MaskRCNN

    meta_path = path.replace(".npz", "_meta.json")
    variant = "synth"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            variant = json.load(f).get("variant", "synth")
    return MaskRCNN() if variant == "full" else MaskRCNN.synth()


class MaskRCNNDetector:
    """Flax Mask R-CNN inference wrapper (models/maskrcnn.py).

    Output contract parity with the reference bridge: score threshold 0.8,
    score-sorted, COCO-81 ids (``src/MaskRCNN.py.in``). By default loads the
    shipped compact checkpoint trained in-framework on the procedural shape
    scenes (tools/train_maskrcnn.py) — this environment has no COCO weights.
    The checkpoint is trained at 240x320; inputs at an integer multiple of
    that are mean-pooled down and the detections scaled back up."""

    def __init__(self, model=None, params=None, max_masks: int = 16,
                 score_threshold: float = 0.8, rng_seed: int = 0,
                 checkpoint_path=None):
        import os

        import jax

        from semantic_slam_tpu.io.checkpoint import load_params
        from semantic_slam_tpu.models.maskrcnn import MaskRCNN, init_params

        self.infer_hw = None
        if model is None and params is None:
            path = checkpoint_path or default_checkpoint_path()
            if os.path.exists(path):
                model = _model_for_checkpoint(path)
                params = load_params(path)
                self.infer_hw = (240, 320)
        self.model = model or MaskRCNN()
        if params is None:
            params = init_params(self.model, jax.random.PRNGKey(rng_seed))
        self.params = params
        self.max_masks = max_masks
        self.score_threshold = score_threshold
        self._infer = None

    def predict(self, rgb: np.ndarray, device_masks: bool = True) -> Detections:
        """Detections for one image.

        device_masks=True (default): masks stay ON DEVICE (jnp bool
        [M, H, W]) and only the small fields come back to the host in ONE
        batched device_get — the remote-transport-friendly contract (the
        engine consumes device masks directly). device_masks=False restores
        the all-NumPy legacy contract (host masks, score-compacted rows).
        """
        import jax
        import jax.numpy as jnp

        from semantic_slam_tpu.models.maskrcnn import run_inference_fullres

        rgb = np.asarray(rgb)
        H, W = rgb.shape[:2]
        pool = 1
        if self.infer_hw is not None:
            th, tw = self.infer_hw
            if H % th == 0 and W % tw == 0 and (H // th) == (W // tw):
                pool = H // th
        out = run_inference_fullres(
            self.model, self.params, jnp.asarray(rgb, jnp.uint8),
            max_detections=self.max_masks, pool=pool)
        boxes, labels, scores, valid = jax.device_get(
            [out["boxes"], out["labels"], out["scores"], out["valid"]])
        scores = scores * valid
        keep = scores >= self.score_threshold      # rows stay score-sorted
        if device_masks:
            return Detections(boxes=boxes.astype(np.float32),
                              masks=out["masks"], labels=labels,
                              scores=scores.astype(np.float32), valid=keep)
        masks = np.asarray(out["masks"])
        return pad_detections(boxes[keep], masks[keep], labels[keep],
                              scores[keep], self.max_masks)


class AsyncDetector:
    """Worker-thread detection pipeline (in-order results).

    Parity with the reference's (dormant) MaskRCNN worker-queue mode —
    ``InsertImage`` enqueues a frame, a ``Run()`` thread drains the queue
    through the model, results are consumed in submission order
    (``src/MaskRCNN.cpp:367-446``, queue + mMutexNewImages). Here the queue
    is bounded and deterministic: ``submit()`` blocks when `queue_size`
    frames are in flight, ``result()`` blocks until the oldest submitted
    frame is done — so a driver can run detection for keyframe i+1 while
    the engine processes keyframe i.
    """

    def __init__(self, detector, queue_size: int = 2):
        import queue
        import threading

        self._detector = detector
        self._in: "queue.Queue" = queue.Queue(maxsize=max(1, queue_size))
        self._out: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # --- worker (the reference's Run() loop) ----------------------------
    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                return
            args, kwargs = item
            try:
                self._out.put(("ok", self._detector.predict(*args, **kwargs)))
            except Exception as e:  # surfaced on result()
                self._out.put(("err", e))

    # --- client API ------------------------------------------------------
    def submit(self, *args, **kwargs):
        """Enqueue one frame (InsertImage). Blocks when the queue is full."""
        self._in.put((args, kwargs))

    def result(self) -> Detections:
        """Detections of the oldest submitted frame (blocks until ready)."""
        status, payload = self._out.get()
        if status == "err":
            raise payload
        return payload

    def close(self):
        """Stop the worker (SetFinish/isFinished protocol equivalent)."""
        if self._thread.is_alive():
            self._in.put(None)
            self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
