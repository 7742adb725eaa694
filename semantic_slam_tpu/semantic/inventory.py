"""Inventory: global registry of labeled objects + persistence.

Replaces ``src/Inventory.cpp`` (mutex-guarded Object*/KeyFrame* sets whose
destructor dumps per-object point files). Here the geometric state lives in
the ObjectBank arrays; the inventory keeps the per-observation host metadata
(observing keyframes, bounding boxes, contour Hu moments — the bookkeeping
of ``Object::AddKeyFrame/AddObservation/AddContour/AddBoundingBox``) and the
savers (``Object::SaveToFile`` format: "label score" header then xyz rows of
good points, ``src/Object.cpp:105-136``; plus PLY export).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from semantic_slam_tpu.config import SlamConfig


class Inventory:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.keyframes: List[int] = []
        self.kf_poses: Dict[int, np.ndarray] = {}
        # per object-slot observation history
        self.obs: Dict[int, List[dict]] = {}

    def add_keyframe(self, kf_id: int, Tcw: np.ndarray):
        if kf_id not in self.kf_poses:
            self.keyframes.append(kf_id)
            self.kf_poses[kf_id] = np.asarray(Tcw).copy()

    def observe(self, slot: int, kf_id: int, label: int, score: float,
                bbox=None, hu=None, centroid=None):
        self.obs.setdefault(slot, []).append(dict(
            kf=kf_id, label=label, score=score,
            bbox=None if bbox is None else np.asarray(bbox),
            hu=None if hu is None else np.asarray(hu),
            centroid=None if centroid is None else np.asarray(centroid)))

    def observations_of(self, slot: int) -> int:
        return len(self.obs.get(slot, []))

    def drop(self, slot: int):
        self.obs.pop(slot, None)

    # ------------------------------------------------------------------

    def save_objects(self, bank, categories: Dict[int, str], prob_thd: float,
                     out_dir: str):
        """Per-object text files (Object::SaveToFile parity: filename
        ``<label><idx>``, header ``label score``, xyz rows of points whose
        probability clears the threshold) + a combined PLY."""
        os.makedirs(out_dir, exist_ok=True)
        from semantic_slam_tpu.io.native import write_ply
        from semantic_slam_tpu.semantic.objects import point_prob

        prob = np.asarray(point_prob(bank))
        valid = np.asarray(bank.pt_valid)
        xyz = np.asarray(bank.pt_xyz)
        colors = np.asarray(bank.obj_color)
        all_pts, all_rgb = [], []
        count = 0
        for o in np.nonzero(np.asarray(bank.obj_valid))[0]:
            label = categories.get(int(bank.obj_label[o]), "object")
            score = float(bank.obj_score[o])
            good = valid[o] & (prob[o] >= prob_thd)
            pts = xyz[o][good]
            path = os.path.join(out_dir, f"{label}{count}.txt")
            with open(path, "w") as f:
                f.write(f"{label} {score:.6f}\n")
                for p in pts:
                    f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            count += 1
            all_pts.append(pts)
            all_rgb.append(np.tile((colors[o] * 255).astype(np.uint8),
                                   (len(pts), 1)))
        if all_pts:
            write_ply(os.path.join(out_dir, "objects.ply"),
                      np.concatenate(all_pts), np.concatenate(all_rgb))


def load_object_points(path: str):
    """Read one saved object file back: (label, score, xyz [N, 3]).

    Parity with the reference's MATLAB analysis reader
    (``src/matlab/loadObject.m:1-26``, which feeds ``txt2mat.m``): header
    line ``label score`` followed by whitespace xyz rows — the exact
    ``Object::SaveToFile`` format (``src/Object.cpp:105-136``)."""
    with open(path) as f:
        header = f.readline().split()
    # Object::SaveToFile writes msLabel verbatim, so a label containing a
    # space produces >2 header tokens — the score is always the LAST token
    *label_parts, score = header
    label, score = " ".join(label_parts), float(score)
    xyz = np.loadtxt(path, skiprows=1, dtype=np.float64).reshape(-1, 3)
    return label, score, xyz
