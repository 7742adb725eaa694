"""Semantic engine end-to-end tests on synthetic box scenes (stage-2)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, EngineConfig, DonConfig, load_categories
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.semantic import Engine, OracleDetector
from semantic_slam_tpu.semantic import objects as O


def make_engine(scene, cam_cfg=None):
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                            min_area=25, max_area=250000, min_point_count=15,
                            prob_thd=0.5, min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1, segradius=0.05,
                      max_clusters=32))
    cats = load_categories()
    det = OracleDetector(scene, cfg.camera, max_masks=8)
    return Engine(cats, cfg, detector=det), det, cfg


def orbit_twc(n, **kw):
    import semantic_slam_tpu.geometry as G
    traj_tcw = synth.orbit_trajectory(n, **kw)
    return traj_tcw, np.asarray(G.se3_inverse(jnp.asarray(traj_tcw)))


def test_engine_creates_and_tracks_objects():
    scene = synth.make_box_scene(2, seed=21)
    eng, det, cfg = make_engine(scene)
    traj_tcw, traj_twc = orbit_twc(4, radius=0.25, look_at=(0, 0, 2.0))
    for i in range(len(traj_tcw)):
        depth, inst = synth.render_depth(scene, traj_twc[i], cfg.camera)
        dets = det.predict(traj_twc[i])
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i], detections=dets)

    objs = eng.objects_summary()
    # the engine should keep one instance per scene box (tracking re-finds
    # them, it does not spawn duplicates every keyframe)
    assert 1 <= len(objs) <= len(scene.boxes) + 1, objs
    labels = sorted(o["label"] for o in objs)
    assert set(labels) <= set(scene.labels.tolist())
    for o in objs:
        assert o["n_points"] > 15
        assert o["observations"] >= 2   # tracked across keyframes


def test_engine_object_points_on_box_surfaces():
    scene = synth.make_box_scene(1, seed=22)
    eng, det, cfg = make_engine(scene)
    traj_tcw, traj_twc = orbit_twc(3, radius=0.2, look_at=(0, 0, 2.0))
    for i in range(len(traj_tcw)):
        depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
        dets = det.predict(traj_twc[i])
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i], detections=dets)
    bank = eng.bank
    sel = np.asarray(bank.obj_valid)
    assert sel.any()
    o = np.nonzero(sel)[0][0]
    pts = np.asarray(bank.pt_xyz[o])[np.asarray(bank.pt_valid[o])]
    box = scene.boxes[0]
    # points must lie close to the box volume (surface samples)
    lo, hi = box[:3] - 0.05, box[3:] + 0.05
    inside = ((pts >= lo) & (pts <= hi)).all(axis=1)
    assert inside.mean() > 0.9, inside.mean()


def test_engine_probability_evolution():
    """Points must gain foreground evidence when re-observed inside masks."""
    scene = synth.make_box_scene(1, seed=23)
    eng, det, cfg = make_engine(scene)
    traj_tcw, traj_twc = orbit_twc(4, radius=0.15, look_at=(0, 0, 2.0))
    for i in range(len(traj_tcw)):
        depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
        dets = det.predict(traj_twc[i])
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i], detections=dets)
    bank = eng.bank
    o = np.nonzero(np.asarray(bank.obj_valid))[0][0]
    fg = np.asarray(bank.pt_fg[o])[np.asarray(bank.pt_valid[o])]
    prob = np.asarray(O.point_prob(bank))[o][np.asarray(bank.pt_valid[o])]
    # early points have been re-observed: fg > initial score for some
    assert (fg > 0.91).any()
    assert prob.mean() > 0.7


def test_engine_save_objects(tmp_path):
    scene = synth.make_box_scene(2, seed=24)
    eng, det, cfg = make_engine(scene)
    traj_tcw, traj_twc = orbit_twc(3, radius=0.2, look_at=(0, 0, 2.0))
    for i in range(len(traj_tcw)):
        depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
        dets = det.predict(traj_twc[i])
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i], detections=dets)
    out = tmp_path / "objects"
    eng.save_objects(str(out))
    files = sorted(os.listdir(out))
    txts = [f for f in files if f.endswith(".txt")]
    assert len(txts) >= 1
    # SaveToFile format: "label score" then xyz rows
    with open(out / txts[0]) as f:
        header = f.readline().split()
        assert len(header) == 2
        row = f.readline().split()
        assert len(row) == 3
    assert "objects.ply" in files
    # loadObject.m-parity reader roundtrips the same file
    from semantic_slam_tpu.semantic.inventory import load_object_points

    label, score, xyz = load_object_points(str(out / txts[0]))
    assert label == header[0] and abs(score - float(header[1])) < 1e-9
    assert xyz.ndim == 2 and xyz.shape[1] == 3 and len(xyz) >= 1
    assert np.allclose(xyz[0], [float(v) for v in row])
