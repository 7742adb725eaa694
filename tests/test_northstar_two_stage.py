"""Two-stage north star: SLAM -> text export -> fresh reload -> Engine.

The reference's defining shape is TWO binaries exchanging text files:
``rgbd_tum`` runs ORB-SLAM2 and exports the optimized map
(``examples/rgbd_tum.cpp:134-138`` -> ``System.cc:884-1120``), then
``label_instance_rgbd`` reloads it in a fresh process
(``examples/label_instance_rgbd.cpp:54-55`` -> ``src/Utility.cpp:63-101``)
and runs the semantic Engine over the loaded keyframes. This test proves the
same contract end-to-end ON OUR OWN STAGE-1 OUTPUT (the fixture-based tests
only exercise the reader against the reference's files):

  stage 1: SLAM over a synthetic RGB-D sequence (features from a point
           scene; the same world also contains labeled boxes),
           export bundle/coords/camera_graph/frame_id;
  stage 2: reload the text files through ``io.mapio`` (no SlamSystem),
           drive the Engine over the loaded keyframes using the loaded
           (ESTIMATED) poses and depth/masks rendered at ground truth —
           exactly the stage-2 driver's data path;
  assert:  keyframe/point counts roundtrip, coords re-attach keypoints,
           every box yields an object with the right label whose
           probability-gated centroid lands inside the (inflated) box.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import (DonConfig, EngineConfig, MapConfig,
                                      OrbConfig, SlamConfig, load_categories)
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import mapio, synth
from semantic_slam_tpu.semantic import Engine, OracleDetector
from semantic_slam_tpu.slam.system import FrameInput, SlamSystem


def test_two_stage_own_output(tmp_path):
    cfg = dataclasses.replace(
        SlamConfig(),
        map=MapConfig(max_keyframes=64, max_points=8192,
                      max_kp_per_frame=512, max_obs_per_point=8),
        orb=OrbConfig(n_features=512),
        engine=EngineConfig(max_objects=8, max_points_per_object=1024,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=4.0),
        don=DonConfig(max_clusters=16))
    cam = cfg.camera

    # one world: SLAM feature points + labeled boxes for the engine
    feat_scene = synth.make_scene(3000, extent=3.0, depth_center=2.0, seed=7)
    box_scene = synth.make_box_scene(2, seed=61)
    traj = synth.orbit_trajectory(48, radius=0.6, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj)))

    # ---- stage 1: SLAM + reference-format export ----------------------
    sys_ = SlamSystem(cfg)
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(feat_scene, Tcw_gt, cam, max_kp=512,
                            px_noise=0.3, depth_noise=0.003, bit_flips=6,
                            seed=300 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"],
            depth=obs["depth"], timestamp=float(i) / cam.fps))
    assert sys_.state == "OK" and sys_.n_kf >= 4
    out = str(tmp_path)
    sys_.save_map(os.path.join(out, "bundle.txt"))
    sys_.save_coords(os.path.join(out, "coords.txt"))
    sys_.save_camera_graph(os.path.join(out, "camera_graph.txt"))
    sys_.save_frame_ids(os.path.join(out, "frame_id.txt"))
    n_kf_exported = int(sys_.kf_valid.sum())
    n_pt_exported = int(sys_.pt_valid.sum())
    del sys_   # stage 2 must not touch live SLAM state

    # ---- stage 2: fresh reload through mapio (the driver's load path) --
    m = mapio.read_bundle(os.path.join(out, "bundle.txt"))
    assert m.num_keyframes() == n_kf_exported
    assert m.num_points() == n_pt_exported
    m = mapio.read_coords(os.path.join(out, "coords.txt"), m)
    m = mapio.read_camera_graph(os.path.join(out, "camera_graph.txt"), m)
    assert int(np.asarray(m.kf_kp_valid).sum()) > 0, "coords re-attach"
    assert int((np.asarray(m.covis_w) > 0).sum()) > 0, "covis reload"
    frame_ids = mapio.read_frame_ids(os.path.join(out, "frame_id.txt"))
    kf_ids = m.valid_kf_indices()
    assert len(frame_ids) == len(kf_ids)

    det = OracleDetector(box_scene, cam, max_masks=8)
    eng = Engine(load_categories(), cfg, detector=det)
    poses = np.asarray(m.kf_pose)
    for k, fid in zip(kf_ids, frame_ids):
        fid = int(fid)
        depth, _ = synth.render_depth(box_scene, traj_twc[fid], cam)
        dets = det.predict(traj_twc[fid])
        # loaded ESTIMATED pose + ground-truth-rendered pixels: exactly the
        # reference stage-2 contract (images from disk, poses from bundle)
        eng.run(None, depth, kf_id=int(k), Tcw=poses[k], detections=dets)
    eng.flush()

    objs = eng.objects_summary()
    assert len(objs) >= len(box_scene.labels), objs
    # every box reconstructed: right label, centroid inside inflated box
    from semantic_slam_tpu.semantic import objects as O
    bank = eng.bank
    prob = np.asarray(O.point_prob(bank))
    for b in range(len(box_scene.labels)):
        want = int(box_scene.labels[b])
        lo, hi = box_scene.boxes[b, :3], box_scene.boxes[b, 3:]
        found = False
        for o in objs:
            if o["label"] != want:
                continue
            sl = o["slot"]
            good = (np.asarray(bank.pt_valid[sl])
                    & (prob[sl] >= cfg.engine.prob_thd))
            if good.sum() < cfg.engine.min_point_count:
                continue
            c = np.asarray(bank.pt_xyz[sl])[good].mean(0)
            if np.all(c >= lo - 0.15) and np.all(c <= hi + 0.15):
                found = True
                break
        assert found, (f"box {b} (label {want}, bounds {lo}..{hi}) not "
                       f"reconstructed: {objs}")

    # Inventory export (the ~Inventory SaveToFile contract) roundtrips
    eng.save_objects(str(tmp_path / "objects"))
    from semantic_slam_tpu.semantic.inventory import load_object_points
    files = [f for f in os.listdir(tmp_path / "objects")
             if f.endswith(".txt")]
    assert files
    _, score, xyz = load_object_points(str(tmp_path / "objects" / files[0]))
    assert 0.0 < score <= 1.0 and xyz.shape[0] > 0
