"""Keyframe-DP stage-2: the sharded engine chunk equals the single-device
chunk (VERDICT r4 #2 — DP over keyframes in the REAL pipeline, not just a
library; SURVEY §2.3 names stage-2 keyframe DP as the primary scale-out
axis, replacing the reference's sequential per-keyframe loop
``examples/label_instance_rgbd.cpp:77-110``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import (DonConfig, EngineConfig, SlamConfig,
                                      load_categories)
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.parallel.mesh import make_mesh
from semantic_slam_tpu.semantic import Engine, OracleDetector


def _cfg():
    return dataclasses.replace(
        SlamConfig(),
        engine=EngineConfig(max_objects=16, max_points_per_object=1024,
                            min_area=25, max_area=250000,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                      segradius=0.05, max_clusters=16))


def _frames(cfg, n_kf=8):
    scene = synth.make_box_scene(3, seed=5)
    det = OracleDetector(scene, cfg.camera, max_masks=8)
    traj_tcw = synth.orbit_trajectory(n_kf, radius=0.3, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
    frames = []
    for i in range(n_kf):
        d, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
        frames.append((i, d, traj_tcw[i], det.predict(traj_twc[i])))
    return frames


def test_chunk_sharded_equals_single_device():
    cfg = _cfg()
    frames = _frames(cfg, n_kf=8)

    eng1 = Engine(load_categories(), cfg)
    eng1.run_chunk(frames)                      # single-device chunk
    eng8 = Engine(load_categories(), cfg)
    mesh = make_mesh(8)
    eng8.run_chunk(frames, mesh=mesh)           # 8-way keyframe DP

    b1, b8 = eng1.bank, eng8.bank
    # discrete outcomes bit-identical (slot assignment, creation order,
    # match decisions, densified point counts, insert-or-delete)
    for f in ("obj_valid", "obj_label", "obj_created", "pt_n", "pt_valid"):
        np.testing.assert_array_equal(np.asarray(getattr(b1, f)),
                                      np.asarray(getattr(b8, f)), err_msg=f)
    # float state identical up to reduction order (psum tree vs flat sum)
    np.testing.assert_allclose(np.asarray(b1.pt_xyz), np.asarray(b8.pt_xyz),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1.pt_fg), np.asarray(b8.pt_fg),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1.pt_bg), np.asarray(b8.pt_bg),
                               atol=1e-4)
    assert int(np.asarray(b1.obj_valid).sum()) >= 1

    # packs drive identical host bookkeeping
    eng1.flush()
    eng8.flush()
    assert sorted(eng1.inventory.obs.keys()) == sorted(
        eng8.inventory.obs.keys())
    for k in eng1.inventory.obs:
        assert len(eng1.inventory.obs[k]) == len(eng8.inventory.obs[k])


def test_chunk_approximates_sequential():
    """Chunk-snapshot semantics must land the same objects as the
    sequential engine when the scene is static (identity outcomes may
    differ only for objects first seen mid-chunk)."""
    cfg = _cfg()
    frames = _frames(cfg, n_kf=8)

    seq = Engine(load_categories(), cfg)
    for kf_id, d, tcw, dets in frames:
        seq.run(None, d, kf_id=kf_id, Tcw=tcw, detections=dets)
    seq.flush()
    chk = Engine(load_categories(), cfg)
    chk.run_chunk(frames[:4])
    chk.run_chunk(frames[4:])
    chk.flush()

    labs_seq = sorted(o["label"] for o in seq.objects_summary())
    labs_chk = sorted(o["label"] for o in chk.objects_summary())
    assert labs_seq == labs_chk, (labs_seq, labs_chk)
