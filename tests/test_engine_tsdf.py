"""Per-object TSDF reconstruction through the engine (opt-in path)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, EngineConfig, DonConfig, TsdfConfig, load_categories
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.semantic import Engine, OracleDetector


def test_engine_tsdf_reconstruction(tmp_path):
    scene = synth.make_box_scene(1, seed=61)
    cfg = dataclasses.replace(
        SlamConfig(),
        engine=EngineConfig(max_objects=8, max_points_per_object=1024,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
        don=DonConfig(max_clusters=16),
        tsdf=TsdfConfig(dim=64, voxel_size=0.02))
    cats = load_categories()
    det = OracleDetector(scene, cfg.camera, max_masks=4)
    eng = Engine(cats, cfg, detector=det, enable_tsdf=True)

    traj_tcw = synth.orbit_trajectory(3, radius=0.2, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
    for i in range(len(traj_tcw)):
        depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
        dets = det.predict(traj_twc[i])
        eng.run(None, depth, kf_id=i, Tcw=traj_tcw[i], detections=dets)

    eng.flush()     # TSDF integrates are deferred to the flush boundary
    assert len(eng.tsdf_vols) >= 1
    oidx, vol = next(iter(eng.tsdf_vols.items()))
    w = np.asarray(vol.weight)
    assert (w > 0).any()

    # surface export: points near the box
    eng.save_tsdf_surfaces(str(tmp_path))
    import os
    plys = [f for f in os.listdir(tmp_path) if f.startswith("tsdf")]
    assert plys

    from semantic_slam_tpu.ops.tsdf import tsdf_blocked_to_dense, tsdf_surface_points
    dense = tsdf_blocked_to_dense(vol, cfg.tsdf.dim, 8)
    pts, valid = tsdf_surface_points(dense, max_points=16384,
                                     voxel_size=cfg.tsdf.voxel_size)
    p = np.asarray(pts)[np.asarray(valid)]
    assert len(p) > 20
    box = scene.boxes[0]
    lo, hi = box[:3] - 0.06, box[3:] + 0.06
    inside = ((p >= lo) & (p <= hi)).all(axis=1)
    assert inside.mean() > 0.8, inside.mean()
