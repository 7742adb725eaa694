"""Bisect which bench section makes the engine phase_a readback fail."""
import sys, dataclasses, time
import numpy as np, jax, jax.numpy as jnp

which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else set()

def _sync(x): return np.asarray(x.ravel()[0])

def _timeit(fn, warmup=2, iters=20, batches=1):
    out = None
    for _ in range(warmup): out = fn()
    _sync(out)
    for _ in range(batches):
        for _ in range(iters): out = fn()
        _sync(out)

from semantic_slam_tpu.config import (SlamConfig, OrbConfig, DonConfig,
                                      EngineConfig, load_categories)
from semantic_slam_tpu.geometry import Intrinsics, se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.match import hamming_matrix
from semantic_slam_tpu.semantic.don import don_extract
from semantic_slam_tpu.slam.tracking import track_frame
from semantic_slam_tpu.semantic import Engine, OracleDetector

_sync(jnp.ones((8, 8)) + 1.0)
cfg = SlamConfig(); cam = cfg.camera
intr = Intrinsics.from_config(cam)
rs = np.random.RandomState(0)
box_scene = synth.make_box_scene(2, seed=2)
bdepth, _ = synth.render_depth(box_scene, np.eye(4), cam)
bdepth_j = jnp.asarray(bdepth)

if "track" in which:
    img = jnp.asarray(rs.uniform(0, 255, (480, 640)).astype(np.float32))
    orb_cfg = OrbConfig(n_features=1000)
    scene = synth.make_scene(16384, seed=1)
    pt_xyz = jnp.asarray(scene.pts_w); pt_desc = jnp.asarray(scene.desc_pm1)
    pt_valid = jnp.ones(len(scene.pts_w), bool); Tcw = jnp.eye(4)
    _timeit(lambda: track_frame(intr, Tcw, pt_xyz, pt_desc, pt_valid, img,
                                orb_cfg, cam.width, cam.height)[1].Tcw)
    print("track done", flush=True)

if "tsdf" in which:
    from semantic_slam_tpu.ops.tsdf import (tsdf_blocked_create,
                                            tsdf_integrate_blocked)
    state = {"vol": tsdf_blocked_create(np.array([-0.4, -0.4, 1.4], np.float32),
                                        np.eye(4, dtype=np.float32),
                                        dim=200, block=8)}
    def tsdf_step():
        state["vol"] = tsdf_integrate_blocked(
            state["vol"], bdepth_j, jnp.eye(4), intr, voxel_size=0.004,
            trunc_margin=0.02, block=8, max_mixed=1024)
        return state["vol"].tsdf
    _timeit(tsdf_step)
    print("tsdf done", flush=True)

if "don" in which:
    _timeit(lambda: don_extract(bdepth_j, intr, 0.05, 0.5, 0.1, 0.05, max_clusters=32).cluster_id,
            iters=10)
    print("don done", flush=True)

if "ham" in which:
    d1 = jnp.asarray(rs.randint(0, 2, (1024, 256)).astype(np.int8) * 2 - 1)
    d2 = jnp.asarray(rs.randint(0, 2, (1024, 256)).astype(np.int8) * 2 - 1)
    _timeit(lambda: hamming_matrix(d1, d2))
    print("ham done", flush=True)

ecfg = dataclasses.replace(
    cfg,
    engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                        min_area=25, max_area=250000, min_point_count=15,
                        prob_thd=0.5, min_depth=0.1, max_depth=3.5),
    don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                  segradius=0.05, max_clusters=32))
det = OracleDetector(box_scene, ecfg.camera, max_masks=8)
traj_tcw = synth.orbit_trajectory(8, radius=0.25, look_at=(0, 0, 2.0))
traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
frames = [(synth.render_depth(box_scene, traj_twc[i], ecfg.camera)[0],
           det.predict(traj_twc[i]), traj_tcw[i]) for i in range(len(traj_tcw))]
eng = Engine(load_categories(), ecfg)
for i, (d, dets, tcw) in enumerate(frames):
    eng.run(None, d, kf_id=i, Tcw=tcw, detections=dets)
    print("kf", i, "ok", flush=True)
print("ENGINE OK with sections:", which or "none", flush=True)
