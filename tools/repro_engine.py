import dataclasses, time
import numpy as np, jax, jax.numpy as jnp
from semantic_slam_tpu.config import (SlamConfig, DonConfig, EngineConfig, load_categories)
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.semantic import Engine, OracleDetector

def _sync(x): return np.asarray(x.ravel()[0])
_sync(jnp.ones((8,8))+1.0)
print("device:", jax.devices()[0], flush=True)

cfg = SlamConfig()
ecfg = dataclasses.replace(
    cfg,
    engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                        min_area=25, max_area=250000, min_point_count=15,
                        prob_thd=0.5, min_depth=0.1, max_depth=3.5),
    don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                  segradius=0.05, max_clusters=32))
box_scene = synth.make_box_scene(2, seed=2)
det = OracleDetector(box_scene, ecfg.camera, max_masks=8)
traj_tcw = synth.orbit_trajectory(8, radius=0.25, look_at=(0, 0, 2.0))
traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
frames = []
for i in range(len(traj_tcw)):
    d, _ = synth.render_depth(box_scene, traj_twc[i], ecfg.camera)
    frames.append((d, det.predict(traj_twc[i]), traj_tcw[i]))
eng = Engine(load_categories(), ecfg)
for i, (d, dets, tcw) in enumerate(frames):
    t0=time.time()
    eng.run(None, d, kf_id=i, Tcw=tcw, detections=dets)
    print("warm kf", i, "ok", round(time.time()-t0,2), flush=True)
n_runs, t0 = 16, time.perf_counter()
for j in range(n_runs):
    d, dets, tcw = frames[j % len(frames)]
    eng.run(None, d, kf_id=len(frames) + j, Tcw=tcw, detections=dets)
print("engine_kf_per_s", n_runs / (time.perf_counter() - t0), flush=True)
