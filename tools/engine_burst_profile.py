"""Per-program device-time burst profile for the stage-2 engine at fixture
scale (48 objects x 2048 points, VGA, 16 masks).

Each program is dispatched N times back-to-back with loop-carried variation
and synced ONCE — so the result is device occupancy per call, not tunnel
dispatch latency (CLAUDE.md: standalone micro-benchmarks are dispatch-floor
bound). Programs measured: don_extract, keyframe_phase_ab, the detector
forward (pool=2 fullres path), uploads (depth f32 vs u16), and the blocked
TSDF integrate.

Run on the real TPU:  python tools/engine_burst_profile.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.config import (DonConfig, EngineConfig,
                                          SlamConfig, load_categories)
    from semantic_slam_tpu.geometry import se3_inverse
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.semantic import Engine
    from semantic_slam_tpu.semantic.detector import MaskRCNNDetector

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    sync(jnp.ones((8, 8)) + 1.0)
    print("device:", jax.devices()[0], flush=True)

    cfg = SlamConfig()
    ecfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=48, max_points_per_object=2048,
                            min_area=25, max_area=250000,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                      segradius=0.05, max_clusters=32))
    scene = synth.make_shape_scene(40, seed=11)
    det = MaskRCNNDetector(max_masks=16, score_threshold=0.5)
    eng = Engine(load_categories(), ecfg)
    traj_tcw = synth.orbit_trajectory(8, radius=0.6, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
    frames = []
    for i in range(8):
        depth, _ = synth.render_scene(scene, traj_twc[i], ecfg.camera)
        rgb = synth.render_rgb_textured(scene, traj_twc[i], ecfg.camera,
                                        seed=i)
        frames.append((rgb, depth, traj_tcw[i]))

    # warm the engine (fills the bank to realistic occupancy) + detector
    for i, (rgb, depth, tcw) in enumerate(frames):
        d = det.predict(rgb)
        eng.run(None, depth, kf_id=i, Tcw=tcw, detections=d)
    eng.flush()
    print(f"bank objects: {int(np.asarray(eng.bank.obj_valid).sum())}",
          flush=True)

    N = 32

    def burst(name, fn):
        fn()                      # compile/warm
        sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(N):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"{name:28s}: {dt:8.2f} ms/call", flush=True)
        return dt

    rgb0, depth0, tcw0 = frames[0]
    depth_j = jnp.asarray(depth0, jnp.float32)
    tcw_j = jnp.asarray(tcw0, jnp.float32)
    d0 = det.predict(rgb0)

    # --- DoN ---
    burst("don_extract", lambda: eng.don.extract(depth_j).cluster_id)

    # --- detector forward (device masks path) ---
    from semantic_slam_tpu.models.maskrcnn import run_inference_fullres
    rgb_u8 = jnp.asarray(rgb0, jnp.uint8)
    burst("detector fullres pool=2",
          lambda: run_inference_fullres(det.model, det.params, rgb_u8,
                                        max_detections=16, pool=2)["masks"])

    # --- phase_ab at current bank occupancy ---
    from semantic_slam_tpu.semantic import objects as O
    don_res = eng.don.extract(depth_j)
    e = ecfg.engine
    masks_dev = d0.masks if isinstance(d0.masks, jax.Array) \
        else jnp.asarray(np.asarray(d0.masks))

    def phase_ab():
        return O.keyframe_phase_ab(
            eng.bank, tcw_j, depth_j, eng.intr, masks_dev,
            jnp.asarray(np.asarray(d0.labels), jnp.int32),
            jnp.asarray(np.asarray(d0.scores), jnp.float32),
            jnp.asarray(np.asarray(d0.valid)),
            don_res.cluster_id, don_res.n_clusters, eng._color_table,
            jnp.float32(e.prob_thd), jnp.float32(e.min_depth),
            jnp.float32(e.max_depth), jnp.float32(e.min_area),
            jnp.float32(e.max_area), jnp.int32(e.min_point_count),
            jnp.float32(e.score_margin), jnp.float32(e.overlap),
            n_clusters_cap=ecfg.don.max_clusters, erode_radius=eng._erode_r,
            width=ecfg.camera.width, height=ecfg.camera.height,
            sensor=e.sensor, res_radius=0, max_new=1024,
            masks_packed=False).pack
    burst("keyframe_phase_ab", phase_ab)

    # --- uploads ---
    dep16 = (np.asarray(depth0) * 5000).astype(np.uint16)
    burst("upload depth f32 1.2MB",
          lambda: jax.device_put(np.asarray(depth0, np.float32)))
    burst("upload depth u16 0.6MB", lambda: jax.device_put(dep16))
    burst("upload rgb u8 0.9MB",
          lambda: jax.device_put(np.asarray(rgb0, np.uint8)))

    # --- TSDF blocked integrate ---
    from semantic_slam_tpu.ops.tsdf import (tsdf_blocked_create,
                                            tsdf_integrate_blocked)
    t = ecfg.tsdf
    vol = tsdf_blocked_create(np.array([-0.4, -0.4, 1.4], np.float32),
                              np.eye(4, dtype=np.float32), dim=t.dim, block=8)
    state = {"vol": vol}

    def tsdf_once():
        state["vol"] = tsdf_integrate_blocked(
            state["vol"], depth_j, jnp.eye(4), eng.intr,
            voxel_size=t.voxel_size, trunc_margin=t.trunc_margin,
            max_depth=t.max_integrate_depth, block=8)
        return state["vol"].tsdf
    burst("tsdf_integrate_blocked", tsdf_once)


if __name__ == "__main__":
    main()
