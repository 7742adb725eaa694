"""Stage-2 engine throughput breakdown on real TPU (VERDICT r2 weak #5).

Replicates bench.py section_engine's workload and splits the per-keyframe
wall time into: host->device uploads (depth, masks, pose), the DoN dispatch,
the fused phase-A/B dispatch, and the drain (readback) — so the roofline
note can say what bounds the 13.6 kf/s number.

Run on the real TPU:  python tools/engine_profile.py
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
    from semantic_slam_tpu.semantic import Engine, OracleDetector

    cfg = SlamConfig()
    ecfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                            min_area=25, max_area=250000,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
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

    # warm (compile)
    for i, (d, dets, tcw) in enumerate(frames):
        eng.run(None, d, kf_id=i, Tcw=tcw, detections=dets)
    eng.flush()
    print("warm done", flush=True)

    def sync(x):
        np.asarray(x.ravel()[0])

    # --- isolated costs -------------------------------------------------
    d0, dets0, tcw0 = frames[0]
    masks_np = np.asarray(dets0.masks)

    t0 = time.perf_counter()
    n = 16
    for _ in range(n):
        a = jax.device_put(d0.astype(np.float32))
    sync(a)
    print(f"upload depth  [{d0.shape} f32, {d0.nbytes/1e6:.2f} MB]: "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

    t0 = time.perf_counter()
    for _ in range(n):
        b = jax.device_put(masks_np)
    sync(b.astype(np.float32))
    print(f"upload masks  [{masks_np.shape} {masks_np.dtype}, "
          f"{masks_np.nbytes/1e6:.2f} MB]: "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

    packed = np.packbits(masks_np.astype(bool), axis=-1)
    t0 = time.perf_counter()
    for _ in range(n):
        c = jax.device_put(packed)
    sync(c.astype(np.float32))
    print(f"upload packed [{packed.shape} u8, {packed.nbytes/1e6:.2f} MB]: "
          f"{(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

    # --- per-stage timing over a timed run ------------------------------
    for k in eng.timing:
        eng.timing[k] = []
    n_runs = 32
    t0 = time.perf_counter()
    for j in range(n_runs):
        d, dets, tcw = frames[j % len(frames)]
        eng.run(None, d, kf_id=100 + j, Tcw=tcw, detections=dets)
    t_dispatch = time.perf_counter() - t0
    eng.flush()
    t_total = time.perf_counter() - t0
    rep = eng.timing_report()
    print(f"\n{n_runs} keyframes: total {t_total:.3f} s "
          f"({n_runs/t_total:.2f} kf/s), dispatch-side {t_dispatch:.3f} s")
    for k, v in rep.items():
        unit = "ms/flush" if k == "readback" else "ms/kf"
        print(f"  stage {k:8s}: {v*1e3:8.2f} {unit}")
    print(f"  drain (flush): {(t_total-t_dispatch)/n_runs*1e3:8.2f} ms/kf "
          f"(amortized)", flush=True)


if __name__ == "__main__":
    main()
