"""Benchmark harness — runs on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: stage-1 tracking throughput (ORB extraction + map tracking,
the reference's per-frame hot loop which it paces to the dataset's 30 Hz —
reference ``examples/rgbd_tum.cpp:109-117``). vs_baseline = fps / 30.

Secondary metrics (TSDF Mvoxel/s, DoN segmentation fps, Mask R-CNN fps,
Hamming matcher rate) are written to bench_details.json.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(x):
    """Force a real device sync. block_until_ready is a no-op through some
    remote-TPU transports (axon tunnel); a scalar readback always syncs."""
    import numpy as np

    return np.asarray(x.ravel()[0])


def _timeit(fn, warmup: int = 2, iters: int = 100, batches: int = 3) -> float:
    """fn() must return a device array. Queues `iters` async dispatches and
    syncs once at the end — measures amortized device execution time (one
    ~30 ms tunnel readback amortized over the batch). Takes the best of
    `batches` batches: tunnel jitter only ever adds time, so the minimum is
    the stable estimator (headline varied ±15% run-to-run without this).

    iters must be large: the tunnel's dispatch pipeline only saturates past
    ~50 queued calls (measured floor: 2.6 ms/call at depth 10 -> 0.75 ms at
    depth 50 for an empty kernel). Shallow batches measure dispatch, not the
    device."""
    out = None
    for _ in range(warmup):
        out = fn()
    _sync(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.config import SlamConfig, OrbConfig
    from semantic_slam_tpu.geometry import Intrinsics
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.ops.match import hamming_matrix
    from semantic_slam_tpu.ops.tsdf import TsdfVolume, tsdf_integrate
    from semantic_slam_tpu.semantic.don import don_extract
    from semantic_slam_tpu.slam.tracking import track_frame

    # absorb one-time transport setup (first host readback through a remote
    # TPU tunnel can take minutes) before any timing begins
    _sync(jnp.ones((8, 8)) + 1.0)

    details = {"device": str(jax.devices()[0])}
    cfg = SlamConfig()
    cam = cfg.camera
    intr = Intrinsics.from_config(cam)
    rs = np.random.RandomState(0)

    # ---- stage-1 tracking step: ORB extract + track vs 16k-point map ------
    img = jnp.asarray(rs.uniform(0, 255, (480, 640)).astype(np.float32))
    orb_cfg = OrbConfig(n_features=1000)
    scene = synth.make_scene(16384, seed=1)
    pt_xyz = jnp.asarray(scene.pts_w)
    pt_desc = jnp.asarray(scene.desc_pm1)
    pt_valid = jnp.ones(len(scene.pts_w), bool)
    Tcw = jnp.eye(4)

    def track_step():
        _, res = track_frame(intr, Tcw, pt_xyz, pt_desc, pt_valid,
                             img, orb_cfg, cam.width, cam.height)
        return res.Tcw

    dt = _timeit(track_step)
    fps = 1.0 / dt
    details["tracking_fps"] = fps

    # Reference throughput: real-time-paced at 30 fps (TUM) on CPU. The
    # headline line prints as soon as it is measured, BEFORE every secondary
    # metric, so a failure or compile stall later can never lose it.
    print(json.dumps({
        "metric": "tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }), flush=True)

    box_scene = synth.make_box_scene(2, seed=2)
    bdepth, _ = synth.render_depth(box_scene, np.eye(4), cam)
    bdepth_j = jnp.asarray(bdepth)

    # ---- stage-2 semantic engine keyframes/s (DoN + batched per-mask loop;
    # detection excluded — it has its own metric below). The reference's
    # Engine::Run is the per-keyframe hot loop of stage 2
    # (examples/label_instance_rgbd.cpp:77-110).
    # NOTE: this section must run BEFORE the standalone DoN micro-bench —
    # pre-running the don_extract program poisons the remote-TPU transport
    # for later new programs (readbacks/uploads start failing with bare
    # INVALID_ARGUMENT; bisected in round 1, track/tsdf/hamming pre-runs are
    # all fine, one don_extract execution is not). ---------------------------
    import dataclasses

    from semantic_slam_tpu.config import (DonConfig, EngineConfig,
                                          load_categories)
    from semantic_slam_tpu.geometry import se3_inverse
    from semantic_slam_tpu.semantic import Engine, OracleDetector

    try:
        ecfg = dataclasses.replace(
            cfg,
            engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                                min_area=25, max_area=250000,
                                min_point_count=15, prob_thd=0.5,
                                min_depth=0.1, max_depth=3.5),
            don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                          segradius=0.05, max_clusters=32))
        det = OracleDetector(box_scene, ecfg.camera, max_masks=8)
        traj_tcw = synth.orbit_trajectory(8, radius=0.25, look_at=(0, 0, 2.0))
        traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
        frames = []
        for i in range(len(traj_tcw)):
            d, _ = synth.render_depth(box_scene, traj_twc[i], ecfg.camera)
            frames.append((d, det.predict(traj_twc[i]), traj_tcw[i]))
        eng = Engine(load_categories(), ecfg)
        for i, (d, dets, tcw) in enumerate(frames):      # warmup + compile
            eng.run(None, d, kf_id=i, Tcw=tcw, detections=dets)
        n_runs, t0 = 16, time.perf_counter()
        for j in range(n_runs):
            d, dets, tcw = frames[j % len(frames)]
            eng.run(None, d, kf_id=len(frames) + j, Tcw=tcw, detections=dets)
        details["engine_kf_per_s"] = n_runs / (time.perf_counter() - t0)
    except Exception as e:  # keep secondary metrics non-fatal
        import traceback
        details["engine_error"] = str(e)[:200]
        details["engine_traceback"] = traceback.format_exc()[-2000:]

    # ---- TSDF integrate (reference workload: 200^3 voxels/frame over a
    # real object depth scene; hierarchically-culled block kernel) ----------
    from semantic_slam_tpu.ops.tsdf import (
        tsdf_blocked_create, tsdf_integrate_blocked)
    state = {"vol": tsdf_blocked_create(
        np.array([-0.4, -0.4, 1.4], np.float32),
        np.eye(4, dtype=np.float32), dim=200, block=8)}

    def tsdf_step():
        state["vol"] = tsdf_integrate_blocked(
            state["vol"], bdepth_j, jnp.eye(4), intr,
            voxel_size=0.004, trunc_margin=0.02, block=8, max_mixed=1024)
        return state["vol"].tsdf

    dt_tsdf = _timeit(tsdf_step, warmup=2, iters=100)
    details["tsdf_mvoxels_per_s"] = 200 ** 3 / dt_tsdf / 1e6

    # ---- DoN segmentation (keep LAST among device micro-benches: see the
    # transport-poisoning note above the engine section) ---------------------
    def don_step():
        return don_extract(bdepth_j, intr, 0.05, 0.5, 0.1, 0.05).cluster_id

    details["don_fps"] = 1.0 / _timeit(don_step, warmup=2, iters=60)

    # ---- Hamming matcher rate --------------------------------------------
    d1 = jnp.asarray(rs.randint(0, 2, (1024, 256)).astype(np.int8) * 2 - 1)
    d2 = jnp.asarray(rs.randint(0, 2, (1024, 256)).astype(np.int8) * 2 - 1)

    def match_step():
        return hamming_matrix(d1, d2)

    details["hamming_gcomparisons_per_s"] = (
        1024 * 1024 / _timeit(match_step) / 1e9)

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    # ---- Mask R-CNN inference (flagship model, 256x320). Compiles in ~60 s
    # on an idle remote-compile helper (earlier >15 min observations were
    # queue contention from killed clients). The headline line above is
    # already printed/flushed, so a stall here can never lose it; set
    # SST_BENCH_MODEL=0 to skip. -------------------------------------------
    import os
    if os.environ.get("SST_BENCH_MODEL", "1") == "0":
        return
    try:
        from semantic_slam_tpu.models.maskrcnn import MaskRCNN

        model = MaskRCNN(pre_nms=256, post_nms=64, roi_samples=32)
        mimg = jnp.asarray(rs.uniform(0, 255, (256, 320, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), mimg)
        infer = jax.jit(lambda p, im: model.apply(p, im)["scores"])
        details["maskrcnn_fps_256x320"] = 1.0 / _timeit(
            lambda: infer(params, mimg), warmup=1, iters=60)
    except Exception as e:  # keep the headline metric robust
        details["maskrcnn_error"] = str(e)[:200]
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
