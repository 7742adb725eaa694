#!/usr/bin/env python
"""Stage-1 stereo SLAM driver (reference ``examples/stereo_kitti.cpp``).

Left/right ORB extraction, row-constrained MXU stereo matching for depth,
then the same tracking/mapping pipeline as RGB-D. Exports the KITTI-format
trajectory plus the stage-2 exchange set (stereo_kitti.cpp:105-117).

Usage:
  python examples/stereo_kitti.py --dataset /path/KITTI/sequences/00 \
      --config /root/reference/config/KITTI00-02.yaml --out result/kitti
  python examples/stereo_kitti.py --synthetic 40 --out result/kitti_synth
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset")
    ap.add_argument("--config", default="/root/reference/config/KITTI00-02.yaml")
    ap.add_argument("--out", default="result/kitti")
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from semantic_slam_tpu.config import SlamConfig
    from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
    from semantic_slam_tpu.ops.orb import extract_orb
    from semantic_slam_tpu.ops.stereo import stereo_depth

    cfg = SlamConfig.from_yaml(args.config) if os.path.exists(args.config) \
        else SlamConfig()
    sys_ = SlamSystem(cfg)
    os.makedirs(args.out, exist_ok=True)

    def track_stereo(gray_l, gray_r, t):
        fl = extract_orb(jnp.asarray(gray_l, jnp.float32), cfg.orb)
        fr = extract_orb(jnp.asarray(gray_r, jnp.float32), cfg.orb)
        depth, _ = stereo_depth(
            fl.uv, fl.desc_pm1, fl.valid, fr.uv, fr.desc_pm1, fr.valid,
            fl.level, fr.level, jnp.float32(cfg.camera.bf))
        return sys_.track_features(FrameInput(
            uv=np.asarray(fl.uv), level=np.asarray(fl.level),
            desc_u8=np.asarray(fl.desc_u8), desc_pm1=np.asarray(fl.desc_pm1),
            valid=np.asarray(fl.valid), depth=np.asarray(depth),
            timestamp=t))

    t_track = []
    if args.synthetic:
        # synthetic stereo: right obs = left shifted by disparity bf/z
        from semantic_slam_tpu.io import synth
        scene = synth.make_scene(3000, extent=10.0, depth_center=12.0, seed=0)
        traj = synth.orbit_trajectory(args.synthetic, radius=2.0,
                                      look_at=(0, 0, 12.0))
        for i, Tcw in enumerate(traj):
            obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=i)
            t0 = time.perf_counter()
            sys_.track_features(FrameInput(
                uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
                desc_pm1=obs["desc_pm1"], valid=obs["valid"],
                depth=obs["depth"], timestamp=float(i) * 0.1))
            t_track.append(time.perf_counter() - t0)
    else:
        from semantic_slam_tpu.io.datasets import KittiStereoDataset
        ds = KittiStereoDataset(args.dataset)
        for i, (t, left, right) in enumerate(ds.stream()):
            t0 = time.perf_counter()
            track_stereo(left, right, t)
            t_track.append(time.perf_counter() - t0)
            if i % 50 == 0:
                print(f"frame {i}/{len(ds)} state={sys_.state} kf={sys_.n_kf}")

    sys_.shutdown()
    med = np.median(t_track) if t_track else 0
    print(f"frames: {len(t_track)}  median track: {med*1e3:.1f} ms  "
          f"keyframes: {sys_.n_kf}")
    sys_.save_trajectory_kitti(os.path.join(args.out, "CameraTrajectory.txt"))
    sys_.save_map(os.path.join(args.out, "bundle.txt"))
    sys_.save_coords(os.path.join(args.out, "coords.txt"))
    sys_.save_camera_graph(os.path.join(args.out, "camera_graph.txt"))
    sys_.save_frame_ids(os.path.join(args.out, "frame_id.txt"))
    print(f"exports written to {args.out}/")


if __name__ == "__main__":
    main()
