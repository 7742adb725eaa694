#!/usr/bin/env python
"""Monocular SLAM driver (the reference's third sensor mode).

The reference exposes monocular input through ORB-SLAM2's
``System::TrackMonocular`` (``include/ORB_SLAM2/System.h:64-68,85-90``); no
monocular example driver is committed there, so this one mirrors
``examples/rgbd_tum.cpp`` with the depth stream dropped. Trajectories are
up-to-scale (median scene depth of the two-view seed normalized to 1).

Usage:
  python examples/mono_tum.py --dataset /path/to/fr3_office \
      --config /root/reference/config/TUM3.yaml --out result/mono
  python examples/mono_tum.py --synthetic 60 --out result/mono_synth
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", help="TUM sequence dir (with associations.txt or rgb.txt)")
    ap.add_argument("--config", default="/root/reference/config/TUM3.yaml")
    ap.add_argument("--out", default="result/mono")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    args = ap.parse_args()

    from semantic_slam_tpu.config import SlamConfig
    from semantic_slam_tpu.slam.system import SlamSystem, FrameInput

    cfg = SlamConfig.from_yaml(args.config) if os.path.exists(args.config) \
        else SlamConfig()
    sys_ = SlamSystem(cfg)
    os.makedirs(args.out, exist_ok=True)

    t_track = []
    if args.synthetic:
        from semantic_slam_tpu.io import synth
        sys_.mono = True
        scene = synth.make_scene(2000, seed=3)
        traj = synth.orbit_trajectory(args.synthetic, radius=0.9,
                                      look_at=(0, 0, 3.0))
        for i, Tcw in enumerate(traj):
            obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=i)
            t0 = time.perf_counter()
            sys_.track_features(FrameInput(
                uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
                desc_pm1=obs["desc_pm1"], valid=obs["valid"],
                depth=np.zeros(len(obs["uv"]), np.float32),
                timestamp=float(i) / cfg.camera.fps))
            t_track.append(time.perf_counter() - t0)
    else:
        from semantic_slam_tpu.io.datasets import TumRgbdDataset
        ds = TumRgbdDataset(args.dataset)
        for i, (t, rgb, _depth) in enumerate(ds.stream()):
            gray = ds.gray(rgb)
            t0 = time.perf_counter()
            sys_.track_monocular(gray, t)
            t_track.append(time.perf_counter() - t0)
            if i % 50 == 0:
                print(f"frame {i}/{len(ds)} state={sys_.state} "
                      f"kf={sys_.n_kf} pts={int(sys_.pt_valid.sum())}")

    sys_.shutdown()
    med = np.median(t_track) if t_track else 0.0
    print(f"frames: {len(t_track)}  median track: {med*1e3:.1f} ms  "
          f"state: {sys_.state}  keyframes: {sys_.n_kf}  "
          f"points: {int(sys_.pt_valid.sum())}")
    sys_.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"))
    sys_.save_map(os.path.join(args.out, "bundle.txt"))
    sys_.save_coords(os.path.join(args.out, "coords.txt"))
    sys_.save_camera_graph(os.path.join(args.out, "camera_graph.txt"))
    print(f"exports written to {args.out}/ (up-to-scale)")


if __name__ == "__main__":
    main()
