#!/usr/bin/env python
"""Stage-1 RGB-D SLAM driver (reference ``examples/rgbd_tum.cpp`` parity).

Runs the SLAM system over a TUM RGB-D sequence (or a synthetic sequence when
no dataset is available), then writes the full stage-2 exchange set:
trajectory (TUM format), bundle.txt, coords.txt, camera_graph.txt,
associations.txt, frame_id.txt — the reference outputs of
``rgbd_tum.cpp:121-138``.

Usage:
  python examples/rgbd_tum.py --dataset /path/to/fr3_office \
      --config /root/reference/config/TUM3.yaml --out result/rgbd
  python examples/rgbd_tum.py --synthetic 60 --out result/synth
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", help="TUM sequence dir (with associations.txt)")
    ap.add_argument("--config", default="/root/reference/config/TUM3.yaml")
    ap.add_argument("--out", default="result/rgbd")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--viz", action="store_true", help="render map PNG at end")
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
        scene = synth.make_scene(3000, extent=3.0, depth_center=2.0, seed=0)
        traj = synth.orbit_trajectory(args.synthetic, radius=0.5,
                                      look_at=(0, 0, 2.0))
        for i, Tcw in enumerate(traj):
            obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=i)
            t0 = time.perf_counter()
            sys_.track_features(FrameInput(
                uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
                desc_pm1=obs["desc_pm1"], valid=obs["valid"],
                depth=obs["depth"], timestamp=float(i) / cfg.camera.fps))
            t_track.append(time.perf_counter() - t0)
        rgb_files = [f"rgb/{i:06d}.png" for i in range(len(traj))]
        depth_files = [f"depth/{i:06d}.png" for i in range(len(traj))]
        times = [i / cfg.camera.fps for i in range(len(traj))]
    else:
        from semantic_slam_tpu.io.datasets import TumRgbdDataset
        ds = TumRgbdDataset(args.dataset,
                            depth_factor=cfg.camera.depth_map_factor)
        # stream(): native threaded prefetch loader (decode overlapped with
        # tracking) when native/ is built; sequential PIL reads otherwise
        for i, (t, rgb, depth) in enumerate(ds.stream()):
            gray = ds.gray(rgb)
            t0 = time.perf_counter()
            sys_.track_rgbd(gray, depth, t)
            t_track.append(time.perf_counter() - t0)
            if i % 50 == 0:
                print(f"frame {i}/{len(ds)} state={sys_.state} "
                      f"kf={sys_.n_kf} pts={int(sys_.pt_valid.sum())}")
        rgb_files = ds.rgb_files
        depth_files = ds.depth_files
        times = ds.times

    sys_.shutdown()
    med = np.median(t_track)
    print(f"frames: {len(t_track)}  median track: {med*1e3:.1f} ms "
          f"({1.0/med:.1f} fps)  keyframes: {sys_.n_kf} "
          f"points: {int(sys_.pt_valid.sum())}")

    # reference export set
    sys_.save_trajectory_tum(os.path.join(args.out, "CameraTrajectory.txt"))
    sys_.save_map(os.path.join(args.out, "bundle.txt"))
    sys_.save_coords(os.path.join(args.out, "coords.txt"))
    sys_.save_camera_graph(os.path.join(args.out, "camera_graph.txt"))
    sys_.save_frame_ids(os.path.join(args.out, "frame_id.txt"))
    from semantic_slam_tpu.io import mapio
    kf_rows = np.nonzero(sys_.kf_valid)[0]
    fid = [int(sys_.kf_frame_id[k]) for k in kf_rows]
    mapio.write_associations(
        os.path.join(args.out, "associations.txt"),
        [times[i] for i in fid], [rgb_files[i] for i in fid],
        [depth_files[i] for i in fid])
    print(f"exports written to {args.out}/")

    if args.viz:
        from semantic_slam_tpu.viz.renderer import render_map, export_map_ply
        from semantic_slam_tpu.geometry import Intrinsics
        import jax.numpy as jnp
        m = sys_.to_map_arrays()
        K = np.asarray(Intrinsics.from_config(cfg.camera).K)
        view = np.eye(4, dtype=np.float32)
        view[2, 3] = 1.0
        render_map(m, view, K, path=os.path.join(args.out, "map.png"))
        export_map_ply(m, os.path.join(args.out, "map.ply"))
        print("viz written")


if __name__ == "__main__":
    main()
