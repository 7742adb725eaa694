#!/usr/bin/env python
"""Stage-2 semantic labeling from lidar range images (reference
``examples/label_instance_lidar.cpp``).

Velodyne .bin scans are projected to camera-frame range images
(``Utility.cpp:374-419``), optional angle-based ground removal
(``Utility.cpp:498-553``), then the Engine runs with sensor=1 (range
semantics: d = range/√(x²+y²+1) backprojection).

Usage:
  python examples/label_instance_lidar.py --dataset /path/KITTI/seq03 \
      --map result/kitti --config /root/reference/config/KITTI03.yaml
  python examples/label_instance_lidar.py --synthetic 4 --out result/lidar
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset")
    ap.add_argument("--map")
    ap.add_argument("--config", default="/root/reference/config/KITTI03.yaml")
    ap.add_argument("--categories", default="/root/reference/config/categories.txt")
    ap.add_argument("--out", default="result/lidar")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--ground-removal", action="store_true")
    args = ap.parse_args()

    import dataclasses
    from semantic_slam_tpu.config import SlamConfig, EngineConfig, load_categories
    from semantic_slam_tpu.semantic import Engine, OracleDetector
    from semantic_slam_tpu.semantic.detector import MaskRCNNDetector

    cfg = SlamConfig.from_yaml(args.config) if os.path.exists(args.config) \
        else SlamConfig()
    if cfg.engine.sensor != 1:
        cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine, sensor=1))
    cats = load_categories(args.categories if os.path.exists(args.categories)
                           else None)

    if args.synthetic:
        import jax.numpy as jnp
        from semantic_slam_tpu.io import synth
        from semantic_slam_tpu.geometry import se3_inverse, Intrinsics
        # KITTI-scale engine params assume 8m+ outdoor structure; the
        # synthetic demo scene is indoor-scale, so use matched parameters
        # while keeping the lidar (sensor=1) range semantics under test.
        from semantic_slam_tpu.config import DonConfig
        cfg = dataclasses.replace(
            cfg,
            engine=EngineConfig(sensor=1, dist=1.0, min_depth=0.2,
                                max_depth=30.0, min_area=25,
                                max_area=250000, overlap=0.5,
                                min_point_count=15, prob_thd=0.75),
            don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                          segradius=0.05))
        scene = synth.make_box_scene(2, seed=2)
        det = OracleDetector(scene, cfg.camera, max_masks=8)
        engine = Engine(cats, cfg, detector=det)
        traj_tcw = synth.orbit_trajectory(args.synthetic, radius=0.3,
                                          look_at=(0, 0, 2.0))
        traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
        intr = Intrinsics.from_config(cfg.camera)
        for i in range(len(traj_tcw)):
            depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
            # convert z-depth to RANGE (sensor=1 contract)
            H, W = depth.shape
            ys, xs = np.mgrid[0:H, 0:W]
            x = (xs - cfg.camera.cx) / cfg.camera.fx
            y = (ys - cfg.camera.cy) / cfg.camera.fy
            rng_img = depth * np.sqrt(x * x + y * y + 1.0)
            rng_img[depth == 0] = 0
            dets = det.predict(traj_twc[i])
            engine.run(None, rng_img.astype(np.float32), kf_id=i,
                       Tcw=traj_tcw[i], detections=dets)
    else:
        from semantic_slam_tpu.io import mapio
        from semantic_slam_tpu.io.datasets import (
            read_velodyne_bin, velodyne_to_range_image, angle_ground_removal)
        from semantic_slam_tpu.geometry import Intrinsics
        m = mapio.read_bundle(os.path.join(args.map, "bundle.txt"))
        m = mapio.read_camera_graph(
            os.path.join(args.map, "camera_graph.txt"), m)
        fids = mapio.read_frame_ids(os.path.join(args.map, "frame_id.txt"))
        detector = MaskRCNNDetector(max_masks=cfg.engine.max_masks)
        engine = Engine(cats, cfg, detector=detector)
        intr = Intrinsics.from_config(cfg.camera)
        K = np.asarray(intr.K)
        # KITTI calib: velodyne->cam extrinsics from calib.txt (Tr row)
        Tr = np.eye(4, dtype=np.float32)
        calib_path = os.path.join(args.dataset, "calib.txt")
        if os.path.exists(calib_path):
            for line in open(calib_path):
                if line.startswith("Tr"):
                    Tr[:3, :4] = np.array(
                        line.split()[1:], np.float32).reshape(3, 4)
        poses = np.asarray(m.kf_pose)
        for idx, k in enumerate(m.valid_kf_indices()):
            fid = int(fids[idx])
            bin_path = os.path.join(args.dataset, "velodyne",
                                    f"{fid:06d}.bin")
            # native C++ projection when built (read + transform + z-buffer
            # in one pass, reference Utility.cpp:374-419); NumPy fallback
            from semantic_slam_tpu.io import native
            rng_img = native.velodyne_range_image(
                bin_path, Tr, K, cfg.camera.width, cfg.camera.height)
            if rng_img is None:
                scan = read_velodyne_bin(bin_path)
                rng_img = velodyne_to_range_image(
                    scan, Tr, K, width=cfg.camera.width,
                    height=cfg.camera.height)
            if args.ground_removal:
                rng_img = angle_ground_removal(rng_img, K)
            rgb_path = os.path.join(args.dataset, "image_2", f"{fid:06d}.png")
            rgb = None
            if os.path.exists(rgb_path):
                from semantic_slam_tpu.io.datasets import _imread
                rgb = _imread(rgb_path)
            print(f"Processing keyframe {idx}")
            engine.run(rgb, rng_img, kf_id=int(k), Tcw=poses[k])

    print("objects:", [f"{o['name']}({o['n_points']}pts)"
                       for o in engine.objects_summary()])
    engine.save_objects(args.out)
    print(f"objects saved to {args.out}/")


if __name__ == "__main__":
    main()
