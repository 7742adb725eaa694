#!/usr/bin/env python
"""Stage-2 semantic labeling driver (reference ``label_instance_rgbd.cpp``).

Loads a stage-1 map (bundle.txt + camera_graph.txt + associations.txt), then
runs the semantic Engine per keyframe: depth lattice-sparsification (3x4) and
DepthMapFactor scaling exactly like the reference driver (:89-101), instance
detections from the Flax Mask R-CNN (or the synthetic oracle with
--synthetic), DoN fusion, object tracking, and per-object point-file export
(Inventory destructor parity).

Usage:
  python examples/label_instance_rgbd.py --dataset /path/seq --map result/rgbd \
      --config /root/reference/config/TUM3.yaml --out result/objects
  python examples/label_instance_rgbd.py --synthetic 6 --out result/objects
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", help="image root for associations paths")
    ap.add_argument("--map", help="stage-1 export dir (bundle.txt etc.)")
    ap.add_argument("--config", default="/root/reference/config/TUM3.yaml")
    ap.add_argument("--categories", default="/root/reference/config/categories.txt")
    ap.add_argument("--out", default="result/objects")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--model", action="store_true",
                    help="synthetic mode: drive the engine with the trained "
                         "Mask R-CNN on textured renders instead of the "
                         "ground-truth oracle")
    ap.add_argument("--checkpoint", default=None,
                    help="detector checkpoint .npz (default: the shipped "
                         "compact one; pass semantic_slam_tpu/data/"
                         "maskrcnn_full.npz for the contract-size R-50-FPN)")
    ap.add_argument("--viz", action="store_true")
    ap.add_argument("--ndev", type=int, default=1,
                    help="keyframe data parallelism: shard the engine's "
                         "per-keyframe perception work over the first NDEV "
                         "devices (chunk-snapshot semantics; see "
                         "semantic/objects.keyframe_chunk_phase)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="process keyframes in fused chunks of this size "
                         "on ONE device (0 = sequential per-keyframe)")
    args = ap.parse_args()

    from semantic_slam_tpu.config import SlamConfig, load_categories
    from semantic_slam_tpu.semantic import Engine, OracleDetector
    from semantic_slam_tpu.semantic.detector import MaskRCNNDetector

    cfg = SlamConfig.from_yaml(args.config) if os.path.exists(args.config) \
        else SlamConfig()
    cats = load_categories(args.categories if os.path.exists(args.categories)
                           else None)

    mesh = None
    chunk = max(0, args.chunk)
    if args.ndev > 1:
        import jax
        from semantic_slam_tpu.parallel.mesh import make_mesh
        assert args.ndev <= len(jax.devices()), \
            f"--ndev {args.ndev} > {len(jax.devices())} devices"
        mesh = make_mesh(args.ndev)
        chunk = max(chunk, args.ndev)
        if chunk % args.ndev:
            chunk = args.ndev * -(-chunk // args.ndev)

    if args.synthetic:
        from semantic_slam_tpu.io import synth
        import jax.numpy as jnp
        from semantic_slam_tpu.geometry import se3_inverse
        if args.model:
            scene = synth.make_shape_scene(3, seed=1)
            det = MaskRCNNDetector(max_masks=cfg.engine.max_masks,
                                   checkpoint_path=args.checkpoint)
        else:
            scene = synth.make_box_scene(3, seed=1)
            det = OracleDetector(scene, cfg.camera, max_masks=8)
        engine = Engine(cats, cfg, detector=det)
        traj_tcw = synth.orbit_trajectory(args.synthetic, radius=0.3,
                                          look_at=(0, 0, 2.0))
        traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
        batch = []
        for i in range(len(traj_tcw)):
            depth, _ = synth.render_depth(scene, traj_twc[i], cfg.camera)
            if args.model:
                rgb = synth.render_rgb_textured(scene, traj_twc[i],
                                                cfg.camera, seed=i)
                dets = det.predict(rgb)
            else:
                dets = det.predict(traj_twc[i])
            print(f"KF {i}: {int(dets.valid.sum())} detections")
            if chunk:
                batch.append((i, depth, traj_tcw[i], dets))
                if len(batch) == chunk:
                    engine.run_chunk(batch, mesh=mesh)
                    batch = []
            else:
                engine.run(None, depth, kf_id=i, Tcw=traj_tcw[i],
                           detections=dets)
        if batch:
            # tail chunk: single-device fused path (any length)
            engine.run_chunk(batch)
    else:
        from semantic_slam_tpu.io import mapio
        from semantic_slam_tpu.io.datasets import (
            TumRgbdDataset, lattice_sparsify_depth)
        m = mapio.read_bundle(os.path.join(args.map, "bundle.txt"))
        m = mapio.read_camera_graph(
            os.path.join(args.map, "camera_graph.txt"), m)
        ds = TumRgbdDataset(args.dataset,
                            os.path.join(args.map, "associations.txt"),
                            depth_factor=cfg.camera.depth_map_factor)
        detector = MaskRCNNDetector(max_masks=cfg.engine.max_masks)
        engine = Engine(cats, cfg, detector=detector)
        kf_ids = m.valid_kf_indices()
        poses = np.asarray(m.kf_pose)
        # pipeline: detection for keyframe i+1 runs in an AsyncDetector
        # worker while the engine processes keyframe i (the reference's
        # dormant MaskRCNN worker-queue mode, src/MaskRCNN.cpp:367-446,
        # made operational)
        from semantic_slam_tpu.semantic.detector import AsyncDetector

        with AsyncDetector(detector, queue_size=2) as adet:
            pending = 0
            frames = []
            for idx, ((t, rgb, depth), k) in enumerate(
                    zip(ds.stream(), kf_ids)):
                depth = lattice_sparsify_depth(depth)  # ref :89-100 lattice
                adet.submit(rgb)
                frames.append((rgb, depth, int(k)))
                pending += 1
                if pending >= 2:
                    rgb0, depth0, k0 = frames.pop(0)
                    pending -= 1
                    print(f"Processing keyframe {k0}")
                    engine.run(rgb0, depth0, kf_id=k0, Tcw=poses[k0],
                               detections=adet.result())
            while frames:
                rgb0, depth0, k0 = frames.pop(0)
                print(f"Processing keyframe {k0}")
                engine.run(rgb0, depth0, kf_id=k0, Tcw=poses[k0],
                           detections=adet.result())

    print("objects:", [f"{o['name']}({o['n_points']}pts,"
                       f"{o['observations']}obs)"
                       for o in engine.objects_summary()])
    print("timing:", {k: f"{v*1e3:.1f}ms" for k, v in
                      engine.timing_report().items()})
    engine.save_objects(args.out)
    print(f"objects saved to {args.out}/")

    if args.viz:
        from semantic_slam_tpu.viz.renderer import render_objects
        from semantic_slam_tpu.geometry import Intrinsics
        K = np.asarray(Intrinsics.from_config(cfg.camera).K)
        view = np.eye(4, dtype=np.float32)
        render_objects(engine.bank, cats, cfg.engine.prob_thd, view, K,
                       path=os.path.join(args.out, "objects.png"))


if __name__ == "__main__":
    main()
