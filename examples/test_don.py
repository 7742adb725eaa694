#!/usr/bin/env python
"""DoN segmentation demo (reference ``test/testDoN.cpp`` equivalent).

Runs DoN over a Velodyne scan's range image (or a synthetic box scene) and
writes the clustered cloud as a colored PLY + a cluster-id PNG — the offline
replacement for the reference's interactive CloudViewer loop.

Usage:
  python examples/test_don.py --velodyne scan.bin --config config/KITTI03.yaml
  python examples/test_don.py --synthetic --out /tmp/don
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--velodyne")
    ap.add_argument("--config", default="/root/reference/config/KITTI03.yaml")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out", default="/tmp/don_demo")
    args = ap.parse_args()

    import jax.numpy as jnp
    from semantic_slam_tpu.config import SlamConfig
    from semantic_slam_tpu.geometry import Intrinsics
    from semantic_slam_tpu.semantic.don import don_extract
    from semantic_slam_tpu.ops.normals import backproject_organized
    from semantic_slam_tpu.io.native import write_ply

    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        from semantic_slam_tpu.io import synth
        cfg = SlamConfig()
        scene = synth.make_box_scene(3, seed=7)
        depth, _ = synth.render_depth(scene, np.eye(4), cfg.camera)
        sensor = 2
        s1, s2, thr, rad = 0.05, 0.5, 0.1, 0.05
    else:
        from semantic_slam_tpu.io.datasets import (
            read_velodyne_bin, velodyne_to_range_image)
        cfg = SlamConfig.from_yaml(args.config)
        scan = read_velodyne_bin(args.velodyne)
        K = np.asarray(Intrinsics.from_config(cfg.camera).K)
        depth = velodyne_to_range_image(scan, np.eye(4, dtype=np.float32), K,
                                        cfg.camera.width, cfg.camera.height)
        sensor = 1
        s1, s2 = cfg.don.scale1, cfg.don.scale2
        thr, rad = cfg.don.threshold, cfg.don.segradius

    intr = Intrinsics.from_config(cfg.camera)
    res = don_extract(jnp.asarray(depth), intr, s1, s2, thr, rad,
                      sensor=sensor)
    n = int(res.n_clusters)
    print(f"{n} clusters, sizes: {np.asarray(res.sizes)[:n].tolist()}")

    cid = np.asarray(res.cluster_id)
    pts, valid = backproject_organized(jnp.asarray(depth), intr, sensor)
    pts = np.asarray(pts)
    rs = np.random.RandomState(0)
    palette = rs.randint(50, 255, (max(n, 1), 3)).astype(np.uint8)
    sel = cid >= 0
    write_ply(os.path.join(args.out, "don_clusters.ply"),
              pts[sel], palette[cid[sel]])
    # cluster-id image
    img = np.zeros(cid.shape + (3,), np.uint8)
    img[sel] = palette[cid[sel]]
    from semantic_slam_tpu.viz.renderer import _save_image
    _save_image(os.path.join(args.out, "don_clusters.png"), img)
    print(f"wrote {args.out}/don_clusters.ply and .png")


if __name__ == "__main__":
    main()
