#!/usr/bin/env python
"""SPMD partitioning-overhead report for the sharded SLAM paths.

BASELINE.md targets ">= 80% scaling efficiency to 2 hosts", but no
multi-chip hardware is reachable from this container, and virtual host
devices (--xla_force_host_platform_device_count) share one physical core
pool — a single-device XLA:CPU program already uses every core, so a
virtual-device "speedup" measures nothing. What CAN be measured here is the
*overhead* the SPMD formulation adds on identical total work: partitioning,
shard_map dispatch, and collectives (psum / ppermute halos). On real chips
that overhead rides ICI while per-chip work drops by N, so a low overhead
percentage here is the necessary (not sufficient) condition for the 80%
efficiency target.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/scaling_report.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from semantic_slam_tpu.config import SlamConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.parallel import stage2


def _time(fn, iters=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n = len(jax.devices())
    cfg = SlamConfig()
    intr = Intrinsics.from_config(cfg.camera)
    scene = synth.make_box_scene(2, seed=2)
    depth, _ = synth.render_depth(scene, np.eye(4), cfg.camera)
    depths = jnp.asarray(np.stack([depth] * n))

    report = {"devices": n, "platform": jax.devices()[0].platform,
              "host_cores": os.cpu_count(),
              "metric": "spmd_overhead_pct (sharded vs single-device on "
                        "identical total work; lower is better — see module "
                        "docstring for why virtual-device speedup is not "
                        "measurable on a shared core pool)",
              "sections": {}}

    def overhead(name, run):
        times = {}
        for ndev in (1, n):
            devs = np.array(jax.devices()[:ndev]).reshape(ndev, 1)
            times[ndev] = _time(lambda m=Mesh(devs, ("data", "model")): run(m))
        report["sections"][name] = {
            "t_1dev_s": round(times[1], 4),
            f"t_{n}dev_s": round(times[n], 4),
            "spmd_overhead_pct": round(100.0 * (times[n] / times[1] - 1.0), 1),
        }

    overhead("don_extract_batch", lambda m: jax.block_until_ready(
        stage2.don_extract_batch(m, depths, intr, 0.05, 0.5, 0.1, 0.05,
                                 max_clusters=32)[0]))

    D = 192
    d0 = jnp.asarray(depth)
    origin = jnp.asarray(np.array([-0.4, -0.4, 1.4], np.float32))
    ts0, wt0 = jnp.ones((D, D, D)), jnp.zeros((D, D, D))
    overhead("tsdf_integrate_sharded", lambda m: jax.block_until_ready(
        stage2.tsdf_integrate_sharded(
            m, ts0, wt0, origin, jnp.eye(4), d0, jnp.eye(4), intr,
            voxel_size=0.004, trunc_margin=0.02)[0]))

    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "scaling_report.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
