#!/usr/bin/env python
"""SPMD partitioning-overhead report for ALL six sharded SLAM paths.

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

Methodology: every input is pre-placed in the mesh sharding (steady-state —
volumes/points live sharded between calls) and each timing is the best of
`batches` batches of `iters` calls (one-sided scheduler jitter, same
estimator as bench.py). Sections cover the full §2.3 parallelism plan:
don_extract_batch, object_evidence_batch (psum), tsdf_integrate_sharded
(z-slabs), tsdf_surface_sharded (ppermute halos), bundle_adjust_sharded
(Schur psum), and the dp x tp Mask R-CNN train step.

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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semantic_slam_tpu.config import CameraConfig, SlamConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.parallel import stage2


def _time(fn, iters=3, batches=3):
    fn()  # compile
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def build_report(n=None):
    n = n or len(jax.devices())
    cfg = SlamConfig()
    intr = Intrinsics.from_config(cfg.camera)
    scene = synth.make_box_scene(2, seed=2)
    depth, _ = synth.render_depth(scene, np.eye(4), cfg.camera)
    d0 = jnp.asarray(depth)

    report = {"devices": n, "platform": jax.devices()[0].platform,
              "host_cores": os.cpu_count(),
              "metric": "spmd_overhead_pct (sharded vs single-device on "
                        "identical total work; lower is better — see module "
                        "docstring for why virtual-device speedup is not "
                        "measurable on a shared core pool)",
              "SCOPE": ("VIRTUAL devices on one shared host-core pool: this "
                        "artifact bounds SPMD partitioning/collective "
                        "OVERHEAD only. It is NOT evidence of multi-chip "
                        "speedup or of any N-host scaling efficiency — "
                        "negative 'overhead' here is core-pool scheduling "
                        "noise. Real-scaling claims require real chips, "
                        "which this environment does not have (one TPU via "
                        "tunnel); see BASELINE.md targets."),
              "sections": {}}

    def meshes():
        for ndev in (1, n):
            devs = np.array(jax.devices()[:ndev]).reshape(ndev, 1)
            yield ndev, Mesh(devs, ("data", "model"))

    def overhead(name, make_run):
        times = {}
        for ndev, mesh in meshes():
            times[ndev] = _time(make_run(mesh))
        report["sections"][name] = {
            "t_1dev_s": round(times[1], 4),
            f"t_{n}dev_s": round(times[n], 4),
            "spmd_overhead_pct": round(100.0 * (times[n] / times[1] - 1.0), 1),
        }

    # ---- 1. keyframe-parallel DoN --------------------------------------
    depths = jnp.asarray(np.stack([depth] * n))

    def don_run(mesh):
        d = jax.device_put(depths, NamedSharding(mesh, P("data", None, None)))
        return lambda: jax.block_until_ready(
            stage2.don_extract_batch(mesh, d, intr, 0.05, 0.5, 0.1, 0.05,
                                     max_clusters=32)[0])

    overhead("don_extract_batch", don_run)

    # ---- 2. object-evidence psum ---------------------------------------
    import dataclasses

    from semantic_slam_tpu.semantic import objects as O

    cam = cfg.camera
    # sized so single-device compute is tens of ms: per-call multi-device
    # dispatch (~1 ms of buffer bookkeeping) must not masquerade as SPMD
    # overhead the way it would on a 2 ms toy bank
    bank = O.ObjectBank.empty(64, 4096)
    bank = O.init_object(bank, jnp.int32(0), jnp.int32(57), jnp.float32(0.9),
                         jnp.ones(3))
    pts = np.zeros((4096, 3), np.float32)
    pts[:, 0] = np.linspace(-0.3, 0.3, 4096)
    pts[:, 2] = 2.0
    bank = dataclasses.replace(
        bank,
        pt_xyz=bank.pt_xyz.at[0].set(jnp.asarray(pts)),
        pt_valid=bank.pt_valid.at[0].set(True),
        pt_fg=bank.pt_fg.at[0].set(0.9),
        pt_n=bank.pt_n.at[0].set(4096))
    Tcws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (n, 1, 1)))
    masks = jnp.ones((n, cam.height, cam.width), bool)

    def ev_run(mesh):
        sh = NamedSharding(mesh, P("data", None, None))
        T = jax.device_put(Tcws, NamedSharding(mesh, P("data", None, None)))
        dep = jax.device_put(depths, sh)
        m = jax.device_put(masks, sh)
        return lambda: jax.block_until_ready(
            stage2.object_evidence_batch(mesh, bank, T, dep, m, intr,
                                         0.5, 0.1, 3.5, cam.width,
                                         cam.height)[0])

    overhead("object_evidence_batch", ev_run)

    # ---- 3. z-slab-sharded TSDF integrate ------------------------------
    D = 192
    origin = jnp.asarray(np.array([-0.4, -0.4, 1.4], np.float32))
    eye = jnp.eye(4)

    def tsdf_run(mesh):
        sh = NamedSharding(mesh, P("data", None, None))
        ts0 = jax.device_put(jnp.ones((D, D, D)), sh)
        wt0 = jax.device_put(jnp.zeros((D, D, D)), sh)
        return lambda: jax.block_until_ready(
            stage2.tsdf_integrate_sharded(
                mesh, ts0, wt0, origin, eye, d0, eye, intr,
                voxel_size=0.004, trunc_margin=0.02)[0])

    overhead("tsdf_integrate_sharded", tsdf_run)

    # ---- 4. sharded surface extraction (ppermute halos) ----------------
    rs = np.random.RandomState(0)
    ts_surf = jnp.asarray(rs.uniform(-1, 1, (D, D, D)).astype(np.float32))
    wt_surf = jnp.asarray(rs.uniform(0, 2, (D, D, D)).astype(np.float32))

    def surf_run(mesh):
        sh = NamedSharding(mesh, P("data", None, None))
        ts = jax.device_put(ts_surf, sh)
        wt = jax.device_put(wt_surf, sh)
        return lambda: jax.block_until_ready(
            stage2.tsdf_surface_sharded(
                mesh, ts, wt, origin, eye, voxel_size=0.004,
                max_points_per_shard=4096)[0])

    overhead("tsdf_surface_sharded", surf_run)

    # ---- 5. point-sharded bundle adjustment ----------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge
    from semantic_slam_tpu.parallel.ba_shard import bundle_adjust_sharded

    # sized for ~100 ms of single-device compute (see evidence-bank note)
    prob = ge._small_ba_problem(n_cams=16, n_pts=1024 * n, obs_per_pt=4)

    def ba_run(mesh):
        shp = NamedSharding(mesh, P("data"))
        p = prob._replace(
            pt_xyz=jax.device_put(prob.pt_xyz, shp),
            obs_kf=jax.device_put(prob.obs_kf, shp),
            obs_uv=jax.device_put(prob.obs_uv, shp),
            obs_w=jax.device_put(prob.obs_w, shp),
            pt_valid=jax.device_put(prob.pt_valid, shp))
        return lambda: jax.block_until_ready(
            bundle_adjust_sharded(mesh, intr, p, iters=8,
                                  trim_rounds=2).kf_pose)

    overhead("bundle_adjust_sharded", ba_run)

    # ---- 6. dp x tp Mask R-CNN train step ------------------------------
    import optax

    from semantic_slam_tpu.models.maskrcnn import MaskRCNN
    from semantic_slam_tpu.parallel.train import (make_sharded_train_step,
                                                  make_synthetic_batch)

    model = MaskRCNN(pre_nms=32, post_nms=8, roi_samples=8)
    hw = (64, 64)
    gbatch = make_synthetic_batch(n, *hw)     # same global batch both ways
    params0 = model.init(jax.random.PRNGKey(0),
                         jnp.zeros(hw + (3,), jnp.float32))
    tx = optax.sgd(1e-3)

    # host snapshot: step() donates its inputs, and a 1-device device_put can
    # alias rather than copy — placing from numpy keeps params0 reusable
    params_host = jax.tree_util.tree_map(np.asarray, params0)

    def train_run(mesh):
        place, shard_batch, step = make_sharded_train_step(model, mesh, tx)
        pfresh = jax.tree_util.tree_map(jnp.asarray, params_host)
        with mesh:
            params, opt_state = place(pfresh, tx.init(pfresh))
            batch = shard_batch(gbatch)
        state = {"p": params, "o": opt_state}

        def run():
            # step donates params/opt_state: chain the returned state
            with mesh:
                p, o, loss = step(state["p"], state["o"], batch)
            state["p"], state["o"] = p, o
            return jax.block_until_ready(loss)

        return run

    def train_meshes():
        # dp x tp needs >= 2 devices for tp; single-device mesh is (1, 1)
        for ndev, shape in ((1, (1, 1)), (n, (n // 2, 2) if n % 2 == 0
                                         else (n, 1))):
            devs = np.array(jax.devices()[:ndev]).reshape(shape)
            yield ndev, Mesh(devs, ("data", "model"))

    times = {}
    for ndev, mesh in train_meshes():
        times[ndev] = _time(train_run(mesh))
    report["sections"]["train_step_dp_tp"] = {
        "t_1dev_s": round(times[1], 4),
        f"t_{n}dev_s": round(times[n], 4),
        "spmd_overhead_pct": round(100.0 * (times[n] / times[1] - 1.0), 1),
    }

    return report


def main():
    report = build_report()
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "scaling_report.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
