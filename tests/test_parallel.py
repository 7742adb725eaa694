"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.models.maskrcnn import MaskRCNN
from semantic_slam_tpu.parallel.mesh import make_mesh
from semantic_slam_tpu.parallel.train import (
    make_sharded_train_step, make_synthetic_batch)
from semantic_slam_tpu.parallel import stage2

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_sharded_train_step_dp_tp():
    """Runs the dp x tp train step in a FRESH interpreter.

    This is the suite's heaviest XLA-CPU compile; in-process it reproducibly
    aborted inside LLVM at ~68% of a full-suite run (cumulative compile
    state — the identical program passes standalone and in the multichip
    dryrun). A subprocess gives it a clean compiler every time; the child
    (_sharded_train_child.py) asserts finiteness + non-divergence and prints
    the losses for this parent to re-check."""
    import subprocess
    import sys

    jax.clear_caches()          # shed our own state before the heavy child
    child = os.path.join(os.path.dirname(__file__), "_sharded_train_child.py")
    p = subprocess.run([sys.executable, child], capture_output=True,
                       text=True, timeout=600)
    assert p.returncode == 0, f"child failed:\n{p.stdout}\n{p.stderr[-2000:]}"
    line = [l for l in p.stdout.splitlines() if l.startswith("LOSSES")][0]
    loss, loss2 = map(float, line.split()[1:])
    assert np.isfinite(loss) and np.isfinite(loss2)
    assert loss2 <= loss * 1.5  # sgd on same batch shouldn't blow up


def test_tsdf_sharded_matches_single_device():
    from semantic_slam_tpu.ops.tsdf import TsdfVolume, tsdf_integrate

    mesh = make_mesh(8, model_parallel=1)
    D = 32
    depth = np.full((CAM.height, CAM.width), 2.0, np.float32)
    origin = np.array([-0.8, -0.8, 1.0], np.float32)
    b2w = np.eye(4, dtype=np.float32)
    c2w = np.eye(4, dtype=np.float32)
    vs, tm = 0.05, 0.25

    vol = TsdfVolume.create(origin, b2w, dim=D)
    ref = tsdf_integrate(vol, jnp.asarray(depth), jnp.asarray(c2w), INTR,
                         voxel_size=vs, trunc_margin=tm)

    ts = jnp.ones((D, D, D))
    wt = jnp.zeros((D, D, D))
    with mesh:
        ts2, wt2 = stage2.tsdf_integrate_sharded(
            mesh, ts, wt, jnp.asarray(origin), jnp.asarray(b2w),
            jnp.asarray(depth), jnp.asarray(c2w), INTR,
            voxel_size=vs, trunc_margin=tm)
    np.testing.assert_allclose(np.asarray(ts2), np.asarray(ref.tsdf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wt2), np.asarray(ref.weight), atol=1e-5)


def test_don_extract_batch_sharded():
    from semantic_slam_tpu.io import synth

    mesh = make_mesh(8, model_parallel=1)
    scene = synth.make_box_scene(1, seed=5)
    depth, _ = synth.render_depth(scene, np.eye(4), CAM)
    depths = jnp.asarray(np.stack([depth] * 8))
    with mesh:
        cids, sizes, ns = stage2.don_extract_batch(
            mesh, depths, INTR, 0.05, 0.5, 0.1, 0.05, max_clusters=16)
    ns = np.asarray(ns)
    assert (ns == ns[0]).all()          # identical inputs, identical outputs
    assert cids.shape == (8, CAM.height, CAM.width)


def test_tsdf_surface_sharded_matches_single_device():
    """z-slab surface extraction with ppermute halo exchange: the union of
    per-shard (point, normal) outputs must equal the single-device
    extractor bit-for-bit (the halo makes the cross-slab z-gradient exact)."""
    from semantic_slam_tpu.ops.tsdf import (TsdfVolume, tsdf_integrate,
                                            tsdf_surface_points_normals)

    mesh = make_mesh(8, model_parallel=1)
    D = 32
    # a sloped depth surface so the surface band crosses slab boundaries
    u = np.linspace(0, 1, CAM.width, dtype=np.float32)
    depth = np.broadcast_to(1.4 + 0.8 * u, (CAM.height, CAM.width)).copy()
    origin = np.array([-0.8, -0.8, 1.0], np.float32)
    b2w = np.eye(4, dtype=np.float32)
    vs, tm = 0.05, 0.25

    vol = TsdfVolume.create(origin, b2w, dim=D)
    vol = tsdf_integrate(vol, jnp.asarray(depth), jnp.eye(4), INTR,
                         voxel_size=vs, trunc_margin=tm)
    pts1, nrm1, val1 = tsdf_surface_points_normals(
        vol, max_points=D ** 3, voxel_size=vs)

    with mesh:
        pts8, nrm8, val8, n_surf = stage2.tsdf_surface_sharded(
            mesh, vol.tsdf, vol.weight, jnp.asarray(origin),
            jnp.asarray(b2w), voxel_size=vs, max_points_per_shard=4096)
    pts8, nrm8, val8 = map(np.asarray, (pts8, nrm8, val8))
    n_surf = np.asarray(n_surf)
    assert (n_surf <= 4096).all()       # no shard truncated in this scene
    got_p = np.concatenate([pts8[s][val8[s]] for s in range(8)])
    got_n = np.concatenate([nrm8[s][val8[s]] for s in range(8)])
    exp_p = np.asarray(pts1)[np.asarray(val1)]
    exp_n = np.asarray(nrm1)[np.asarray(val1)]
    assert len(got_p) == len(exp_p) > 100
    # same voxels in the same order; coords agree to 1 ulp (XLA fusion
    # layout differs between the slab and full-volume programs)
    np.testing.assert_allclose(got_p, exp_p, atol=1e-6)
    np.testing.assert_allclose(got_n, exp_n, atol=1e-6)


def test_object_evidence_batch_psum():
    from semantic_slam_tpu.semantic import objects as O

    mesh = make_mesh(8, model_parallel=1)
    bank = O.ObjectBank.empty(4, 128)
    bank = O.init_object(bank, jnp.int32(0), jnp.int32(57), jnp.float32(0.9),
                         jnp.ones(3))
    # place a grid of points at z=2 in front of the camera
    pts = np.zeros((128, 3), np.float32)
    pts[:, 0] = np.linspace(-0.3, 0.3, 128)
    pts[:, 2] = 2.0
    import dataclasses
    bank = dataclasses.replace(
        bank,
        pt_xyz=bank.pt_xyz.at[0].set(jnp.asarray(pts)),
        pt_valid=bank.pt_valid.at[0].set(True),
        pt_fg=bank.pt_fg.at[0].set(0.9),
        pt_n=bank.pt_n.at[0].set(128))
    Tcws = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (8, 1, 1)))
    depth = np.full((CAM.height, CAM.width), 2.0, np.float32)
    depths = jnp.asarray(np.stack([depth] * 8))
    mask = np.zeros((CAM.height, CAM.width), bool)
    mask[:, :] = True
    masks = jnp.asarray(np.stack([mask] * 8))
    with mesh:
        counts, dfg, dbg = stage2.object_evidence_batch(
            mesh, bank, Tcws, depths, masks, INTR, 0.5, 0.1, 3.0,
            CAM.width, CAM.height)
    # every keyframe sees all 128 points inside the (full-image) mask
    assert int(counts[0]) == 8 * 128
    assert float(dfg[0].sum()) == 8 * 128
    assert float(dbg.sum()) == 0


def test_scaling_report_overhead_budget():
    """The committed SPMD-overhead artifact must cover all six sharded paths
    with overhead under the 10% budget (BASELINE.md's 80%-to-2-hosts target
    needs low partitioning overhead as its necessary condition; regenerate
    with tools/scaling_report.py)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "scaling_report.json")
    with open(path) as f:
        report = json.load(f)
    expected = {"don_extract_batch", "object_evidence_batch",
                "tsdf_integrate_sharded", "tsdf_surface_sharded",
                "bundle_adjust_sharded", "train_step_dp_tp"}
    assert expected <= set(report["sections"]), report["sections"].keys()
    for name, sec in report["sections"].items():
        assert sec["spmd_overhead_pct"] < 10.0, (name, sec)
