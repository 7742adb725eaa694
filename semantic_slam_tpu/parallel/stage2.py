"""Stage-2 scale-out: keyframe-parallel semantic processing + sharded TSDF.

The reference's stage 2 is a sequential per-keyframe loop on one machine
(``examples/label_instance_rgbd.cpp:77-110``). Keyframes are embarrassingly
parallel for the *perception* part (DoN, projection gating, evidence
counting); only the object-bank update is order-dependent. The SPMD design:

  - `don_extract_batch`: depth batches shard over the `data` axis; each chip
    segments its keyframes independently (shard_map, zero communication).
  - `object_evidence_batch`: with a replicated object bank, each chip
    projects the bank into its keyframes and computes per-object fg/bg
    evidence and inlier counts; a `psum` over `data` aggregates — one
    collective per batch instead of per-keyframe mutexed updates.
  - `tsdf_integrate_sharded`: the volume shards over z-slabs (`data` axis);
    each chip integrates the slab it owns against the (replicated) depth
    frame — the spatial scaling axis for large maps (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from semantic_slam_tpu.geometry.camera import Intrinsics
from semantic_slam_tpu.semantic.don import don_extract
from semantic_slam_tpu.semantic import objects as O


def don_extract_batch(mesh: Mesh, depths: jnp.ndarray, intr: Intrinsics,
                      scale1: float, scale2: float, threshold: float,
                      segradius: float, *, max_clusters: int = 64):
    """[B, H, W] depths (B divisible by data axis) -> batched DonResult."""

    def one(d):
        r = don_extract(d, intr, scale1, scale2, threshold, segradius,
                        max_clusters=max_clusters)
        return r.cluster_id, r.sizes, r.n_clusters

    def shard_fn(depths):
        return jax.vmap(one)(depths)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, None),),
        out_specs=(P("data", None, None), P("data", None), P("data")),
        check_vma=False)
    return fn(depths)


def object_evidence_batch(mesh: Mesh, bank: O.ObjectBank,
                          Tcws: jnp.ndarray, depths: jnp.ndarray,
                          masks_er: jnp.ndarray, intr: Intrinsics,
                          prob_thd: float, min_depth: float, max_depth: float,
                          width: int, height: int):
    """Aggregate per-object mask-inlier counts and fg/bg evidence over a
    sharded batch of keyframes.

    Tcws [B, 4, 4], depths [B, H, W], masks_er [B, H, W] (one detection mask
    per keyframe here; callers loop masks). Returns (counts [B_obj], dfg, dbg
    [B_obj, P]) summed over all keyframes via psum.
    """

    def per_kf(Tcw, depth, mask_er):
        gates = O.project_gates(bank, Tcw, depth, intr,
                                jnp.float32(prob_thd), jnp.float32(min_depth),
                                jnp.float32(max_depth), width=width,
                                height=height)
        counts = O.count_mask_inliers(gates, mask_er, width=width,
                                      height=height)
        ui = jnp.clip(gates.uv_i[..., 0], 0, width - 1)
        vi = jnp.clip(gates.uv_i[..., 1], 0, height - 1)
        in_mask = mask_er[vi, ui]
        dfg = jnp.where(gates.gate & in_mask, 1.0, 0.0)
        dbg = jnp.where(gates.gate & ~in_mask, 1.0, 0.0)
        return counts, dfg, dbg

    def shard_fn(Tcws, depths, masks):
        c, f, b = jax.vmap(per_kf)(Tcws, depths, masks)
        c = jax.lax.psum(jnp.sum(c, 0), "data")
        f = jax.lax.psum(jnp.sum(f, 0), "data")
        b = jax.lax.psum(jnp.sum(b, 0), "data")
        return c, f, b

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None),
                  P("data", None, None)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return fn(Tcws, depths, masks_er)


def tsdf_integrate_sharded(mesh: Mesh, tsdf: jnp.ndarray, weight: jnp.ndarray,
                           origin: jnp.ndarray, base2world: jnp.ndarray,
                           depth: jnp.ndarray, cam2world: jnp.ndarray,
                           intr: Intrinsics, *, voxel_size: float,
                           trunc_margin: float, max_depth: float = 6.0):
    """Spatially-sharded TSDF integrate: volume split into z-slabs over the
    `data` axis; each device updates only its slab (no communication — the
    depth image and pose replicate).

    tsdf/weight: [D, D, D] arrays whose leading (z) dim divides the data axis.
    """
    D = tsdf.shape[0]
    n_shards = mesh.shape["data"]
    slab = D // n_shards

    def shard_fn(ts, wt, depth, cam2world):
        # this device owns z indices [k*slab, (k+1)*slab)
        k = jax.lax.axis_index("data")
        z0 = k * slab
        from semantic_slam_tpu.ops.tsdf import TsdfVolume
        cam2base = jnp.linalg.inv(base2world) @ cam2world
        R = cam2base[:3, :3]
        t = cam2base[:3, 3]
        ax = origin[0] + jnp.arange(D, dtype=ts.dtype) * voxel_size
        ay = origin[1] + jnp.arange(D, dtype=ts.dtype) * voxel_size
        az = (origin[2] + (z0 + jnp.arange(slab, dtype=ts.dtype)) * voxel_size)
        bx, by, bz = ax - t[0], ay - t[1], az - t[2]

        def cam_coord(col):
            return (R[0, col] * bx[None, None, :]
                    + R[1, col] * by[None, :, None]
                    + R[2, col] * bz[:, None, None])

        pcx, pcy, pcz = cam_coord(0), cam_coord(1), cam_coord(2)
        H, W = depth.shape
        zsafe = jnp.where(pcz > 1e-6, pcz, 1.0)
        u = jnp.round(intr.fx * (pcx / zsafe) + intr.cx).astype(jnp.int32)
        v = jnp.round(intr.fy * (pcy / zsafe) + intr.cy).astype(jnp.int32)
        in_img = (pcz > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        dv = depth[jnp.clip(v, 0, H - 1), jnp.clip(u, 0, W - 1)]
        sdf = dv - pcz
        ok = in_img & (dv > 0) & (dv <= max_depth) & (sdf > -trunc_margin)
        dist = jnp.minimum(1.0, sdf / trunc_margin)
        w_new = wt + 1.0
        t_new = (ts * wt + dist) / w_new
        return (jnp.where(ok, t_new, ts), jnp.where(ok, w_new, wt))

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None), P(), P()),
        out_specs=(P("data", None, None), P("data", None, None)),
        check_vma=False)
    return fn(tsdf, weight, depth, cam2world)
