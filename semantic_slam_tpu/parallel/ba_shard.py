"""Distributed bundle adjustment: point-sharded Schur reduction.

The SPMD "model parallelism" of this workload (SURVEY.md §2.3): the point
axis of the BA problem shards over the `data` mesh axis. Each device builds
the Schur pieces for its points (the O(P·O²) part that dominates), one
`psum` over ICI reduces the camera system ([K,K,6,6] + [K,6] — a few MB),
every device solves the identical reduced system, and back-substitutes its
own points locally. Cost and trim decisions psum the same way, so the
result is numerically identical to single-device `bundle_adjust` up to
f32 reduction order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from semantic_slam_tpu.geometry.camera import Intrinsics
from semantic_slam_tpu.geometry.se3 import se3_exp, orthonormalize_pose
from semantic_slam_tpu.slam.ba import (
    BAProblem, BAResult, _residuals, _robust_weights, _robust_cost, CHI2_2D)


def bundle_adjust_sharded(mesh: Mesh, intr: Intrinsics, prob: BAProblem,
                          *, iters: int = 10, trim_rounds: int = 2) -> BAResult:
    """Point-sharded LM bundle adjustment over the mesh's `data` axis.

    prob.pt_* and obs_* arrays must have P divisible by the data axis size.
    Executes as one jitted SPMD program (cached per mesh/iteration counts).
    """
    kf_pose, pt_xyz, cost, init_cost = _ba_sharded_prog(
        mesh, prob.kf_pose.shape[0], iters, trim_rounds)(intr, prob)
    return BAResult(kf_pose=kf_pose, pt_xyz=pt_xyz, cost=cost,
                    initial_cost=init_cost)


@functools.lru_cache(maxsize=64)
def _ba_sharded_prog(mesh: Mesh, K: int, iters: int, trim_rounds: int):

    def shard_fn(intr, kf_pose, pt_xyz, obs_kf, obs_uv, obs_w, cam_fixed,
                 pt_valid):
        base_valid = (obs_kf >= 0) & (obs_w > 0) & pt_valid[:, None]
        kidx = jnp.clip(obs_kf, 0, None)
        Pl, O = obs_kf.shape

        def chi2_of(kf_pose, pt_xyz):
            r, pc, _ = _residuals(intr, kf_pose, pt_xyz, obs_kf, obs_uv)
            chi2 = jnp.sum(r * r, -1) * obs_w
            return chi2, pc[..., 2] > 0.05

        def cost_of(kf_pose, pt_xyz, obs_valid):
            chi2, depth_ok = chi2_of(kf_pose, pt_xyz)
            local = _robust_cost(jnp.where(obs_valid & depth_ok, chi2, 0.0))
            return jax.lax.psum(local, "data")

        def build_and_solve(kf_pose, pt_xyz, lam, obs_valid):
            r, pc, R = _residuals(intr, kf_pose, pt_xyz, obs_kf, obs_uv)
            w_eff, _ = _robust_weights(r, obs_w)
            w = jnp.where(obs_valid & (pc[..., 2] > 0.05), w_eff, 0.0)

            X, Y, Z = pc[..., 0], pc[..., 1], jnp.maximum(pc[..., 2], 1e-6)
            zero = jnp.zeros_like(Z)
            Ju = jnp.stack([intr.fx / Z, zero, -intr.fx * X / Z ** 2], -1)
            Jv = jnp.stack([zero, intr.fy / Z, -intr.fy * Y / Z ** 2], -1)
            Jpix = jnp.stack([Ju, Jv], -2)
            z3 = jnp.zeros_like(X)
            S = jnp.stack([
                jnp.stack([z3, -Z, Y], -1),
                jnp.stack([Z, z3, -X], -1),
                jnp.stack([-Y, X, z3], -1)], -2)
            I3 = jnp.broadcast_to(jnp.eye(3), S.shape)
            Jxi = jnp.concatenate([I3, -S], axis=-1)
            Jc = Jpix @ Jxi
            Jp = Jpix @ R
            free = ~cam_fixed
            Jc = Jc * free[kidx][..., None, None]

            Hpp = jnp.einsum("poki,po,pokj->pij", Jp, w, Jp)
            dHpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
            Hpp = Hpp + (lam * dHpp + 1e-3)[..., None] * jnp.eye(3)
            bp = jnp.einsum("poki,po,pok->pi", Jp, w, r)
            Hcc_blocks = jnp.einsum("poki,po,pokj->poij", Jc, w, Jc)
            bc_blocks = jnp.einsum("poki,po,pok->poi", Jc, w, r)
            Wcp = jnp.einsum("poki,po,pokj->poij", Jc, w, Jp)
            Hpp_inv = jnp.linalg.inv(Hpp)
            Ycp = jnp.einsum("poij,pjk->poik", Wcp, Hpp_inv)
            S_pair = jnp.einsum("poij,pnkj->ponik", Ycp, Wcp)

            pair_valid = (w[:, :, None] > 0) & (w[:, None, :] > 0)
            rows = jnp.broadcast_to(kidx[:, :, None], (Pl, O, O))
            cols = jnp.broadcast_to(kidx[:, None, :], (Pl, O, O))
            flat_idx = (rows * K + cols).reshape(-1)
            contrib = (S_pair * pair_valid[..., None, None]).reshape(-1, 6, 6)
            S_cc = jnp.zeros((K * K, 6, 6)).at[flat_idx].add(contrib)
            S_cc = S_cc.reshape(K, K, 6, 6)
            Hcc = jnp.zeros((K, 6, 6)).at[kidx.reshape(-1)].add(
                Hcc_blocks.reshape(-1, 6, 6))
            bc = jnp.zeros((K, 6)).at[kidx.reshape(-1)].add(
                bc_blocks.reshape(-1, 6))
            b_red_contrib = jnp.einsum("poij,pj->poi", Ycp, bp)
            b_red = bc - jnp.zeros((K, 6)).at[kidx.reshape(-1)].add(
                b_red_contrib.reshape(-1, 6))

            # ---- the one collective: reduce the camera system over shards
            S_cc = jax.lax.psum(S_cc, "data")
            Hcc = jax.lax.psum(Hcc, "data")
            b_red = jax.lax.psum(b_red, "data")

            Sm = -S_cc
            dHcc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)
            diag = Hcc + (lam * dHcc + 1e-3)[..., None] * jnp.eye(6)
            Sm = Sm.at[jnp.arange(K), jnp.arange(K)].add(diag)
            Sm_dense = Sm.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
            free6 = jnp.repeat(free, 6)
            Sm_dense = jnp.where(free6[:, None] & free6[None, :], Sm_dense,
                                 jnp.eye(K * 6))
            b_dense = jnp.where(free6, b_red.reshape(-1), 0.0)
            d = jnp.sqrt(jnp.clip(jnp.diagonal(Sm_dense), 1e-6, None))
            y = jnp.linalg.solve(Sm_dense / (d[:, None] * d[None, :]),
                                 b_dense / d)
            dc = -(y / d).reshape(K, 6)
            dc = jnp.where(free[:, None], dc, 0.0)
            dc = jnp.where(jnp.isfinite(dc), dc, 0.0)

            dc_po = dc[kidx]
            wtd = jnp.einsum("poij,poi->pj", Wcp, dc_po)
            dp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp + wtd)
            dp = jnp.where(pt_valid[:, None], dp, 0.0)

            new_pose = orthonormalize_pose(
                jax.vmap(lambda x, T: se3_exp(x) @ T)(dc, kf_pose))
            return new_pose, pt_xyz + dp

        init_cost = cost_of(kf_pose, pt_xyz, base_valid)

        def lm_step(carry, _):
            kf_pose, pt_xyz, lam, cost, obs_valid = carry
            cand_pose, cand_xyz = build_and_solve(kf_pose, pt_xyz, lam,
                                                  obs_valid)
            cand_cost = cost_of(cand_pose, cand_xyz, obs_valid)
            accept = cand_cost < cost
            kf_pose = jnp.where(accept, cand_pose, kf_pose)
            pt_xyz = jnp.where(accept, cand_xyz, pt_xyz)
            cost = jnp.where(accept, cand_cost, cost)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-8, 1e4)
            return (kf_pose, pt_xyz, lam, cost, obs_valid), None

        def trim_round(carry, _):
            kf_pose, pt_xyz, obs_valid = carry
            cost = cost_of(kf_pose, pt_xyz, obs_valid)
            (kf_pose, pt_xyz, _, cost, _), _ = jax.lax.scan(
                lm_step, (kf_pose, pt_xyz, jnp.asarray(1e-4), cost, obs_valid),
                None, length=iters)
            chi2, depth_ok = chi2_of(kf_pose, pt_xyz)
            obs_valid = base_valid & depth_ok & (chi2 <= CHI2_2D)
            return (kf_pose, pt_xyz, obs_valid), None

        (kf_pose, pt_xyz, obs_valid), _ = jax.lax.scan(
            trim_round, (kf_pose, pt_xyz, base_valid), None,
            length=trim_rounds)
        final_cost = cost_of(kf_pose, pt_xyz, obs_valid)
        return kf_pose, pt_xyz, final_cost, init_cost

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P(),
                  P("data")),
        out_specs=(P(), P("data"), P(), P()),
        check_vma=False)

    def outer(intr, prob):
        return fn(intr, prob.kf_pose, prob.pt_xyz, prob.obs_kf, prob.obs_uv,
                  prob.obs_w, prob.cam_fixed, prob.pt_valid)

    return jax.jit(outer)
