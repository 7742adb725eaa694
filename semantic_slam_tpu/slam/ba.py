"""Bundle adjustment: Levenberg-Marquardt with dense block Schur complement.

Replaces g2o inside ORB-SLAM2's Optimizer (local BA in LocalMapping, global BA
after loop closure — reference ``include/ORB_SLAM2/System.h:205-210``). The
TPU formulation abandons CSparse-style sparse factorization for the *dense
block* Schur path, which is where the MXU lives:

  - Residuals/Jacobians for every observation in one batched pass over the
    padded observation table [P, O] (P points, O obs slots each).
  - Point blocks Hpp [P,3,3] inverted in closed form (batched 3x3).
  - The reduced camera system S = Hcc − W Hpp⁻¹ Wᵀ is assembled with one
    einsum over per-point observation pairs ([P,O,O,6,6] contributions) and a
    scatter-add into the dense [6K, 6K] matrix — K ≤ a few hundred keyframes
    makes the dense solve (Cholesky on MXU) cheap.
  - LM damping with accept/reject inside lax.scan (no host round-trips).

Observation model and robustness mirror the reference semantics: Huber on
pixel residuals at chi2=5.991, per-level inv-sigma² information, gauge fixed
by freezing chosen cameras (first KF, or all non-window KFs for local BA).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.geometry.camera import Intrinsics, project
from semantic_slam_tpu.geometry.se3 import se3_exp, orthonormalize_pose

CHI2_2D = 5.991


class BAProblem(NamedTuple):
    """Padded BA problem. K cameras, P points, O observation slots per point."""
    kf_pose: jnp.ndarray     # [K, 4, 4] Tcw initial
    pt_xyz: jnp.ndarray      # [P, 3] initial
    obs_kf: jnp.ndarray      # [P, O] i32 camera index (-1 = empty slot)
    obs_uv: jnp.ndarray      # [P, O, 2] pixel measurements
    obs_w: jnp.ndarray       # [P, O] information weight (inv sigma^2); 0 = off
    cam_fixed: jnp.ndarray   # [K] bool — gauge/window freeze
    pt_valid: jnp.ndarray    # [P] bool


class BAResult(NamedTuple):
    kf_pose: jnp.ndarray
    pt_xyz: jnp.ndarray
    cost: jnp.ndarray        # [] final robust cost
    initial_cost: jnp.ndarray


def _residuals(intr, kf_pose, pt_xyz, obs_kf, obs_uv):
    """r [P,O,2], pc [P,O,3] camera-frame points, R [P,O,3,3] cam rotations."""
    kidx = jnp.clip(obs_kf, 0, None)
    T = kf_pose[kidx]                                  # [P, O, 4, 4]
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    pc = jnp.einsum("poij,pj->poi", R, pt_xyz) + t     # [P, O, 3]
    uv, _ = project(intr, pc)
    return uv - obs_uv, pc, R


def _robust_weights(r, obs_w):
    chi2 = jnp.sum(r * r, -1) * obs_w
    delta = jnp.sqrt(CHI2_2D)
    rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.where(rn <= delta, 1.0, delta / rn)
    return obs_w * w_huber, chi2


def _robust_cost(chi2):
    """Huber-composed total cost (what LM accept/reject compares)."""
    delta2 = CHI2_2D
    return jnp.sum(jnp.where(chi2 <= delta2, chi2,
                             2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2))


@functools.partial(jax.jit, static_argnames=("iters", "trim_rounds"))
def bundle_adjust(intr: Intrinsics, prob: BAProblem, *, iters: int = 10,
                  trim_rounds: int = 2) -> BAResult:
    """LM bundle adjustment with outlier trimming.

    `trim_rounds` outer rounds; after each, observations whose chi² exceeds
    5.991 at the current estimate are dropped (weight zeroed) — the two-stage
    robust scheme ORB-SLAM2's optimizer uses (Huber first, hard edge removal
    between stages)."""
    P, O = prob.obs_kf.shape
    K = prob.kf_pose.shape[0]
    base_valid = (prob.obs_kf >= 0) & (prob.obs_w > 0) & prob.pt_valid[:, None]
    kidx = jnp.clip(prob.obs_kf, 0, None)
    obs_valid = base_valid  # rebound inside rounds via trim mask

    def build_and_solve(kf_pose, pt_xyz, lam, obs_valid):
        r, pc, R = _residuals(intr, kf_pose, pt_xyz, prob.obs_kf, prob.obs_uv)
        w_eff, chi2 = _robust_weights(r, prob.obs_w)
        depth_ok = pc[..., 2] > 0.05
        w = jnp.where(obs_valid & depth_ok, w_eff, 0.0)      # [P, O]

        X, Y, Z = pc[..., 0], pc[..., 1], jnp.maximum(pc[..., 2], 1e-6)
        fx, fy = intr.fx, intr.fy
        zero = jnp.zeros_like(Z)
        Ju = jnp.stack([fx / Z, zero, -fx * X / Z ** 2], -1)
        Jv = jnp.stack([zero, fy / Z, -fy * Y / Z ** 2], -1)
        Jpix = jnp.stack([Ju, Jv], -2)                       # [P, O, 2, 3]

        # camera jacobian: left-perturbation on Tcw: dpc/dxi = [I | -skew(pc)]
        z3 = jnp.zeros_like(X)
        S = jnp.stack([
            jnp.stack([z3, -Z, Y], -1),
            jnp.stack([Z, z3, -X], -1),
            jnp.stack([-Y, X, z3], -1)], -2)                 # [P, O, 3, 3]
        I3 = jnp.broadcast_to(jnp.eye(3), S.shape)
        Jxi = jnp.concatenate([I3, -S], axis=-1)             # [P, O, 3, 6]
        Jc = Jpix @ Jxi                                      # [P, O, 2, 6]
        Jp = Jpix @ R                                        # [P, O, 2, 3] (dpc/dxw = R)

        # gauge: zero out jacobians of fixed cameras
        free = ~prob.cam_fixed
        cam_free = free[kidx]                                # [P, O]
        Jc = Jc * cam_free[..., None, None]

        # block builds
        Hpp = jnp.einsum("poki,po,pokj->pij", Jp, w, Jp)     # [P, 3, 3]
        # Marquardt damping: scale-relative (absolute damping is hopeless in
        # f32 against J^2 magnitudes ~1e5), plus a small absolute floor so
        # zero-observation points stay invertible.
        dHpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
        Hpp = Hpp + (lam * dHpp + 1e-3)[..., None] * jnp.eye(3)
        bp = jnp.einsum("poki,po,pok->pi", Jp, w, r)         # [P, 3]
        Hcc_blocks = jnp.einsum("poki,po,pokj->poij", Jc, w, Jc)  # [P, O, 6, 6]
        bc_blocks = jnp.einsum("poki,po,pok->poi", Jc, w, r)      # [P, O, 6]
        Wcp = jnp.einsum("poki,po,pokj->poij", Jc, w, Jp)    # [P, O, 6, 3]

        Hpp_inv = jnp.linalg.inv(Hpp)                        # [P, 3, 3]
        Ycp = jnp.einsum("poij,pjk->poik", Wcp, Hpp_inv)     # [P, O, 6, 3]

        # Schur contributions for every observation pair of each point:
        # S[k_o, k_n] -= Ycp_o @ Wcp_n^T   ([P, O, O, 6, 6] intermediate;
        # fine at local-BA sizes, chunk over P for global problems)
        S_pair = jnp.einsum("poij,pnkj->ponik", Ycp, Wcp)

        # scatter into dense [K, K, 6, 6]
        pair_valid = (w[:, :, None] > 0) & (w[:, None, :] > 0)
        rows = jnp.broadcast_to(kidx[:, :, None], (P, O, O))
        cols = jnp.broadcast_to(kidx[:, None, :], (P, O, O))
        flat_idx = (rows * K + cols).reshape(-1)
        contrib = (S_pair * pair_valid[..., None, None]).reshape(-1, 6, 6)
        S_cc = jnp.zeros((K * K, 6, 6)).at[flat_idx].add(contrib).reshape(K, K, 6, 6)

        Hcc = jnp.zeros((K, 6, 6)).at[kidx.reshape(-1)].add(
            Hcc_blocks.reshape(-1, 6, 6))
        bc = jnp.zeros((K, 6)).at[kidx.reshape(-1)].add(bc_blocks.reshape(-1, 6))

        # b_schur = bc - sum_po Ycp bp
        b_red_contrib = jnp.einsum("poij,pj->poi", Ycp, bp)
        b_red = bc - jnp.zeros((K, 6)).at[kidx.reshape(-1)].add(
            b_red_contrib.reshape(-1, 6))

        # reduced system: S_full = blockdiag(damped Hcc) - S_cc
        Sm = -S_cc
        dHcc = jnp.diagonal(Hcc, axis1=-2, axis2=-1)          # [K, 6]
        diag = Hcc + (lam * dHcc + 1e-3)[..., None] * jnp.eye(6)
        Sm = Sm.at[jnp.arange(K), jnp.arange(K)].add(diag)
        Sm_dense = Sm.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        # freeze fixed cameras: identity rows/cols
        free6 = jnp.repeat(free, 6)
        Sm_dense = jnp.where(free6[:, None] & free6[None, :], Sm_dense,
                             jnp.eye(K * 6))
        b_dense = jnp.where(free6, b_red.reshape(-1), 0.0)

        # Jacobi preconditioning keeps the f32 solve well-conditioned
        d = jnp.sqrt(jnp.clip(jnp.diagonal(Sm_dense), 1e-6, None))
        Sm_n = Sm_dense / (d[:, None] * d[None, :])
        y = jnp.linalg.solve(Sm_n, b_dense / d)
        dc = -(y / d).reshape(K, 6)
        dc = jnp.where(free[:, None], dc, 0.0)
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0)

        # back-substitute points: dp = -Hpp^-1 (bp + sum_o Wcp^T dc_k)
        dc_po = dc[kidx]                                     # [P, O, 6]
        wtd = jnp.einsum("poij,poi->pj", Wcp, dc_po)
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, bp + wtd)
        dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)

        new_pose = orthonormalize_pose(
            jax.vmap(lambda x, T: se3_exp(x) @ T)(dc, kf_pose))
        new_xyz = pt_xyz + dp
        return new_pose, new_xyz

    def chi2_of(kf_pose, pt_xyz):
        r, pc, _ = _residuals(intr, kf_pose, pt_xyz, prob.obs_kf, prob.obs_uv)
        chi2 = jnp.sum(r * r, -1) * prob.obs_w
        return chi2, pc[..., 2] > 0.05

    def cost_of(kf_pose, pt_xyz, obs_valid):
        chi2, depth_ok = chi2_of(kf_pose, pt_xyz)
        return _robust_cost(jnp.where(obs_valid & depth_ok, chi2, 0.0))

    init_cost = cost_of(prob.kf_pose, prob.pt_xyz, base_valid)

    def lm_step(carry, _):
        kf_pose, pt_xyz, lam, cost, obs_valid = carry
        cand_pose, cand_xyz = build_and_solve(kf_pose, pt_xyz, lam, obs_valid)
        cand_cost = cost_of(cand_pose, cand_xyz, obs_valid)
        accept = cand_cost < cost
        kf_pose = jnp.where(accept, cand_pose, kf_pose)
        pt_xyz = jnp.where(accept, cand_xyz, pt_xyz)
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        return (kf_pose, pt_xyz, lam, cost, obs_valid), cost

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
        trim_round, (prob.kf_pose, prob.pt_xyz, base_valid), None,
        length=trim_rounds)
    cost = cost_of(kf_pose, pt_xyz, obs_valid)
    return BAResult(kf_pose=kf_pose, pt_xyz=pt_xyz, cost=cost,
                    initial_cost=init_cost)
