"""Loop closing: Sim3 solving + pose-graph optimization (LoopClosing + g2o
Sim3 replacement, reference ``include/ORB_SLAM2/System.h:208-210``).

Pipeline parity with ORB-SLAM2's LoopClosing thread, as batched programs:

  1. detect: BoW candidates from slam.vocab.KeyFrameDatabase;
  2. geometric verification: descriptor matching between the two keyframes'
     3-D map points, vectorized RANSAC over Umeyama/Horn closed-form Sim3
     hypotheses (all hypotheses solved and scored in one vmapped batch);
  3. correction: scale-drift-aware pose-graph optimization over the
     essential graph (spanning tree + strong covisibility + loop edges) —
     Gauss-Newton on Sim3 with AD edge Jacobians, dense [7K, 7K] normal
     system (a few hundred keyframes → MXU-cheap dense Cholesky);
  4. map-point correction by each point's reference-keyframe Sim3 update.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import numpy as np

from semantic_slam_tpu.geometry.se3 import (
    se3_inverse, sim3_exp, sim3_inverse, sim3_log, sim3_to_matrix,
    sim3_transform_points, sim3_decompose, orthonormalize_pose)


# ---------------------------------------------------------------------------
# Closed-form Sim3 from 3-D correspondences (Horn/Umeyama), batched
# ---------------------------------------------------------------------------


def umeyama_sim3(src: jnp.ndarray, dst: jnp.ndarray,
                 w: jnp.ndarray) -> jnp.ndarray:
    """Weighted similarity dst ≈ s R src + t. src/dst [..., N, 3], w [..., N].

    Returns [..., 4, 4] sim3 matrices (sR | t). Batched closed form."""
    wsum = jnp.sum(w, -1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-9)
    mu_s = jnp.sum(src * wn[..., None], -2)
    mu_d = jnp.sum(dst * wn[..., None], -2)
    xs = src - mu_s[..., None, :]
    xd = dst - mu_d[..., None, :]
    cov = jnp.einsum("...ni,...nj,...n->...ij", xd, xs, wn)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(cov.shape[:-2] + (3,)).at[..., 2].set(jnp.sign(det))
    R = U @ (S[..., :, None] * Vt)
    var_s = jnp.sum(jnp.sum(xs * xs, -1) * wn, -1)
    s = jnp.sum(D * S, -1) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return sim3_to_matrix(s, R, t)


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_sim3(src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray,
                key: jnp.ndarray, *, n_hyp: int = 256,
                inlier_thresh: float = 0.05):
    """Vectorized RANSAC: sample `n_hyp` triples, solve all Sim3s in one
    batch, score 3-D transfer error, refine on the best consensus set.

    Returns (S [4,4] sim3 src->dst, inliers [N] bool, n_inliers)."""
    N = src.shape[0]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1e-9)
    idx = jax.random.choice(key, N, (n_hyp, 3), replace=True, p=probs)
    tri_src = src[idx]                                  # [H, 3, 3]
    tri_dst = dst[idx]
    w3 = jnp.ones((n_hyp, 3))
    S_h = umeyama_sim3(tri_src, tri_dst, w3)            # [H, 4, 4]
    pred = sim3_transform_points(S_h, jnp.broadcast_to(src, (n_hyp, N, 3)))
    err = jnp.linalg.norm(pred - dst[None], axis=-1)
    inl = (err < inlier_thresh) & valid[None, :]
    scores = jnp.sum(inl, -1)
    best = jnp.argmax(scores)
    inliers = inl[best]
    S_ref = umeyama_sim3(src, dst, inliers.astype(jnp.float32))
    # one more inlier re-evaluation after refinement
    pred2 = sim3_transform_points(S_ref[None], src[None])[0]
    err2 = jnp.linalg.norm(pred2 - dst, axis=-1)
    inliers2 = (err2 < inlier_thresh) & valid
    S_final = umeyama_sim3(src, dst, inliers2.astype(jnp.float32))
    return S_final, inliers2, jnp.sum(inliers2)


# ---------------------------------------------------------------------------
# Sim3 pose-graph optimization (essential graph)
# ---------------------------------------------------------------------------


class PoseGraphProblem(NamedTuple):
    S_kf: jnp.ndarray      # [K, 4, 4] initial Sim3 poses (world->kf)
    edge_i: jnp.ndarray    # [E] i32
    edge_j: jnp.ndarray    # [E] i32
    S_meas: jnp.ndarray    # [E, 4, 4] measured S_ji = S_j S_i^-1 (pre-loop)
    edge_w: jnp.ndarray    # [E] f32 edge weight (0 = padding)
    fixed: jnp.ndarray     # [K] bool


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(prob: PoseGraphProblem, *, iters: int = 12):
    """GN over Sim3 with residual r_e = log(S_meas_e · S_i · S_j⁻¹) — the
    g2o EdgeSim3 model ORB-SLAM2 uses in OptimizeEssentialGraph."""
    K = prob.S_kf.shape[0]
    E = prob.edge_i.shape[0]
    # One-hot edge incidence [E, K]: edge endpoints are constant across the
    # optimization, so pose gathers and the Hessian assembly become matmuls
    # (MXU) instead of arbitrary-index gathers/scatters (which run ~50x
    # below HBM bandwidth on TPU).
    Ei = (prob.edge_i[:, None] == jnp.arange(K)).astype(jnp.float32)
    Ej = (prob.edge_j[:, None] == jnp.arange(K)).astype(jnp.float32)

    def residual(xi_i, xi_j, S_i, S_j, S_m):
        # S_m = inv(S_ji_meas); zero when S_j S_i^-1 matches the measurement
        Si = sim3_exp(xi_i) @ S_i
        Sj = sim3_exp(xi_j) @ S_j
        return sim3_log(S_m @ Sj @ sim3_inverse(Si))

    def build(S_kf):
        Si = jnp.einsum("ek,kab->eab", Ei, S_kf)
        Sj = jnp.einsum("ek,kab->eab", Ej, S_kf)
        z7 = jnp.zeros((E, 7))
        r = jax.vmap(residual)(z7, z7, Si, Sj, prob.S_meas)     # [E, 7]
        Ji = jax.vmap(jax.jacfwd(residual, argnums=0))(z7, z7, Si, Sj, prob.S_meas)
        Jj = jax.vmap(jax.jacfwd(residual, argnums=1))(z7, z7, Si, Sj, prob.S_meas)
        w = prob.edge_w
        # assemble dense H [K, 7, K, 7], b [K, 7] as one-hot contractions
        Hii = jnp.einsum("eki,e,ekj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eki,e,ekj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eki,e,ekj->eij", Ji, w, Jj)
        bi = jnp.einsum("eki,e,ek->ei", Ji, w, r)
        bj = jnp.einsum("eki,e,ek->ei", Jj, w, r)
        H = (jnp.einsum("ek,el,eij->kilj", Ei, Ei, Hii)
             + jnp.einsum("ek,el,eij->kilj", Ej, Ej, Hjj)
             + jnp.einsum("ek,el,eij->kilj", Ei, Ej, Hij)
             + jnp.einsum("ek,el,eji->kilj", Ej, Ei, Hij))
        b = jnp.einsum("ek,ei->ki", Ei, bi) + jnp.einsum("ek,ei->ki", Ej, bj)
        return H, b

    def gn_step(S_kf, _):
        H, b = build(S_kf)                                  # [K, 7, K, 7]
        diagH = jnp.einsum("kikj->kij", H)                  # [K, 7, 7]
        dH = jnp.diagonal(diagH, axis1=-2, axis2=-1)
        Hm = (H + jnp.einsum(
            "kl,kij->kilj", jnp.eye(K),
            (1e-2 * dH + 1e-6)[..., None] * jnp.eye(7))).reshape(K * 7, K * 7)
        free7 = jnp.repeat(~prob.fixed, 7)
        Hm = jnp.where(free7[:, None] & free7[None, :], Hm, jnp.eye(K * 7))
        bm = jnp.where(free7, b.reshape(-1), 0.0)
        d = jnp.sqrt(jnp.clip(jnp.diagonal(Hm), 1e-8, None))
        L = jnp.linalg.cholesky(Hm / (d[:, None] * d[None, :]))
        y = jax.scipy.linalg.cho_solve((L, True), bm / d)
        dx = -(y / d).reshape(K, 7)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dx = jnp.clip(dx, -0.5, 0.5)
        S_new = jax.vmap(lambda x, S: sim3_exp(x) @ S)(dx, S_kf)
        return S_new, None

    S_out, _ = jax.lax.scan(gn_step, prob.S_kf, None, length=iters)
    return S_out


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


class LoopCloser:
    """Loop detection + correction over a SlamSystem's map arrays."""

    def __init__(self, system, vocab, min_matches: int = 20):
        from semantic_slam_tpu.slam.vocab import KeyFrameDatabase

        self.sys = system
        self.db = KeyFrameDatabase(vocab, system.K)
        self.min_matches = min_matches
        self.loops: List[Tuple[int, int]] = []

    def on_keyframe(self, kf_slot: int) -> Optional[Tuple[int, np.ndarray]]:
        """Call after each keyframe insertion. Returns (loop_kf, Sim3) when a
        loop is found and corrected."""
        s = self.sys
        desc = s.kf_desc[kf_slot]
        from semantic_slam_tpu.ops.orb import unpack_to_pm1
        desc_pm1 = np.asarray(unpack_to_pm1(jnp.asarray(desc)))
        valid = s.kf_kp_valid[kf_slot]
        covis = s.covis_idx[kf_slot]
        # slot index != recency once culled slots recycle: recency is the
        # tail of the insertion order
        recent = set(getattr(s, "kf_order", [])[-20:])
        cands = self.db.detect_loop_candidates(kf_slot, desc_pm1, valid,
                                               covis, recent=recent)
        self.db.add(kf_slot, desc_pm1, valid)
        if not cands:
            return None
        for cand_kf, score in cands[:3]:
            res = self._verify(kf_slot, cand_kf)
            if res is not None:
                S_corr, n_inl = res
                self._correct(kf_slot, cand_kf, S_corr)
                self.loops.append((kf_slot, cand_kf))
                return cand_kf, np.asarray(S_corr)
        return None

    def _point_set(self, kf_slot: int):
        """3-D map points observed by a keyframe + their descriptors."""
        s = self.sys
        obs_mask = (s.pt_obs_kf == kf_slot).any(axis=1) & s.pt_valid
        ids = np.nonzero(obs_mask)[0]
        return ids

    def _verify(self, kf_a: int, kf_b: int):
        """Descriptor-match the two keyframes' map points, RANSAC a Sim3
        S_ba mapping a-observed points onto b-observed points (world frames
        coincide pre-drift; the Sim3 captures accumulated drift)."""
        from semantic_slam_tpu.ops.match import match_descriptors
        from semantic_slam_tpu.ops.orb import unpack_to_pm1

        s = self.sys
        ida = self._point_set(kf_a)
        idb = self._point_set(kf_b)
        if len(ida) < self.min_matches or len(idb) < self.min_matches:
            return None
        cap = 512
        ida = ida[:cap]
        idb = idb[:cap]
        da = unpack_to_pm1(jnp.asarray(s.pt_desc[ida]))
        db_ = unpack_to_pm1(jnp.asarray(s.pt_desc[idb]))
        res = match_descriptors(da, db_, jnp.ones(len(ida), bool),
                                jnp.ones(len(idb), bool), max_dist=60,
                                ratio=0.85, mutual=True)
        midx = np.asarray(res.idx)
        sel = midx >= 0
        if sel.sum() < self.min_matches:
            return None
        src = s.pt_xyz[ida[sel]]
        dst = s.pt_xyz[idb[midx[sel]]]
        n = len(src)
        pad = max(0, 64 - n)
        src_p = np.pad(src, ((0, pad), (0, 0)))
        dst_p = np.pad(dst, ((0, pad), (0, 0)))
        valid = np.arange(len(src_p)) < n
        S, inl, n_inl = ransac_sim3(jnp.asarray(src_p), jnp.asarray(dst_p),
                                    jnp.asarray(valid), jax.random.PRNGKey(kf_a))
        if int(n_inl) < self.min_matches:
            return None
        return S, int(n_inl)

    def _correct(self, kf_cur: int, kf_loop: int, S_corr):
        """Essential-graph pose-graph optimization + map-point correction.

        S_corr maps current-side world coords onto loop-side world coords
        (the drift). The loop edge constrains S_cur' = S_cur ∘ S_corr⁻¹."""
        s = self.sys
        K = s.n_kf
        cap = s.K
        # current poses as Sim3 (scale 1)
        S_kf = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
        S_kf[:K] = s.kf_pose[:K]

        edges_i, edges_j, S_meas, w = [], [], [], []

        def add_edge(i, j, weight):
            S_ji = S_kf[j] @ np.linalg.inv(S_kf[i])
            edges_i.append(i)
            edges_j.append(j)
            S_meas.append(np.linalg.inv(S_ji))   # residual log(S_m S_i S_j^-1)
            w.append(weight)

        # spanning tree + strong covisibility
        seen = set()
        for k in range(K):
            p = s.kf_parent[k]
            if p >= 0:
                add_edge(int(p), k, 1.0)
                seen.add((min(int(p), k), max(int(p), k)))
        for k in range(K):
            for j, wt in zip(s.covis_idx[k], s.covis_w[k]):
                if j < 0 or wt < 100:
                    continue
                key = (min(k, int(j)), max(k, int(j)))
                if key in seen:
                    continue
                seen.add(key)
                add_edge(int(j), k, 1.0)
        # past accepted loop edges (KeyFrame::AddLoopEdge parity): once a
        # loop is closed its edge stays in the essential graph for every
        # later pose-graph optimization, pinning previously-corrected loops
        # while a new one is being absorbed
        for k in range(K):
            for j in s.loop_edges[k]:
                j = int(j)
                key = (min(k, j), max(k, j))
                if j < 0 or key in seen:
                    continue
                seen.add(key)
                add_edge(j, k, 20.0)
        # the loop edge with the measured relative Sim3: corrected current
        # pose = S_cur @ inv(S_corr). The weight stands in for the multiple
        # consistent LoopConnection edges upstream's CorrectLoop wires after
        # fusing the two groups — a single unit-weight edge would have to
        # fight every drift-consistent covisibility edge at equal strength.
        S_corr_inv = np.linalg.inv(np.asarray(S_corr))
        S_cur_corr = s.kf_pose[kf_cur] @ S_corr_inv
        S_rel = S_cur_corr @ np.linalg.inv(S_kf[kf_loop])
        edges_i.append(kf_loop)
        edges_j.append(kf_cur)
        S_meas.append(np.linalg.inv(S_rel))
        w.append(20.0)

        # pad the edge list to a 256 bucket: optimize_pose_graph is jitted
        # on [E] shapes, so without bucketing EVERY closure with a new edge
        # count pays a fresh XLA compile (and a long test session compiles
        # dozens of variants — one of which reproducibly segfaulted LLVM in
        # full-suite runs). edge_w == 0 rows are the designed padding: they
        # contribute zero to H and b.
        # Padding edges are (kf_loop, kf_loop) self-edges with identity
        # measurement: their residual/Jacobians go through sim3_log at exact
        # identity, which is only finite because so3_log sanitizes its input
        # before AD (a NaN Jacobian times w=0 would still be NaN and poison
        # H). Anchoring the pad on the FIXED node means that even if a future
        # geometry change broke AD-safety at identity, the poisoned rows are
        # excluded from the solve (free7 masks fixed nodes).
        E = len(edges_i)
        pad = max(256, -(-E // 256) * 256) - E
        edges_i += [kf_loop] * pad
        edges_j += [kf_loop] * pad
        S_meas += [np.eye(4, dtype=np.float32)] * pad
        w += [0.0] * pad
        fixed = np.zeros(cap, bool)
        fixed[kf_loop] = True
        # CorrectLoop parity: the current keyframe starts corrected
        S_kf[kf_cur] = S_cur_corr
        fixed[K:] = True
        prob = PoseGraphProblem(
            S_kf=jnp.asarray(S_kf),
            edge_i=jnp.asarray(np.array(edges_i, np.int32)),
            edge_j=jnp.asarray(np.array(edges_j, np.int32)),
            S_meas=jnp.asarray(np.stack(S_meas).astype(np.float32)),
            edge_w=jnp.asarray(np.array(w, np.float32)),
            fixed=jnp.asarray(fixed))
        S_opt = np.asarray(optimize_pose_graph(prob, iters=24))

        # apply: poses back to SE3 (strip scale), correct points by their
        # first-observing keyframe's Sim3 update
        old_poses = s.kf_pose.copy()
        for k in range(K):
            sc, R, t = [np.asarray(x) for x in sim3_decompose(jnp.asarray(S_opt[k]))]
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = t / sc
            s.kf_pose[k] = T
        # point correction: X' = S_k_new^-1 ∘ S_k_old (X) for ref kf k
        pts = np.nonzero(s.pt_valid)[0]
        ref = s.pt_obs_kf[pts, 0]
        ref = np.clip(ref, 0, K - 1)
        for k in np.unique(ref):
            sel = pts[ref == k]
            old = old_poses[k]
            new_inv = np.linalg.inv(s.kf_pose[k])
            X = s.pt_xyz[sel]
            Xc = X @ old[:3, :3].T + old[:3, 3]
            s.pt_xyz[sel] = Xc @ new_inv[:3, :3].T + new_inv[:3, 3]
        s.Tcw = s.kf_pose[kf_cur].copy()
        s.velocity = np.eye(4, dtype=np.float32)
        # record the accepted loop on both endpoints: protects them from
        # keyframe culling and keeps the edge in future essential graphs
        s._add_loop_edge(kf_cur, kf_loop)
        s._add_loop_edge(kf_loop, kf_cur)

        # LoopClosing::SearchAndFuse parity: project loop-side map points
        # into the corrected current-side keyframes and fuse duplicates.
        # The resulting cross-loop observations are the factors that keep
        # the loop closed under any subsequent bundle adjustment — without
        # them GBA sees only odometry-consistent reprojection terms and
        # relaxes the loop back open.
        loop_side = [kf_loop] + [int(j) for j in s.covis_idx[kf_loop][:5]
                                 if j >= 0 and s.kf_valid[j]]
        loop_pts = np.nonzero(
            s.pt_valid & np.isin(s.pt_obs_kf, loop_side).any(axis=1))[0]
        cur_side = [kf_cur] + [int(j) for j in s.covis_idx[kf_cur][:5]
                               if j >= 0 and s.kf_valid[j] and j != kf_loop]
        fused = 0
        for j in cur_side:
            # force_obs: a full observation table must not silently drop
            # the cross-loop factor (it evicts a redundant odometry
            # observation instead — see SlamSystem._add_observation)
            fused += s._fuse_into(loop_pts, j, radius=4.0, force_obs=True)
        if fused:
            for j in cur_side:
                s._update_covisibility(j)
            s._touch_map()
