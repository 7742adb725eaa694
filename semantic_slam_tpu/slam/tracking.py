"""Frame tracking: pose-only Gauss-Newton + search-by-projection.

TPU-native replacement for ORB-SLAM2's ``Tracking`` thread (constant-velocity
motion model, projection-window matching, pose optimization, keyframe
decision — reference ``include/ORB_SLAM2/System.h:200-203``). The per-frame
compute (project all map points, window-match descriptors, iterate GN) is one
jitted program with static shapes; only the keyframe decision and map growth
stay on the host.

Pose parametrization: left-multiplied se3 twist, Tcw = exp(xi) ⊕ Tcw_prev.
Robustness: Huber weights with per-level inv-sigma² scaling (ORB-SLAM2's
pyramid noise model), plus a chi² cut between GN rounds (its 4-round outlier
rejection, made branchless via weight masks).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.geometry.camera import (Intrinsics, project, in_image,
                                               undistort_points)
from semantic_slam_tpu.geometry.se3 import se3_exp, transform_points, orthonormalize_pose
from semantic_slam_tpu.ops.match import (match_descriptors, window_mask,
                                         level_mask, rotation_consistency)

CHI2_2D = 5.991  # 95% chi2 with 2 dof (ORB-SLAM2 outlier threshold)


class PoseOptResult(NamedTuple):
    Tcw: jnp.ndarray        # [4, 4]
    inliers: jnp.ndarray    # [N] bool
    chi2: jnp.ndarray       # [] final weighted cost
    n_inliers: jnp.ndarray  # [] int32


@functools.partial(jax.jit, static_argnames=("iters", "rounds"))
def pose_optimize(
    intr: Intrinsics,
    Tcw0: jnp.ndarray,
    pts_w: jnp.ndarray,      # [N, 3]
    uv_obs: jnp.ndarray,     # [N, 2]
    w_valid: jnp.ndarray,    # [N] bool
    inv_sigma2: jnp.ndarray, # [N] per-obs information (1/sigma^2)
    *,
    iters: int = 2,
    rounds: int = 4,
) -> PoseOptResult:
    """Pose-only bundle adjustment on one camera.

    `rounds` outer rounds of `iters` GN steps; after each round observations
    with chi² > 5.991 are masked out (and can re-enter if they recover, like
    ORB-SLAM2's PoseOptimization). Two GN steps per round suffice from a
    motion-model / keyframe initialization (quadratic convergence); the
    sequential step chain is launch-latency-bound on TPU, so fewer, fatter
    rounds are the right trade."""

    def residuals_jac(Tcw):
        pc = transform_points(Tcw[None], pts_w[None])[0]      # [N, 3]
        uv, z = project(intr, pc)
        r = uv - uv_obs                                       # [N, 2]
        X, Y = pc[:, 0], pc[:, 1]
        Z = jnp.maximum(z, 1e-6)
        fx, fy = intr.fx, intr.fy
        zero = jnp.zeros_like(Z)
        # d(uv)/d(p_cam):
        Ju = jnp.stack([fx / Z, zero, -fx * X / Z ** 2], -1)  # [N, 3]
        Jv = jnp.stack([zero, fy / Z, -fy * Y / Z ** 2], -1)
        Jp = jnp.stack([Ju, Jv], -2)                          # [N, 2, 3]
        # d(p_cam)/d(xi) for left perturbation: [I | -skew(p_cam)]
        I3 = jnp.broadcast_to(jnp.eye(3), (pts_w.shape[0], 3, 3))
        px = pc[:, 0]; py = pc[:, 1]; pz = pc[:, 2]
        z3 = jnp.zeros_like(px)
        S = jnp.stack([
            jnp.stack([z3, -pz, py], -1),
            jnp.stack([pz, z3, -px], -1),
            jnp.stack([-py, px, z3], -1)], -2)                # [N, 3, 3] skew
        Jxi = jnp.concatenate([I3, -S], axis=-1)              # [N, 3, 6]
        J = Jp @ Jxi                                          # [N, 2, 6]
        return r, J, z

    def gn_step(carry, i):
        # ONE residual evaluation per step: the chi2 inlier re-ranking that
        # ORB-SLAM2 does between rounds is folded into the step itself —
        # the step's weights use the mask CARRIED from the previous step's
        # residuals, and the mask refreshes every step (after a burn-in of
        # `iters` ungated steps so the initial-pose error can't gate out
        # good points). Sequential tiny-kernel chains are launch-latency-
        # bound on TPU and the separate re-evaluation pass was a third of
        # them. Masked-out observations re-enter when they recover, as in
        # ORB-SLAM2's PoseOptimization.
        Tcw, w_mask = carry
        r, J, z = residuals_jac(Tcw)
        chi2 = jnp.sum(r * r, -1) * inv_sigma2
        valid = w_valid & (z > 0.05)
        # Huber on the residual norm
        delta = jnp.sqrt(CHI2_2D)
        rn = jnp.sqrt(jnp.maximum(chi2, 1e-12))
        w_huber = jnp.where(rn <= delta, 1.0, delta / rn)
        w = (w_mask & valid) * inv_sigma2 * w_huber       # [N]
        H = jnp.einsum("nik,n,nil->kl", J, w, J)
        b = jnp.einsum("nik,n,ni->k", J, w, r)
        H = H + 1e-6 * jnp.eye(6)
        dx = -jnp.linalg.solve(H, b)
        # trust region: a near-singular system (too few matches) must not
        # produce a huge twist — f32 Rodrigues degrades at large angles
        # and the pose would leave the basin instead of re-entering it.
        nrm = jnp.linalg.norm(dx)
        dx = dx * jnp.minimum(1.0, 1.0 / (nrm + 1e-12))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        new_mask = jnp.where(i + 1 < iters, w_valid,
                             valid & (chi2 <= CHI2_2D))
        return (se3_exp(dx) @ Tcw, new_mask), None

    (Tcw, w_mask), _ = jax.lax.scan(gn_step, (Tcw0, w_valid),
                                    jnp.arange(iters * rounds))
    Tcw = orthonormalize_pose(Tcw)
    r, _, z = residuals_jac(Tcw)
    chi2 = jnp.sum(r * r, -1) * inv_sigma2
    inliers = w_mask & (chi2 <= CHI2_2D)
    return PoseOptResult(
        Tcw=Tcw,
        inliers=inliers,
        chi2=jnp.sum(jnp.where(inliers, chi2, 0.0)),
        n_inliers=jnp.sum(inliers).astype(jnp.int32),
    )


class TrackResult(NamedTuple):
    Tcw: jnp.ndarray          # [4, 4] optimized pose
    n_matches: jnp.ndarray    # [] i32 accepted projection matches
    n_inliers: jnp.ndarray    # [] i32 pose-opt inliers
    match_pt: jnp.ndarray     # [N_kp] i32 map-point slot matched to each keypoint (-1)
    inlier_kp: jnp.ndarray    # [N_kp] bool keypoint is a pose inlier


@functools.partial(jax.jit, static_argnames=("radius", "radius2", "max_dist",
                                             "max_candidates",
                                             "use_rotation"))
def track_with_map(
    intr: Intrinsics,
    Tcw_pred: jnp.ndarray,     # [4, 4] motion-model prediction
    pt_xyz: jnp.ndarray,       # [P, 3] map points (world)
    pt_desc_pm1: jnp.ndarray,  # [P, 256] int8
    pt_valid: jnp.ndarray,     # [P] bool
    kp_uv: jnp.ndarray,        # [N, 2] frame keypoints (undistorted)
    kp_desc_pm1: jnp.ndarray,  # [N, 256] int8
    kp_valid: jnp.ndarray,     # [N] bool
    kp_level: jnp.ndarray,     # [N] i32
    width: int = 640,
    height: int = 480,
    pt_angle: jnp.ndarray = None,   # [P] map-point reference angle (rad)
    kp_angle: jnp.ndarray = None,   # [N] keypoint angle (rad)
    *,
    radius: float = 15.0,
    radius2: float = 6.0,
    max_dist: int = 75,
    max_candidates: int = 4096,
    use_rotation: bool = False,
) -> TrackResult:
    """TWO-STAGE search-by-projection + pose GN against a (local) map.

    Mirrors ORB-SLAM2's TrackWithMotionModel THEN TrackLocalMap: stage 1
    projects every valid map point with the predicted pose and matches in a
    wide window (`radius`, motion-model uncertainty); stage 2 re-projects
    with the refined pose and gathers ALL matchable points in a tight window
    (`radius2`, refined-pose uncertainty), then re-optimizes. The second
    gather is what keeps the inlier count near the matchable ceiling when
    the motion model is only approximately right — single-pass tracking
    collapses (20 matches from a 700-point visible map) the moment the
    prediction drifts half a window. The stage-2 result is kept only when
    it does not lose inliers (a diverged stage 1 must not poison stage 2).
    Both stages are in ONE jitted program, and the expensive
    pose-INDEPENDENT work — candidate compaction, the [C, 256] descriptor
    gather, and the [C, N] Hamming matmul — is computed once and shared:
    stage 2 only re-projects the candidate set with the refined pose and
    re-masks the same distance matrix (the r4 always-on second stage cost
    ~1.4x a single pass; shared-gather brings it back near 1x). Stage 2
    additionally sits behind a lax.cond confidence gate — when stage 1 is
    already at its inlier ceiling the second GN chain never executes
    (the frame is latency-bound on sequential GN steps, ~0.15 ms each).
    """
    P = pt_xyz.shape[0]
    C = min(max_candidates, P)
    N = kp_uv.shape[0]
    from semantic_slam_tpu.ops.compact import compact_indices
    from semantic_slam_tpu.ops.match import hamming_matrix

    # ---- shared, pose-independent stage -------------------------------
    pc = transform_points(Tcw_pred[None], pt_xyz[None])[0]
    uv_proj0, z0 = project(intr, pc)
    visible = pt_valid & (z0 > 0.05) & in_image(uv_proj0, width, height,
                                                margin=5)
    cand, cvis = compact_indices(visible, C)
    cdesc = pt_desc_pm1[cand]
    cxyz = pt_xyz[cand]
    D = hamming_matrix(cdesc, kp_desc_pm1)                       # [C, N]
    # scale-aware search window (ORB-SLAM2 SearchByProjection: radius
    # grows as th * scaleFactor^octave — the keypoint's pyramid level
    # sets the localization uncertainty; knobs config/TUM3.yaml:41-54)
    kp_rbase = 1.2 ** kp_level.astype(jnp.float32)               # [N]
    inv_sigma2_kp = 1.0 / kp_rbase ** 2

    def one_pass(Tcw0, rad, rounds):
        cuv, cz = project(intr, transform_points(Tcw0[None], cxyz[None])[0])
        cvis_now = cvis & (cz > 0.05) & in_image(cuv, width, height,
                                                 margin=5)
        d2 = jnp.sum((cuv[:, None, :] - kp_uv[None, :, :]) ** 2, axis=-1)
        mask = d2 <= (rad * kp_rbase)[None, :] ** 2
        res = match_descriptors(cdesc, kp_desc_pm1, cvis_now, kp_valid,
                                mask, D, max_dist=max_dist, ratio=0.95,
                                mutual=True)
        if use_rotation:
            # ORB-SLAM2 CheckOrientation: the angle delta between a map
            # point's reference observation and its new match concentrates
            # in few histogram bins under rigid motion; off-bin matches are
            # outliers (rotation-rich sequences especially)
            res = rotation_consistency(pt_angle[cand], kp_angle, res)
        matched = res.idx >= 0                                   # [C]
        kp_idx = jnp.clip(res.idx, 0, None)
        uv_obs = kp_uv[kp_idx]
        inv_sigma2 = inv_sigma2_kp[kp_idx]
        opt = pose_optimize(intr, Tcw0, cxyz, uv_obs, matched, inv_sigma2,
                            rounds=rounds)
        # per-keypoint view of the matching (for host map bookkeeping)
        match_pt = jnp.full((N,), -1, jnp.int32)
        match_pt = match_pt.at[kp_idx].set(
            jnp.where(matched, cand.astype(jnp.int32), -1), mode="drop")
        inlier_kp = jnp.zeros((N,), bool).at[kp_idx].set(opt.inliers,
                                                         mode="drop")
        return opt, jnp.sum(matched).astype(jnp.int32), match_pt, inlier_kp

    # stage 1: 3 GN rounds — from a motion-model init, 6 steps reach the
    # same basin as 8 (quadratic convergence; one fewer gated-mask round).
    # NOTE a confidence-gated lax.cond skip of stage 2 was tried and
    # REVERTED: stage 2's tight re-gather raises the matchable ceiling
    # (new matches at the refined pose), so "stage 1 is already at its
    # inlier ceiling" is not decidable from stage-1 statistics — the gate
    # broke the monocular ring north-star.
    opt1, nm1, mpt1, ikp1 = one_pass(Tcw_pred, radius, rounds=3)
    opt2, nm2, mpt2, ikp2 = one_pass(opt1.Tcw, radius2, rounds=4)
    use2 = opt2.n_inliers >= opt1.n_inliers
    return TrackResult(
        Tcw=jnp.where(use2, opt2.Tcw, opt1.Tcw),
        n_matches=jnp.where(use2, nm2, nm1),
        n_inliers=jnp.where(use2, opt2.n_inliers, opt1.n_inliers),
        match_pt=jnp.where(use2, mpt2, mpt1),
        inlier_kp=jnp.where(use2, ikp2, ikp1),
    )


@functools.partial(jax.jit, static_argnames=("orb_cfg", "width", "height",
                                              "radius", "max_dist",
                                              "max_candidates"))
def track_frame(
    intr: Intrinsics,
    Tcw_pred: jnp.ndarray,     # [4, 4]
    pt_xyz: jnp.ndarray,       # [P, 3]
    pt_desc_pm1: jnp.ndarray,  # [P, 256] int8
    pt_valid: jnp.ndarray,     # [P] bool
    img: jnp.ndarray,          # [H, W] grayscale f32
    orb_cfg,
    width: int = 640,
    height: int = 480,
    *,
    radius: float = 15.0,
    max_dist: int = 75,
    max_candidates: int = 4096,
):
    """Fused per-frame program: ORB extraction + search-by-projection + pose
    GN in ONE compiled call. The reference pays a thread handoff between
    `ORBextractor` and `Tracking` per frame (System.cc:213); two separate jit
    calls pay a device dispatch each (~0.5-1 ms through a remote transport)
    — fusing removes the boundary and lets XLA overlap the pyramid with the
    map projection. Returns (features, TrackResult). Keypoints are
    undistorted before matching (Frame::UndistortKeyPoints parity — map
    geometry lives in ideal pinhole coordinates; a no-op for zero
    coefficients)."""
    from semantic_slam_tpu.ops.orb import extract_orb  # local: avoid cycle
    feats = extract_orb(img, orb_cfg)
    uv_und = undistort_points(intr, feats.uv)
    res = track_with_map(intr, Tcw_pred, pt_xyz, pt_desc_pm1, pt_valid,
                         uv_und, feats.desc_pm1, feats.valid, feats.level,
                         width, height, radius=radius, max_dist=max_dist,
                         max_candidates=max_candidates)
    return feats, res


@functools.partial(jax.jit, static_argnames=("orb_cfg", "width", "height",
                                              "radius", "max_dist",
                                              "max_candidates",
                                              "use_rotation"))
def track_rgbd_frame(
    intr: Intrinsics,
    Tcw_pred: jnp.ndarray,     # [4, 4]
    pt_xyz: jnp.ndarray,       # [P, 3]
    pt_desc_pm1: jnp.ndarray,  # [P, 256] int8
    pt_valid: jnp.ndarray,     # [P] bool
    img: jnp.ndarray,          # [H, W] grayscale f32
    depth: jnp.ndarray,        # [H, W] metric depth f32
    orb_cfg,
    width: int = 640,
    height: int = 480,
    pt_angle: jnp.ndarray = None,  # [P] map-point reference angle
    *,
    radius: float = 15.0,
    max_dist: int = 75,
    max_candidates: int = 4096,
    use_rotation: bool = False,
):
    """RGB-D per-frame program with a single packed host readback.

    Through a remote transport every host readback costs ~30 ms of latency;
    the naive driver loop (read back uv, depth samples, pose, counters,
    match tables separately) pays it ~8x per frame. This variant runs the
    whole frame on device — ORB extraction, per-keypoint depth sampling,
    projection matching, pose GN — and packs everything the host-side
    orchestrator needs into ONE f32 vector:

      pack[0:16]        Tcw (row-major)
      pack[16]          n_matches
      pack[17]          n_inliers
      pack[18+0N:18+1N] match_pt   (map slot per keypoint, -1 = none)
      pack[18+1N:18+2N] inlier_kp  (0/1)
      pack[18+2N:18+3N] u          (undistorted)
      pack[18+3N:18+4N] v          (undistorted)
      pack[18+4N:18+5N] level
      pack[18+5N:18+6N] depth at keypoint (sampled at the RAW pixel)
      pack[18+6N:18+7N] valid      (0/1)
      pack[18+7N:18+8N] angle      (radians)

    Descriptors (only needed on the rare keyframe-insertion frames) are
    returned as device arrays and read back lazily by the caller.
    Returns (pack [18+8N] f32, desc_u8 [N,32], desc_pm1 [N,256])."""
    from semantic_slam_tpu.ops.orb import extract_orb  # local: avoid cycle
    feats = extract_orb(img, orb_cfg)
    # Frame::UndistortKeyPoints parity: match/optimize in ideal pinhole
    # coordinates; depth is sampled at the raw detection pixel (the sensor
    # grid), not the undistorted one
    uv_und = undistort_points(intr, feats.uv)
    res = track_with_map(intr, Tcw_pred, pt_xyz, pt_desc_pm1, pt_valid,
                         uv_und, feats.desc_pm1, feats.valid, feats.level,
                         width, height, pt_angle, feats.angle,
                         radius=radius, max_dist=max_dist,
                         max_candidates=max_candidates,
                         use_rotation=use_rotation)
    xi = jnp.clip(feats.uv[:, 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(feats.uv[:, 1].astype(jnp.int32), 0, height - 1)
    kp_depth = depth[yi, xi]
    f32 = jnp.float32
    pack = jnp.concatenate([
        res.Tcw.reshape(-1).astype(f32),
        jnp.stack([res.n_matches.astype(f32), res.n_inliers.astype(f32)]),
        res.match_pt.astype(f32),
        res.inlier_kp.astype(f32),
        uv_und[:, 0].astype(f32),
        uv_und[:, 1].astype(f32),
        feats.level.astype(f32),
        kp_depth.astype(f32),
        feats.valid.astype(f32),
        feats.angle.astype(f32),
    ])
    return pack, feats.desc_u8, feats.desc_pm1


def need_keyframe(n_inliers: int, n_ref_inliers: int, frames_since_kf: int,
                  *, min_inliers: int = 30, ratio: float = 0.75,
                  max_gap: int = 30) -> bool:
    """Host-side keyframe decision (condensed ORB-SLAM2 NeedNewKeyFrame:
    insert when tracking weakens below a fraction of the reference keyframe
    or after a maximum frame gap, provided tracking is still healthy)."""
    if n_inliers < min_inliers:
        return False
    return (n_inliers < ratio * max(n_ref_inliers, 1)) or (frames_since_kf >= max_gap)
