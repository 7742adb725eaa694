"""Batched PnP RANSAC: camera pose from 2D-3D correspondences.

Fills the role of the P3P-RANSAC loop inside ORB-SLAM2's
Tracking::Relocalization (PnPsolver, consumed behind reference
``include/ORB_SLAM2/System.h:200-203``): a gross-error-tolerant pose
hypothesis from scratch, with no prior. The repo previously seeded
relocalization pose GN from the candidate keyframe's own pose — fine for
modest drift, wrong for kidnapped-robot cases where the true pose is far
from every candidate's.

TPU-native design: the whole RANSAC is ONE jitted program with static
shapes. ``n_hyp`` 6-point DLT hypotheses are solved by one batched 12x12
eigh (no per-hypothesis host loop), rotations are projected to SO(3) with
one batched 3x3 SVD, cheirality fixes the projective sign, and all
hypotheses are scored against all correspondences with one [B, M]
reprojection pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.geometry.camera import Intrinsics
from semantic_slam_tpu.slam.initializer import _sample_valid

CHI2_2D = 5.991


class PnPResult(NamedTuple):
    Tcw: jnp.ndarray       # [4, 4] best hypothesis pose (world -> camera)
    inliers: jnp.ndarray   # [M] bool reprojection inliers of the winner
    n_inliers: jnp.ndarray  # [] int32


@functools.partial(jax.jit, static_argnames=("n_hyp", "sigma"))
def pnp_ransac(intr: Intrinsics, pts_w: jnp.ndarray, uv: jnp.ndarray,
               valid: jnp.ndarray, *, n_hyp: int = 256,
               sigma: float = 2.0, seed: int = 0) -> PnPResult:
    """RANSAC pose from [M] 2D-3D correspondences (no initial guess).

    Each hypothesis: 6-point DLT for the projection matrix P = [R|t] in
    normalized camera coordinates, R recovered by orthogonal projection of
    P[:, :3] (the scale is the mean singular value), sign by cheirality
    vote. Follow with ``pose_optimize`` for a polished pose.
    """
    M = pts_w.shape[0]
    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], 1)  # [M, 2]

    key = jax.random.PRNGKey(seed)
    idx = _sample_valid(key, valid, n_hyp, 6)            # [B, 6]
    X = pts_w[idx]                                       # [B, 6, 3]
    x = xn[idx]                                          # [B, 6, 2]
    ones = jnp.ones(X.shape[:-1] + (1,))
    Xh = jnp.concatenate([X, ones], -1)                  # [B, 6, 4]
    zero4 = jnp.zeros_like(Xh)
    r1 = jnp.concatenate([Xh, zero4, -x[..., 0:1] * Xh], -1)   # [B, 6, 12]
    r2 = jnp.concatenate([zero4, Xh, -x[..., 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 1)                     # [B, 12, 12]
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    _, V = jnp.linalg.eigh(AtA)                          # ascending
    P = V[..., 0].reshape(n_hyp, 3, 4)                   # [B, 3, 4]
    # The DLT solution has an unknown global sign (P and -P project
    # identically only jointly with the depth sign). Rather than a flip
    # heuristic, treat BOTH signs as hypotheses: the wrong-sign copy puts
    # the scene behind the camera and scores ~zero inliers below.
    P = jnp.concatenate([P, -P])                         # [2B, 3, 4]

    # orthogonality projection: P[:, :3] ~= s * R with R in SO(3); for the
    # correct-sign copy det > 0 and the Frobenius-closest rotation is the
    # pose; the wrong-sign copy lands on det < 0 garbage that scoring kills
    M3 = P[:, :, :3]
    U, S, Vt = jnp.linalg.svd(M3)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = jnp.einsum("bij,bj,bjk->bik", U, D, Vt)          # [2B, 3, 3]
    s = jnp.maximum(jnp.mean(S[:, :2], axis=1), 1e-12)
    t = P[:, :, 3] / s[:, None]

    # score all hypotheses against all correspondences
    pc = jnp.einsum("bij,mj->bmi", R, pts_w) + t[:, None, :]   # [B, M, 3]
    z = pc[..., 2]
    zs = jnp.maximum(z, 1e-6)
    pu = fx * pc[..., 0] / zs + cx
    pv = fy * pc[..., 1] / zs + cy
    chi2 = ((pu - uv[None, :, 0]) ** 2 + (pv - uv[None, :, 1]) ** 2) \
        / (sigma * sigma)
    inl = valid[None, :] & (z > 0.05) & (chi2 < CHI2_2D)
    n_inl = jnp.sum(inl, 1)
    best = jnp.argmax(n_inl)

    Tcw = jnp.eye(4)
    Tcw = Tcw.at[:3, :3].set(R[best]).at[:3, 3].set(t[best])
    return PnPResult(Tcw=Tcw.astype(jnp.float32), inliers=inl[best],
                     n_inliers=n_inl[best].astype(jnp.int32))
