"""Monocular two-view map initialization.

Fills the role of ORB-SLAM2's ``Initializer`` behind the reference's
monocular entry point (``System::TrackMonocular``, reference
``include/ORB_SLAM2/System.h:64-68,85-90``): from one set of 2D-2D
correspondences, decide whether the pair admits a well-conditioned
reconstruction, recover the relative pose, and triangulate the seed map.

TPU-native design — the whole initializer is ONE jitted program with static
shapes; there is no per-hypothesis host loop:

  * ``n_hyp`` RANSAC hypotheses are drawn in parallel with a cumsum/
    searchsorted trick that only ever samples valid correspondences.
  * All essential-matrix candidates come from one batched eigh of the
    [n_hyp, 9, 9] normal matrices (8-point nullspace), rank-2-projected with
    one batched 3x3 SVD.
  * Parallel homography DLT hypotheses are scored the same way; the
    ORB-SLAM2 model-selection heuristic RH = SH / (SH + SF) (threshold 0.40,
    upstream Initializer::Initialize) gates out planar / low-parallax pairs.
    (Deviation: the planar branch defers initialization to a later frame
    pair instead of decomposing H — parallax-starved H inits are the main
    source of bad monocular seeds.)
  * The four (R, t) chambers of the best essential matrix are triangulated
    and cheirality / parallax / reprojection-checked for all matches at
    once: [4, M] linear systems solved by one batched 4x4 eigh.

Scores follow upstream CheckFundamental/CheckHomography: per-direction chi²
with a 3.84 (1-DoF transfer) / 5.99 (2-DoF) gate and (th - chi²) reward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.geometry.camera import Intrinsics

CHI2_1D = 3.841
CHI2_2D = 5.991


class TwoViewInit(NamedTuple):
    """Result of the batched two-view initializer (device arrays)."""
    score_f: jnp.ndarray      # [] best essential-model score
    score_h: jnp.ndarray      # [] best homography score
    R: jnp.ndarray            # [3, 3] cam1 -> cam2 rotation (best chamber)
    t: jnp.ndarray            # [3] unit-norm translation
    pts1: jnp.ndarray         # [M, 3] triangulated points in cam-1 frame
    good: jnp.ndarray         # [M] bool: passes cheirality/parallax/reproj
    n_good: jnp.ndarray       # [] int32 good count of the winning chamber
    n_good_second: jnp.ndarray  # [] int32 runner-up chamber good count
    n_candidate_matches: jnp.ndarray  # [] int32 matches the winner was
                              # scored over (the full valid set, not its
                              # epipolar support — see _phase note below)
    parallax_deg: jnp.ndarray  # [] ~50th-largest good-point parallax (deg)
    median_depth: jnp.ndarray  # [] median z of good points (scale anchor)


def _sample_valid(key, valid, n_hyp: int, k: int):
    """[n_hyp, k] indices drawn uniformly from the valid entries of `valid`
    (cumsum + searchsorted; no host compaction needed)."""
    cum = jnp.cumsum(valid.astype(jnp.int32))
    total = cum[-1]
    r = jax.random.uniform(key, (n_hyp, k))
    target = jnp.floor(r * total).astype(jnp.int32) + 1
    return jnp.searchsorted(cum, target.reshape(-1), side="left").reshape(
        n_hyp, k)


def _smallest_eigvec9(A):
    """[B, N, 9] -> [B, 9] nullspace direction via eigh of AᵀA."""
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    w, V = jnp.linalg.eigh(AtA)          # ascending eigenvalues
    return V[..., 0]


def _epipolar_chi2(F, x1, x2):
    """Symmetric epipolar transfer chi² for every (hypothesis, match).

    F: [B, 3, 3]; x1, x2: [M, 3] homogeneous pixel coords.
    Returns (chi2_21 [B, M], chi2_12 [B, M])."""
    l2 = jnp.einsum("bij,mj->bmi", F, x1)            # line in image 2
    l1 = jnp.einsum("bji,mj->bmi", F, x2)            # line in image 1
    num2 = jnp.einsum("mi,bmi->bm", x2, l2) ** 2
    num1 = num2                                       # x2ᵀFx1 == x1ᵀFᵀx2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    return num2 / jnp.maximum(den2, 1e-12), num1 / jnp.maximum(den1, 1e-12)


def _triangulate_batch(P2, x1, x2):
    """Linear triangulation of every match under projection [I|0] / P2.

    P2: [C, 3, 4] (chambers); x1, x2: [M, 2] *normalized* camera coords.
    Returns [C, M, 3] points in the cam-1 frame."""
    M = x1.shape[0]
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    rows1 = jnp.stack([x1[:, 0, None] * P1[2] - P1[0],
                       x1[:, 1, None] * P1[2] - P1[1]], 1)     # [M, 2, 4]
    rows2 = (x2[None, :, :, None] * P2[:, None, 2, None, :]
             - jnp.stack([P2[:, 0], P2[:, 1]], 1)[:, None, :, :])  # [C,M,2,4]
    A = jnp.concatenate([jnp.broadcast_to(rows1, rows2.shape), rows2], 2)
    AtA = jnp.einsum("cmni,cmnj->cmij", A, A)                   # [C, M, 4, 4]
    _, V = jnp.linalg.eigh(AtA)
    X = V[..., 0]                                               # [C, M, 4]
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < 1e-12,
                                  1e-12, X[..., 3:])


@functools.partial(jax.jit, static_argnames=("n_hyp", "sigma"))
def two_view_init(intr: Intrinsics, uv1: jnp.ndarray, uv2: jnp.ndarray,
                  valid: jnp.ndarray, *, n_hyp: int = 256,
                  sigma: float = 1.0, seed: int = 0) -> TwoViewInit:
    """Batched RANSAC two-view reconstruction from matched pixel coords.

    uv1, uv2: [M, 2] correspondences (uv1 in the reference frame, uv2 in the
    current frame); valid: [M] mask. The caller decides acceptance from the
    returned scores/counts (see ``SlamSystem._initialize_mono``)."""
    key = jax.random.PRNGKey(seed)
    M = uv1.shape[0]
    fx, fy, cx, cy = intr.fx, intr.fy, intr.cx, intr.cy
    # normalized (calibrated) coords
    n1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], 1)
    n2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], 1)
    h1 = jnp.concatenate([n1, jnp.ones((M, 1))], 1)
    h2 = jnp.concatenate([n2, jnp.ones((M, 1))], 1)
    p1 = jnp.concatenate([uv1, jnp.ones((M, 1))], 1)
    p2 = jnp.concatenate([uv2, jnp.ones((M, 1))], 1)
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)
    Kinv = jnp.array([[1 / fx, 0, -cx / fx], [0, 1 / fy, -cy / fy], [0, 0, 1]],
                     jnp.float32)
    sig2 = sigma * sigma

    # ---- essential hypotheses (8-point on normalized coords) -------------
    kf, kh = jax.random.split(key)
    idx_f = _sample_valid(kf, valid, n_hyp, 8)
    a1 = h1[idx_f]                                   # [n_hyp, 8, 3]
    a2 = h2[idx_f]
    # rows of the 8-point system: vec(x2 x1ᵀ)
    Af = (a2[..., :, None] * a1[..., None, :]).reshape(n_hyp, 8, 9)
    E = _smallest_eigvec9(Af).reshape(n_hyp, 3, 3)
    U, _, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt   # rank-2 projection
    # score in pixel space like upstream CheckFundamental
    Fpix = Kinv.T @ E @ Kinv                           # [n_hyp, 3, 3]
    c21, c12 = _epipolar_chi2(Fpix, p1, p2)
    c21, c12 = c21 / sig2, c12 / sig2
    inl_f = (c21 < CHI2_1D) & (c12 < CHI2_1D) & valid[None, :]
    score_f_all = jnp.sum(jnp.where(inl_f, (CHI2_2D - c21) + (CHI2_2D - c12),
                                    0.0), axis=1)
    best_f = jnp.argmax(score_f_all)
    score_f = score_f_all[best_f]
    E_best = E[best_f]
    inliers = inl_f[best_f]

    # consensus refit: re-estimate E from ALL inliers (minimal 8-point
    # samples are noise-limited; one masked 9x9 eigh per round fixes that),
    # then recompute the inlier set — two rounds, fully batched
    A_all = (h2[:, :, None] * h1[:, None, :]).reshape(M, 9)
    for _ in range(2):
        Aw = A_all * inliers[:, None]
        w9, V9 = jnp.linalg.eigh(Aw.T @ Aw)
        Er = V9[:, 0].reshape(3, 3)
        Ur, _, Vtr = jnp.linalg.svd(Er)
        Er = Ur @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vtr
        c21r, c12r = _epipolar_chi2((Kinv.T @ Er @ Kinv)[None], p1, p2)
        inliers = ((c21r[0] / sig2 < CHI2_1D) & (c12r[0] / sig2 < CHI2_1D)
                   & valid)
        E_best = Er

    # ---- homography hypotheses (4-point DLT, pixel coords) ---------------
    idx_h = _sample_valid(kh, valid, n_hyp, 4)
    # DLT in *normalized* coords (pixel-coord normal matrices are too
    # ill-conditioned for f32 eigh), then conjugate back to pixel space
    b1 = h1[idx_h]                                   # [n_hyp, 4, 3]
    b2 = h2[idx_h]
    zero = jnp.zeros_like(b1)
    r1 = jnp.concatenate([zero, -b1, b2[..., 1:2] * b1], -1)   # [n_hyp, 4, 9]
    r2 = jnp.concatenate([b1, zero, -b2[..., 0:1] * b1], -1)
    Ah = jnp.concatenate([r1, r2], 1)                # [n_hyp, 8, 9]
    Hn = _smallest_eigvec9(Ah).reshape(n_hyp, 3, 3)
    Hh = K @ Hn @ Kinv                               # pixel-space homography
    # symmetric transfer error (needs H⁻¹; batched 3x3 inverse)
    Hinv = jnp.linalg.inv(Hh + 1e-12 * jnp.eye(3))
    q2 = jnp.einsum("bij,mj->bmi", Hh, p1)
    q1 = jnp.einsum("bij,mj->bmi", Hinv, p2)
    e2 = jnp.sum((q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:]) < 1e-12, 1e-12,
                                          q2[..., 2:]) - uv2[None]) ** 2, -1)
    e1 = jnp.sum((q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12,
                                          q1[..., 2:]) - uv1[None]) ** 2, -1)
    e1, e2 = e1 / sig2, e2 / sig2
    inl_h = (e1 < CHI2_2D) & (e2 < CHI2_2D) & valid[None, :]
    score_h_all = jnp.sum(jnp.where(inl_h, (CHI2_2D - e1) + (CHI2_2D - e2),
                                    0.0), axis=1)
    score_h = jnp.max(score_h_all)

    # ---- decompose best E: four (R, t) chambers ---------------------------
    Ue, _, Vte = jnp.linalg.svd(E_best)
    # keep proper rotations
    Ue = Ue * jnp.sign(jnp.linalg.det(Ue))
    Vte = Vte * jnp.sign(jnp.linalg.det(Vte))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = Ue @ W @ Vte
    Rb = Ue @ W.T @ Vte
    tu = Ue[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    Rs_e = jnp.stack([Ra, Ra, Rb, Rb])               # [4, 3, 3]
    ts_e = jnp.stack([tu, -tu, tu, -tu])             # [4, 3]

    # ---- decompose best RANSAC H: eight Faugeras hypotheses ---------------
    # (ORB-SLAM2 Initializer::ReconstructH). Near-planar scenes (one wall
    # filling the view) make E degenerate — ANY e gives x2ᵀ[e]×Hx1 ≈ 0 on
    # coplanar points, so the 8-point E is a noise-shaped compromise even in
    # f64 (measured: 7° rotation error from 132 sub-pixel-true matches).
    # Decomposing the best *minimal* RANSAC homography (which locks onto the
    # dominant plane rather than averaging over relief) recovers the true
    # motion; triangulation-goodness then selects among all candidates.
    Hn_best = Hn[jnp.argmax(score_h_all)]            # normalized-coords H
    Uh, Sh, Vth = jnp.linalg.svd(Hn_best)
    sgn = jnp.linalg.det(Uh) * jnp.linalg.det(Vth)
    hd1, hd2, hd3 = Sh[0], Sh[1], Sh[2]
    den13 = jnp.maximum(hd1 ** 2 - hd3 ** 2, 1e-12)
    aux1 = jnp.sqrt(jnp.clip(hd1 ** 2 - hd2 ** 2, 0.0) / den13)
    aux3 = jnp.sqrt(jnp.clip(hd2 ** 2 - hd3 ** 2, 0.0) / den13)
    e1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    e3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3
    disc = jnp.sqrt(jnp.clip((hd1 ** 2 - hd2 ** 2)
                             * (hd2 ** 2 - hd3 ** 2), 0.0))
    # d' = +d2 chambers
    st = disc / jnp.maximum((hd1 + hd3) * hd2, 1e-12)
    ct = (hd2 ** 2 + hd1 * hd3) / jnp.maximum((hd1 + hd3) * hd2, 1e-12)
    st4 = jnp.array([1.0, -1.0, -1.0, 1.0]) * st
    zero4 = jnp.zeros(4)
    one4 = jnp.ones(4)
    Rp_a = jnp.stack([
        jnp.stack([ct * one4, zero4, -st4], -1),
        jnp.stack([zero4, one4, zero4], -1),
        jnp.stack([st4, zero4, ct * one4], -1)], 1)  # [4, 3, 3]
    tp_a = (hd1 - hd3) * jnp.stack([e1s, zero4, -e3s], -1)   # [4, 3]
    # d' = -d2 chambers
    sp = disc / jnp.maximum((hd1 - hd3) * hd2, 1e-12)
    cp = (hd1 * hd3 - hd2 ** 2) / jnp.maximum((hd1 - hd3) * hd2, 1e-12)
    sp4 = jnp.array([1.0, -1.0, -1.0, 1.0]) * sp
    Rp_b = jnp.stack([
        jnp.stack([cp * one4, zero4, sp4], -1),
        jnp.stack([zero4, -one4, zero4], -1),
        jnp.stack([sp4, zero4, -cp * one4], -1)], 1)
    tp_b = (hd1 + hd3) * jnp.stack([e1s, zero4, e3s], -1)
    Rp = jnp.concatenate([Rp_a, Rp_b])               # [8, 3, 3]
    tp = jnp.concatenate([tp_a, tp_b])               # [8, 3]
    Rs_h = sgn * jnp.einsum("ij,cjk,kl->cil", Uh, Rp, Vth)
    ts_h = jnp.einsum("ij,cj->ci", Uh, tp)
    th_norm = jnp.linalg.norm(ts_h, axis=-1, keepdims=True)
    h_ok = th_norm[:, 0] > 1e-9                      # degenerate => exclude
    ts_h = ts_h / jnp.maximum(th_norm, 1e-12)

    # ---- triangulate + chamber-check all 12 candidates together ----------
    Rs = jnp.concatenate([Rs_e, Rs_h])               # [12, 3, 3]
    ts = jnp.concatenate([ts_e, ts_h])               # [12, 3]
    # candidate support = ALL matches (not the model's epipolar/transfer
    # inliers): on relief-planar scenes the minimal-H transfer gate keeps
    # only points near the dominant plane, undercounting true support that
    # the stricter triangulate-and-reproject check below would accept.
    cand_inl = jnp.concatenate([
        jnp.broadcast_to(valid, (4, M)),
        jnp.broadcast_to(valid, (8, M)) & h_ok[:, None]])
    P2 = jnp.concatenate([Rs, ts[:, :, None]], -1)   # [12, 3, 4]

    pts = _triangulate_batch(P2, n1, n2)             # [12, M, 3] in cam 1
    z1 = pts[..., 2]
    pc2 = jnp.einsum("cij,cmj->cmi", Rs, pts) + ts[:, None, :]
    z2 = pc2[..., 2]
    # reprojection error in both images (pixels)
    pr1 = jnp.stack([fx * pts[..., 0] / jnp.maximum(z1, 1e-9) + cx,
                     fy * pts[..., 1] / jnp.maximum(z1, 1e-9) + cy], -1)
    pr2 = jnp.stack([fx * pc2[..., 0] / jnp.maximum(z2, 1e-9) + cx,
                     fy * pc2[..., 1] / jnp.maximum(z2, 1e-9) + cy], -1)
    err1 = jnp.sum((pr1 - uv1[None]) ** 2, -1)
    err2 = jnp.sum((pr2 - uv2[None]) ** 2, -1)
    # parallax: angle between the two viewing rays
    c2 = -jnp.einsum("cji,cj->ci", Rs, ts)           # cam-2 center in cam 1
    ray1 = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True),
                             1e-12)
    d2v = pts - c2[:, None, :]
    ray2 = d2v / jnp.maximum(jnp.linalg.norm(d2v, axis=-1, keepdims=True),
                             1e-12)
    cos_par = jnp.sum(ray1 * ray2, -1)
    good_c = (cand_inl & (z1 > 0) & (z2 > 0)
              & (err1 < 4.0 * sig2) & (err2 < 4.0 * sig2)
              & (cos_par < 0.99998))                 # > ~0.36 deg parallax
    n_good_c = jnp.sum(good_c, axis=1)
    # winner across both families by triangulation support; the dominance
    # check (n_good_second) stays WITHIN the winning family — the same
    # motion often appears in both families, and cross-family "runners-up"
    # would veto perfectly unambiguous reconstructions.
    ng_e, ng_h = n_good_c[:4], n_good_c[4:]
    e_sorted = jnp.sort(ng_e)[::-1]
    h_sorted = jnp.sort(ng_h)[::-1]
    win_is_h = h_sorted[0] > e_sorted[0]
    winner = jnp.where(win_is_h, 4 + jnp.argmax(ng_h), jnp.argmax(ng_e))
    n_good = jnp.where(win_is_h, h_sorted[0], e_sorted[0])
    n_good_second = jnp.where(win_is_h, h_sorted[1], e_sorted[1])
    # upstream minParallax gate: the ~50th-largest parallax angle among the
    # winner's good points (CheckRT sorts parallaxes and indexes min(50, n));
    # a unit-||t|| reconstruction of a pure rotation triangulates all its
    # points at enormous depth => tiny parallax => rejected downstream.
    cosp_w = jnp.where(good_c[winner], cos_par[winner], 1.0)
    cos_sorted = jnp.sort(cosp_w)                    # ascending = best first
    idx50 = jnp.minimum(jnp.maximum(n_good - 1, 0), 50)
    parallax_deg = jnp.degrees(
        jnp.arccos(jnp.clip(cos_sorted[idx50], -1.0, 1.0)))
    return TwoViewInit(
        score_f=score_f, score_h=score_h,
        R=Rs[winner], t=ts[winner], pts1=pts[winner], good=good_c[winner],
        n_good=n_good, n_good_second=n_good_second,
        n_candidate_matches=jnp.sum(cand_inl[winner]),
        parallax_deg=parallax_deg,
        median_depth=jnp.nanmedian(jnp.where(good_c[winner],
                                             pts[winner, :, 2], jnp.nan)))


def accept_init(res: TwoViewInit, n_matches: int, *, min_good: int = 80,
                min_ratio: float = 0.6,
                second_max_frac: float = 0.75) -> bool:
    """Host-side acceptance rule (upstream Initializer::ReconstructF/H
    semantics: dominant chamber, enough well-parallaxed points explaining
    most of the matches).

    Deviation from upstream: no RH = SH/(SH+SF) model gate — the family is
    already chosen inside ``two_view_init`` by triangulation support, which
    measured stronger than RH on near-planar scenes (RH=0.35 picked the
    degenerate F path while H reconstructed 132/143 matches). min_good=80
    (upstream uses 50) blocks the weak borderline seeds that round-3 testing
    showed starve monocular tracking within ~20 keyframes."""
    import numpy as np

    sf = float(res.score_f)
    sh = float(res.score_h)
    if (sf <= 0 or not np.isfinite(sf)) and (sh <= 0 or not np.isfinite(sh)):
        return False
    ng = int(res.n_good)
    n2 = int(res.n_good_second)
    return (ng >= min_good and n2 < second_max_frac * ng
            and ng >= min_ratio * max(n_matches, 1)
            and float(res.parallax_deg) > 1.0               # minParallax
            and np.isfinite(float(res.median_depth)))
