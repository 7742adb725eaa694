"""Organized-cloud surface normals + Difference of Normals on TPU.

Replaces PCL's ``NormalEstimationOMP`` + ``DifferenceOfNormalsEstimation``
(reference ``src/DoN.cpp:166-213``). The reference does kd-tree radius
searches per point; the TPU formulation exploits that the cloud is *organized*
(a depth image): a metric search radius at depth z subtends ~``f·r/z`` pixels,
so per-pixel covariance over the neighborhood is four taps into integral
images (summed-area tables) of the point moments, with a per-pixel window
size — O(1) per pixel, fully vectorized, no neighbor lists.

Normal = eigenvector of the smallest eigenvalue of the windowed covariance
(computed closed-form for 3x3 symmetric), sign-flipped toward the viewpoint
at +∞ (PCL ``setViewPoint(FLT_MAX,...)``, which reduces to flipping when
nx+ny+nz < 0 — reference ``src/DoN.cpp:176-179``).

DoN field = (n_small − n_large)/2; its magnitude is stored as "curvature"
in PCL and thresholded by ``DoN.threshold`` (``src/DoN.cpp:226-239``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from semantic_slam_tpu.geometry.camera import Intrinsics


def backproject_organized(depth: jnp.ndarray, intr: Intrinsics,
                          sensor: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[H, W] depth/range image -> ([H, W, 3] points, [H, W] valid)."""
    H, W = depth.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = (xs - intr.cx) / intr.fx
    y = (ys - intr.cy) / intr.fy
    if sensor == 1:
        rim = jnp.sqrt(x * x + y * y + 1.0)
        d = depth / rim
    else:
        d = depth
    valid = depth > 0
    pts = jnp.stack([x * d, y * d, d], axis=-1)
    return jnp.where(valid[..., None], pts, 0.0), valid


@functools.lru_cache(maxsize=None)
def _tri(n: int) -> np.ndarray:
    """[n, n] lower-triangular ones (inclusive-prefix-sum matmul operand)."""
    return np.tril(np.ones((n, n), np.float32))


def _integral(img: jnp.ndarray) -> jnp.ndarray:
    """2-D inclusive summed-area table with a zero row/col prepended.

    Layout: CHANNELS-FIRST [C, H, W]. TPU tiles the last two axes to
    (8, 128); a channels-last [H, W, 10] stack pads its 10-lane axis to
    128 — a 12x memory blowup that dominated this op. With [C, H, W] the
    tiled axes are the image axes and nothing is padded.

    Prefix sums are lower-triangular MATMULS, not lax.cumsum: a cumulative
    scan over the stack costs ~3 ms/axis on TPU, while the equivalent
    [H,H] @ img @ [W,W]ᵀ triangular products are ~12 GFLOP of f32 MXU work.
    Summation-order change vs sequential cumsum is within f32 SAT error
    (already accepted by this design)."""
    H, W = img.shape[-2], img.shape[-1]
    tri_h = jnp.asarray(_tri(H))
    tri_w = jnp.asarray(_tri(W))
    s = jnp.einsum("hk,ckw->chw", tri_h, img)
    s = jnp.einsum("chk,wk->chw", s, tri_w)
    return jnp.pad(s, ((0, 0),) * (img.ndim - 2) + ((1, 0), (1, 0)))


# Quantized window radii. Per-pixel metric radii are snapped to the nearest
# entry so every SAT read is a STATIC shift (a dense slice of the padded
# table) instead of a per-pixel gather — XLA gathers run ~50x below TPU
# bandwidth and dominated this op's cost; static shifts are bandwidth-bound.
_RADII = (1, 2, 3, 4, 6, 8, 12, 16, 24)


def _box_sum(sat: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Window sums with per-pixel radius r [H, W] snapped to _RADII.

    sat is [C, H+1, W+1]; returns [C, H, W] sums over the clipped
    (2r'+1)x(2r'+1) window. Index clamping is emulated by edge-replicating
    the SAT (a clamped cumulative read equals the replicated edge value).
    The per-pixel radius select accumulates masked terms instead of
    materializing a [R, C, H, W] stack (memory-bound op; keep the live set
    one radius wide).
    """
    H = sat.shape[-2] - 1
    W = sat.shape[-1] - 1
    rmax = _RADII[-1]
    satp = jnp.pad(sat, ((0, 0), (rmax, rmax + 1), (rmax, rmax + 1)),
                   mode="edge")
    radii = jnp.asarray(_RADII, jnp.float32)
    sel = jnp.argmin(jnp.abs(r.astype(jnp.float32)[..., None]
                             - radii[None, None, :]), axis=-1)  # [H, W]

    out = jnp.zeros((sat.shape[0], H, W), sat.dtype)
    for i, rr in enumerate(_RADII):
        a = rmax + rr + 1
        b = rmax - rr
        box = (satp[:, a:a + H, a:a + W] - satp[:, b:b + H, a:a + W]
               - satp[:, a:a + H, b:b + W] + satp[:, b:b + H, b:b + W])
        out = out + box * (sel == i)[None]
    return out


def _smallest_eigvec_3x3(C: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of symmetric 3x3 [..., 3, 3].

    Closed-form: eigenvalues via the trigonometric method, eigenvector via
    cross products of (C - λI) rows (most orthogonal pair). Fully batched.
    """
    # eigenvalues (Smith's method)
    q = jnp.trace(C, axis1=-2, axis2=-1) / 3.0
    Ci = C - q[..., None, None] * jnp.eye(3, dtype=C.dtype)
    p2 = jnp.sum(Ci * Ci, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    detB = jnp.linalg.det(Ci / p[..., None, None])
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig1 = q + 2.0 * p * jnp.cos(phi)                     # largest
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3)  # smallest
    eig2 = 3.0 * q - eig1 - eig3

    # eigenvector for eig3: null space of (C - eig3 I) ~ cross of two rows
    A = C - eig3[..., None, None] * jnp.eye(3, dtype=C.dtype)
    r0, r1, r2 = A[..., 0, :], A[..., 1, :], A[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], -1), axis=-1)
    v = jnp.take_along_axis(
        jnp.stack([c01, c02, c12], axis=-2),
        best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(nrm, 1e-12)
    # degenerate (isotropic) fallback
    v = jnp.where(nrm > 1e-10, v, jnp.array([0.0, 0.0, 1.0], C.dtype))
    return v


def _smallest_eigvec_planes(cxx, cxy, cxz, cyy, cyz, czz):
    """Plane-wise closed-form smallest eigenvector of a symmetric 3x3 field.

    Same math as _smallest_eigvec_3x3 but on six [H, W] planes: tensors
    with trailing (3,) / (3, 3) axes tile-pad those axes to (8, 128) on TPU
    — a 40-100x memory blowup that dominated the normals stage. Everything
    here is [H, W]-shaped VPU arithmetic. Returns (nx, ny, nz) planes."""
    q = (cxx + cyy + czz) / 3.0
    bxx, byy, bzz = cxx - q, cyy - q, czz - q
    p2 = (bxx * bxx + byy * byy + bzz * bzz
          + 2.0 * (cxy * cxy + cxz * cxz + cyz * cyz)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    det_b = (bxx * (byy * bzz - cyz * cyz)
             - cxy * (cxy * bzz - cyz * cxz)
             + cxz * (cxy * cyz - byy * cxz)) / (p * p * p)
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    eig3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)   # smallest

    axx, ayy, azz = cxx - eig3, cyy - eig3, czz - eig3
    # rows of (C - eig3 I): r0=(axx,cxy,cxz) r1=(cxy,ayy,cyz) r2=(cxz,cyz,azz)
    def cross(a0, a1, a2, b0, b1, b2):
        return (a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0)

    c01 = cross(axx, cxy, cxz, cxy, ayy, cyz)
    c02 = cross(axx, cxy, cxz, cxz, cyz, azz)
    c12 = cross(cxy, ayy, cyz, cxz, cyz, azz)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    pick01 = (n01 >= n02) & (n01 >= n12)
    pick02 = ~pick01 & (n02 >= n12)
    comps = []
    for k in range(3):
        v = jnp.where(pick01, c01[k], jnp.where(pick02, c02[k], c12[k]))
        comps.append(v)
    nrm2 = comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2
    inv = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-24))
    degen = nrm2 <= 1e-20
    nx = jnp.where(degen, 0.0, comps[0] * inv)
    ny = jnp.where(degen, 0.0, comps[1] * inv)
    nz = jnp.where(degen, 1.0, comps[2] * inv)
    return nx, ny, nz


@functools.partial(jax.jit, static_argnames=("max_radius_px", "min_count"))
def organized_normals(pts: jnp.ndarray, valid: jnp.ndarray,
                      radius_m: float | jnp.ndarray, fx: jnp.ndarray,
                      *, max_radius_px: int = 24, min_count: int = 6):
    """Per-pixel normals over a metric radius via integral-image covariance.

    Returns (normals [H, W, 3], ok [H, W]). Window radius in pixels is
    fx * radius_m / z clamped to [1, max_radius_px].
    """
    H, W, _ = pts.shape
    z = pts[..., 2]
    r_px = jnp.where(valid, fx * radius_m / jnp.maximum(z, 1e-3), 1.0)
    r = jnp.clip(r_px.astype(jnp.int32), 1, max_radius_px)

    v = valid.astype(pts.dtype)
    # center by the global cloud mean before forming moments: covariance is
    # translation-invariant, and the smaller coordinate magnitudes cut the
    # f32 cancellation error of the E[ppᵀ] − μμᵀ subtraction ~100x (flat
    # surfaces otherwise pick up spurious DoN magnitude)
    tot = jnp.maximum(jnp.sum(v), 1.0)
    gx = jnp.sum(pts[..., 0] * v) / tot
    gy = jnp.sum(pts[..., 1] * v) / tot
    gz = jnp.sum(pts[..., 2] * v) / tot
    x = (pts[..., 0] - gx) * v
    y = (pts[..., 1] - gy) * v
    zz = (pts[..., 2] - gz) * v
    # channels-first [10, H, W] — see _integral docstring for why
    stacked = jnp.stack([x, y, zz, x * x, x * y, x * zz, y * y, y * zz,
                         zz * zz, v], 0)
    sums = _box_sum(_integral(stacked), r)                  # [10, H, W]

    n = sums[9]
    ns = jnp.maximum(n, 1.0)
    mx, my, mz = sums[0] / ns, sums[1] / ns, sums[2] / ns
    # covariance = E[pp^T] - mean mean^T
    exx, exy, exz = sums[3], sums[4], sums[5]
    eyy, eyz, ezz = sums[6], sums[7], sums[8]
    cxx = exx / ns - mx * mx
    cxy = exy / ns - mx * my
    cxz = exz / ns - mx * mz
    cyy = eyy / ns - my * my
    cyz = eyz / ns - my * mz
    czz = ezz / ns - mz * mz
    nx, ny, nz = _smallest_eigvec_planes(cxx, cxy, cxz, cyy, cyz, czz)
    # viewpoint at +infinity: flip so nx+ny+nz >= 0
    flip = (nx + ny + nz) < 0
    sign = jnp.where(flip, -1.0, 1.0)
    ok = valid & (n >= min_count)
    keep = ok.astype(nx.dtype) * sign
    # single channels-last stack at the API boundary only
    return jnp.stack([nx * keep, ny * keep, nz * keep], -1), ok


@functools.partial(jax.jit, static_argnames=("max_radius_px",))
def don_field(pts: jnp.ndarray, valid: jnp.ndarray, fx: jnp.ndarray,
              scale1: float, scale2: float, *, max_radius_px: int = 32):
    """DoN = (n_small - n_large)/2 and its magnitude.

    Returns (don [H, W, 3], mag [H, W], ok [H, W])."""
    n_s, ok_s = organized_normals(pts, valid, scale1, fx,
                                  max_radius_px=max_radius_px)
    n_l, ok_l = organized_normals(pts, valid, scale2, fx,
                                  max_radius_px=max_radius_px)
    don = 0.5 * (n_s - n_l)
    ok = ok_s & ok_l
    mag = jnp.where(ok, jnp.linalg.norm(don, axis=-1), 0.0)
    return don, mag, ok
