"""Batched SE(3)/SO(3)/Sim(3) Lie-group operations in JAX.

This is the TPU-native replacement for the 4x4 ``cv::Mat`` pose algebra spread
through the reference (e.g. ``src/Engine.cpp:614-669`` projection/fundamental
math, ``src/tsdf.cu:253-403`` host-side matrix helpers, and g2o's SE3/Sim3
vertices used for BA and pose-graph optimization). All ops broadcast over
leading batch dimensions and are jit/vmap/grad-safe, with Taylor fallbacks at
small angles so gradients are finite everywhere.

Conventions:
  - Poses are 4x4 row-major matrices ``T`` mapping points ``x_dst = T @ x_src``.
  - ``Tcw`` maps world->camera (what ORB-SLAM2's ``GetPose`` returns);
    ``Twc = inverse(Tcw)`` maps camera->world.
  - se3 tangent vectors are ``[rho(3), phi(3)]`` (translation, rotation).
  - sim3 tangent vectors are ``[rho(3), phi(3), sigma]`` (log-scale last).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric (hat) matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / jnp.maximum(theta2, _EPS))
    return A, B, C


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] rotation vector -> [..., 3, 3] rotation matrix (Rodrigues)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation matrix -> [..., 3] rotation vector.

    AD-safe: the arccos/sin expressions have infinite derivatives at the
    identity, and `where` does not stop NaN gradients from the untaken
    branch — so the unstable branch is evaluated on *sanitized* inputs
    (double-where trick) and the near-identity branch uses the smooth
    series θ² ≈ 2(1−cosθ)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    stable = cos_t < 1.0 - 1e-7
    cos_safe = jnp.where(stable, cos_t, 0.0)          # sanitize for arccos grad
    theta_main = jnp.arccos(cos_safe)
    sin_main = jnp.sqrt(jnp.maximum(1.0 - cos_safe * cos_safe, 1e-12))
    scale_main = theta_main / (2.0 * sin_main)
    theta2_taylor = 2.0 * (1.0 - cos_t)               # smooth near identity
    scale_taylor = 0.5 + theta2_taylor / 12.0
    scale = jnp.where(stable, scale_main, scale_taylor)
    theta = jnp.where(stable, theta_main, jnp.sqrt(jnp.maximum(theta2_taylor, 0.0)))
    phi = w * scale[..., None]
    # theta ~ pi branch: |w| vanishes; use sqrt of diagonal. Sanitize the
    # sqrt input for the untaken-branch gradient (sqrt'(0) = inf).
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis2 = jnp.where(near_pi[..., None], axis2, 1.0)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonal sums
    sx = jnp.where(w[..., 0] >= 0, 1.0, -1.0)
    s_y = jnp.where((R[..., 0, 1] + R[..., 1, 0]) * sx >= 0, sx, -sx)
    s_z = jnp.where((R[..., 0, 2] + R[..., 2, 0]) * sx >= 0, sx, -sx)
    signs = jnp.stack([sx, s_y, s_z], axis=-1)
    phi_pi = axis * signs * theta[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi)


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V: exp translation part helper."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    K = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + B[..., None, None] * K + C[..., None, None] * (K @ K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] twist [rho, phi] -> [..., 4, 4] transform."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return _rt_to_mat(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] transform -> [..., 6] twist."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    V = _left_jacobian(phi)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid-transform inverse (no general solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def orthonormalize_pose(T: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (Newton polar iteration
    X <- (X + X^-T)/2, quadratic convergence).

    Long chains of f32 pose products drift off the manifold, and the
    transpose-based inverse then *amplifies* the drift geometrically — any
    per-frame pose pipeline must re-project after its optimization step.
    """
    R = T[..., :3, :3]
    for _ in range(iters):
        R = 0.5 * (R + jnp.linalg.inv(jnp.swapaxes(R, -1, -2)))
    return _rt_to_mat(R, T[..., :3, 3])


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] transform(s) to [..., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# Sim(3): used by loop closing (scale-drift-aware pose graph; replaces g2o's
# Sim3 vertices described in reference include/ORB_SLAM2/System.h:208-210).
# ---------------------------------------------------------------------------


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 7] = [rho, phi, sigma] -> (R, t, s) packed as [..., 4, 4] with scale
    folded into the rotation block: top-left 3x3 is s*R."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    # W matrix of Sim(3) exp (per Strasdat's thesis), Taylor-safe.
    K = skew(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta2 < 1e-8
    A_ = jnp.where(small_sig, 1.0 - sig / 2.0, (s - 1.0) / jnp.where(small_sig, 1.0, sig))
    # coefficients for K and K^2 terms
    c = s * jnp.cos(theta)
    d = s * jnp.sin(theta)
    den = jnp.maximum(sig * sig + theta2, _EPS)
    Bc = jnp.where(
        small_sig & small_th, 0.5,
        (sig * d + theta * (1.0 - c)) / jnp.maximum(den * jnp.maximum(theta, _EPS), _EPS),
    )
    Cc = jnp.where(
        small_sig & small_th, 1.0 / 6.0,
        (A_ - (c - 1.0) * sig / den - d * theta / den) / jnp.maximum(theta2, _EPS),
    )
    Bc = jnp.where(small_th, 0.5 * A_ / jnp.maximum(1.0, 1.0), Bc)
    W = A_[..., None, None] * I + Bc[..., None, None] * K + Cc[..., None, None] * (K @ K)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return _rt_to_mat(s[..., None, None] * R, t)


def sim3_decompose(S: jnp.ndarray):
    """[..., 4, 4] sim3 matrix -> (s, R, t)."""
    sR = S[..., :3, :3]
    s = jnp.linalg.det(sR) ** (1.0 / 3.0)
    R = sR / s[..., None, None]
    t = S[..., :3, 3]
    return s, R, t


def sim3_to_matrix(s, R, t):
    return _rt_to_mat(s[..., None, None] * R, t)


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sim3_exp (numerically, via decompose + iterative rho solve)."""
    s, R, t = sim3_decompose(S)
    sigma = jnp.log(s)
    phi = so3_log(R)
    # Solve W rho = t with W from sim3_exp pieces: W depends only on (phi, sigma).
    xi0 = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    W = sim3_exp_W(xi0)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_exp_W(xi: jnp.ndarray) -> jnp.ndarray:
    """The W matrix used in sim3_exp's translation (exposed for log)."""
    phi, sigma = xi[..., 3:6], xi[..., 6]
    probe = jnp.concatenate(
        [jnp.eye(3, dtype=xi.dtype), jnp.zeros((3, 4), dtype=xi.dtype)], axis=-1
    )
    # Build W column-by-column using sim3_exp on unit-rho twists.
    def col(e):
        x = jnp.concatenate([jnp.broadcast_to(e, phi.shape[:-1] + (3,)), phi, sigma[..., None]], axis=-1)
        return sim3_exp(x)[..., :3, 3]

    cols = [col(probe[i, :3]) for i in range(3)]
    return jnp.stack(cols, axis=-1)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    s, R, t = sim3_decompose(S)
    s_inv = 1.0 / s
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", R_inv, t)
    return sim3_to_matrix(s_inv, R_inv, t_inv)


def sim3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def sim3_transform_points(S: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", sR, pts) + t[..., None, :]
