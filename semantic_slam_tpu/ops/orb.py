"""ORB descriptors: image pyramid, intensity-centroid orientation, rotated
BRIEF — formulated as MXU matmuls, no per-keypoint host loops.

Replaces ORB-SLAM2's ``ORBextractor`` descriptor stage. TPU design:

  - Patch extraction: keypoints sit at integer pixels (FAST corners), so the
    31x31 patch of every keypoint is one row-gather ([N, 31, W] contiguous
    rows — fast on TPU) followed by one lane gather of 31 columns.
  - Orientation: the intensity-centroid moments (m10, m01 over the circular
    patch) are two matvecs of the flattened patches against constant weight
    vectors.
  - Steered BRIEF: the keypoint angle is quantized to ``N_BINS`` bins; for
    each bin the bilinear sampling of all 512 rotated test locations is a
    constant sparse-in-theory matrix [512, 961], applied DENSE: one
    [N, 961] x [961, N_BINS*512] matmul computes every keypoint's samples at
    every orientation on the MXU, then one take-along picks each keypoint's
    bin. ~15 GMAC for 1000 keypoints — noise for the MXU, and it replaces
    ~500k scalar gathers that dominate a gather-based formulation.
  - The BRIEF pattern is a deterministic seeded Gaussian pattern: descriptors
    never cross the framework boundary, so only internal consistency matters
    (intentionally not OpenCV's learned table).

Descriptors are produced in two layouts: packed uint8[32] (map storage parity
with the reference's 32-byte ORB rows) and ±1 int8[256] bit planes whose dot
product turns Hamming distance into an MXU matmul (see ops/match.py).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF_PATCH = 15
N_PAIRS = 256
N_BINS = 30          # orientation quantization (ORB uses 12° steps)


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """[N_PAIRS, 4] (x1, y1, x2, y2) BRIEF test pattern, clipped to the patch."""
    rs = np.random.RandomState(seed)
    sigma = PATCH / 5.0
    pat = rs.normal(0.0, sigma, size=(N_PAIRS, 4))
    return np.clip(pat, -(HALF_PATCH - 2), HALF_PATCH - 2).astype(np.float32)


BRIEF_PATTERN = _make_pattern()


def _orientation_weights() -> Tuple[np.ndarray, np.ndarray]:
    ys, xs = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    circ = (xs ** 2 + ys ** 2) <= HALF_PATCH ** 2
    return ((xs * circ).astype(np.float32).reshape(-1),
            (ys * circ).astype(np.float32).reshape(-1))


_WX, _WY = _orientation_weights()


def _sampling_matrix() -> np.ndarray:
    """[N_BINS * 512, PATCH*PATCH] bilinear sampling weights.

    Row (b*512 + k) samples rotated test point k (k<256 -> point 1 of pair k,
    else point 2 of pair k-256) at bin angle b, bilinearly from the flattened
    31x31 patch."""
    pts = np.concatenate([BRIEF_PATTERN[:, 0:2], BRIEF_PATTERN[:, 2:4]], 0)  # [512, 2]
    W = np.zeros((N_BINS * 2 * N_PAIRS, PATCH * PATCH), np.float32)
    for b in range(N_BINS):
        th = 2.0 * np.pi * b / N_BINS
        c, s = np.cos(th), np.sin(th)
        rx = c * pts[:, 0] - s * pts[:, 1] + HALF_PATCH
        ry = s * pts[:, 0] + c * pts[:, 1] + HALF_PATCH
        x0 = np.clip(np.floor(rx).astype(int), 0, PATCH - 2)
        y0 = np.clip(np.floor(ry).astype(int), 0, PATCH - 2)
        fx = np.clip(rx - x0, 0.0, 1.0)
        fy = np.clip(ry - y0, 0.0, 1.0)
        for k in range(2 * N_PAIRS):
            r = b * 2 * N_PAIRS + k
            base = y0[k] * PATCH + x0[k]
            W[r, base] += (1 - fx[k]) * (1 - fy[k])
            W[r, base + 1] += fx[k] * (1 - fy[k])
            W[r, base + PATCH] += (1 - fx[k]) * fy[k]
            W[r, base + PATCH + 1] += fx[k] * fy[k]
    return W


_SAMPLING_W = _sampling_matrix()          # [N_BINS*512, 961]


def extract_patches(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """[H, W] image + [N, 2] integer keypoint coords -> [N, 961] patches.

    Row gather (contiguous rows — fast) then column *selection as a batched
    one-hot matmul*: a per-keypoint lane gather of 31 columns runs ~50x below
    bandwidth on TPU, while [N,31,W]x[N,W,31] is MXU noise."""
    H, W = img.shape
    N = uv.shape[0]
    xi = jnp.clip(uv[:, 0].astype(jnp.int32), HALF_PATCH, W - HALF_PATCH - 1)
    yi = jnp.clip(uv[:, 1].astype(jnp.int32), HALF_PATCH, H - HALF_PATCH - 1)
    offs = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    rows = img[yi[:, None] + offs[None, :]]                  # [N, 31, W]
    cols = xi[:, None] + offs[None, :]                       # [N, 31]
    wpos = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    onehot = (wpos == cols[:, None, :]).astype(img.dtype)    # [N, W, 31]
    patches = jax.lax.dot_general(
        rows, onehot, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [N, 31, 31]
    return patches.reshape(N, PATCH * PATCH)


@jax.jit
def compute_descriptors(img: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray):
    """ORB descriptors at keypoints.

    Args: img [H, W] grayscale; uv [N, 2] (x, y) level coords; valid [N].
    Returns (desc_u8 [N, 32] uint8, desc_pm1 [N, 256] int8 in {-1, +1},
             angle [N] radians).
    """
    img = img.astype(jnp.float32)
    N = uv.shape[0]
    patches = extract_patches(img, uv)                       # [N, 961]

    # orientation: two matvecs (intensity centroid over the circular patch)
    m10 = patches @ jnp.asarray(_WX)
    m01 = patches @ jnp.asarray(_WY)
    angle = jnp.arctan2(m01, m10)
    bin_f = jnp.mod(angle, 2.0 * jnp.pi) / (2.0 * jnp.pi) * N_BINS
    bin_i = jnp.clip(jnp.round(bin_f).astype(jnp.int32) % N_BINS, 0, N_BINS - 1)

    # all-bin sampling on the MXU, then per-keypoint bin selection.
    # bf16 inputs + f32 accumulation: descriptors are internal-only bit
    # comparisons (module docstring), and the ~30 GFLOP all-bins matmul is
    # the single largest compute block of the front end — bf16 runs it at
    # full MXU rate. Intensities <= 255 and bilinear weights in [0, 1] are
    # represented to ~0.5 gray in bf16; only near-tie BRIEF bits can flip.
    S = jax.lax.dot_general(
        patches.astype(jnp.bfloat16),
        jnp.asarray(_SAMPLING_W, jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [N, N_BINS*512]
    S = S.reshape(N, N_BINS, 2 * N_PAIRS)
    bin_onehot = jax.nn.one_hot(bin_i, N_BINS, dtype=S.dtype)
    samples = jnp.einsum("nbs,nb->ns", S, bin_onehot)
    t1 = samples[:, :N_PAIRS]
    t2 = samples[:, N_PAIRS:]
    bits = (t1 < t2) & valid[:, None]

    # packed uint8[32]
    b = bits.reshape(N, 32, 8).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    desc_u8 = jnp.sum(b * weights[None, None, :], axis=-1).astype(jnp.uint8)
    # ±1 int8 planes for MXU Hamming
    desc_pm1 = jnp.where(bits, 1, -1).astype(jnp.int8)
    return desc_u8, desc_pm1, angle


@jax.jit
def unpack_to_pm1(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., 32] -> int8[..., 256] in {-1, +1} (for matching stored
    maps). Jitted: callers invoke it per keyframe/fuse pass and the eager
    4-op dispatch chain dominated host time in the mono mapping loop."""
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    bits = (desc_u8[..., :, None] & weights) > 0             # [..., 32, 8]
    return jnp.where(bits, 1, -1).astype(jnp.int8).reshape(
        desc_u8.shape[:-1] + (N_PAIRS,))


# ---------------------------------------------------------------------------
# Pyramid + full extraction
# ---------------------------------------------------------------------------


class PyramidLevel(NamedTuple):
    image: jnp.ndarray     # [Hl, Wl]
    scale: float           # cumulative scale: level coords * scale = level-0 coords


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_out: int, n_in: int) -> np.ndarray:
    """[n_out, n_in] antialiased bilinear interpolation matrix (half-pixel
    centers, triangle kernel stretched by the downscale factor — the
    jax.image.resize semantics, so the matmul pyramid is bit-compatible
    with the gather-based resize it replaces)."""
    scale = n_in / n_out
    radius = max(scale, 1.0)
    i = np.arange(n_out)[:, None]
    j = np.arange(n_in)[None, :]
    x = (i + 0.5) * scale - 0.5
    w = np.maximum(0.0, 1.0 - np.abs(j - x) / radius)
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float) -> List[PyramidLevel]:
    """Bilinear pyramid with static per-level shapes.

    Each level is produced by two small constant matmuls
    (rows: [h_l, H] @ img, cols: @ [W, w_l]) — separable bilinear resize on
    the MXU. A gather-based resize (jax.image.resize) costs ~3 ms/frame on
    TPU for the 8-level 480x640 pyramid; this form is ~0.8 GFLOP of matmul,
    i.e. noise."""
    H, W = img.shape
    img = img.astype(jnp.float32)
    out = [PyramidLevel(img, 1.0)]
    for lvl in range(1, n_levels):
        s = scale_factor ** lvl
        h, w = int(round(H / s)), int(round(W / s))
        R = jnp.asarray(_resize_matrix(h, H))
        C = jnp.asarray(_resize_matrix(w, W).T)
        out.append(PyramidLevel(R @ img @ C, s))
    return out


class Features(NamedTuple):
    """Static-shape keypoint set for one frame (level-0 coordinates)."""
    uv: jnp.ndarray        # [N, 2] float32 (x, y) in level-0 pixels
    level: jnp.ndarray     # [N] int32
    score: jnp.ndarray     # [N] float32
    angle: jnp.ndarray     # [N] float32
    desc_u8: jnp.ndarray   # [N, 32] uint8
    desc_pm1: jnp.ndarray  # [N, 256] int8
    valid: jnp.ndarray     # [N] bool


def level_budgets(n_features: int, n_levels: int, scale_factor: float) -> List[int]:
    """Distribute the keypoint budget across levels like ORB-SLAM2 (geometric
    decay by 1/scale per level, remainder to the coarsest)."""
    inv = 1.0 / scale_factor
    total = sum(inv ** l for l in range(n_levels))
    budgets = [int(round(n_features * (inv ** l) / total)) for l in range(n_levels)]
    budgets[-1] = max(0, n_features - sum(budgets[:-1]))
    return budgets


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_orb(img: jnp.ndarray, cfg) -> Features:
    """Full multi-scale ORB extraction as ONE jitted program.

    cfg is an OrbConfig (frozen dataclass => hashable static argument)."""
    from semantic_slam_tpu.ops.fast import detect_fast_grid

    levels = build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    budgets = level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    parts = []
    for lvl, (pl, budget) in enumerate(zip(levels, budgets)):
        if budget <= 0:
            continue
        budget = max(8, budget)
        uv, score, valid = detect_fast_grid(
            pl.image, float(cfg.ini_th_fast), float(cfg.min_th_fast),
            cell=cfg.cell_size, per_cell=cfg.max_kp_per_cell,
            max_kp=budget, margin=cfg.edge_margin)
        d8, dpm, ang = compute_descriptors(pl.image, uv, valid)
        parts.append(Features(
            uv=uv * pl.scale,
            level=jnp.full((budget,), lvl, jnp.int32),
            score=score, angle=ang, desc_u8=d8, desc_pm1=dpm, valid=valid))
    return Features(*[jnp.concatenate([getattr(p, f) for p in parts], axis=0)
                      for f in Features._fields])
