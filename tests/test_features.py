import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semantic_slam_tpu.config import OrbConfig
from semantic_slam_tpu.ops import (
    detect_fast_grid, fast_score, nms3x3, extract_orb, compute_descriptors,
    hamming_matrix, match_descriptors, window_mask, unpack_to_pm1,
)
from semantic_slam_tpu.ops.fast import fast_score_reference


def checkerboard_corners(h=64, w=64, sq=8):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((yy // sq) + (xx // sq)) % 2 * 200.0 + 20.0).astype(np.float32)
    return img


def test_fast_score_matches_oracle(rng):
    img = rng.uniform(0, 255, size=(48, 48)).astype(np.float32)
    ours = np.asarray(fast_score(jnp.asarray(img), 20.0))
    ref = fast_score_reference(img, 20.0)
    # interior only (roll wraps at borders; detector masks borders anyway)
    np.testing.assert_allclose(ours[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-3)


def isolated_squares(h=96, w=96, sq=6, pitch=16):
    """Bright squares on dark ground: L-corners that FAST-9 responds to
    (checkerboard X-junctions are saddle points FAST by design ignores)."""
    img = np.full((h, w), 20.0, np.float32)
    corners = []
    for y0 in range(8, h - sq - 8, pitch):
        for x0 in range(8, w - sq - 8, pitch):
            img[y0:y0 + sq, x0:x0 + sq] = 220.0
            corners += [(x0, y0), (x0 + sq - 1, y0), (x0, y0 + sq - 1),
                        (x0 + sq - 1, y0 + sq - 1)]
    return img, np.array(corners, np.float32)


def test_fast_detects_square_corners():
    img, corners = isolated_squares()
    uv, score, valid = detect_fast_grid(jnp.asarray(img), 20.0, 7.0,
                                        cell=16, per_cell=8, max_kp=256, margin=4)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 20
    # every detection lies within 2px of a true square corner
    d = np.linalg.norm(uv[:, None, :] - corners[None, :, :], axis=-1).min(axis=1)
    assert np.percentile(d, 90) <= 2.0


def test_nms_isolated_peak():
    img = np.zeros((32, 32), np.float32)
    img[16, 16] = 10.0
    img[16, 17] = 5.0
    out = np.asarray(nms3x3(jnp.asarray(img)))
    assert out[16, 16] == 10.0
    assert out[16, 17] == 0.0


def test_descriptor_rotation_invariance(rng):
    """Descriptors of a rotated image patch should be close in Hamming."""
    import scipy.ndimage as ndi
    img = rng.uniform(0, 255, size=(96, 96)).astype(np.float32)
    img = ndi.gaussian_filter(img, 2.0) * 4
    rot = ndi.rotate(img, 30.0, reshape=False, order=1, mode="nearest")
    uv = jnp.asarray([[48.0, 48.0]])
    valid = jnp.asarray([True])
    d1_u8, d1, a1 = compute_descriptors(jnp.asarray(img), uv, valid)
    d2_u8, d2, a2 = compute_descriptors(jnp.asarray(rot), uv, valid)
    dist_rot = int(hamming_matrix(d1, d2)[0, 0])
    # vs a random descriptor pair: expect ~128
    dr = rng.integers(0, 2, size=(1, 256)).astype(np.int8) * 2 - 1
    dist_rand = int(hamming_matrix(d1, jnp.asarray(dr))[0, 0])
    assert dist_rot < 70
    assert dist_rand > 90


def test_hamming_matrix_oracle(rng):
    a = rng.integers(0, 2, size=(17, 256)).astype(np.int8) * 2 - 1
    b = rng.integers(0, 2, size=(23, 256)).astype(np.int8) * 2 - 1
    D = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] != b[None, :, :]).sum(-1))
    np.testing.assert_array_equal(D, ref)


def test_unpack_roundtrip(rng):
    bits = rng.integers(0, 2, size=(5, 256)).astype(bool)
    b = bits.reshape(5, 32, 8)
    weights = 2 ** np.arange(8)
    u8 = jnp.asarray((b * weights).sum(-1).astype(np.uint8))
    pm1 = np.asarray(unpack_to_pm1(u8))
    np.testing.assert_array_equal(pm1 > 0, bits)


def test_match_self_identity(rng):
    d = rng.integers(0, 2, size=(64, 256)).astype(np.int8) * 2 - 1
    valid = jnp.ones((64,), bool)
    res = match_descriptors(jnp.asarray(d), jnp.asarray(d), valid, valid,
                            max_dist=10, ratio=1.0, mutual=True)
    np.testing.assert_array_equal(np.asarray(res.idx), np.arange(64))
    assert int(res.dist.max()) == 0


def test_match_with_noise_and_window(rng):
    """Corrupt 20 bits; matching should still recover identity, and the
    spatial window must block far-away candidates."""
    n = 50
    d1 = rng.integers(0, 2, size=(n, 256)).astype(np.int8) * 2 - 1
    d2 = d1.copy()
    for i in range(n):
        flip = rng.choice(256, size=20, replace=False)
        d2[i, flip] *= -1
    valid = jnp.ones((n,), bool)
    res = match_descriptors(jnp.asarray(d1), jnp.asarray(d2), valid, valid,
                            max_dist=50, ratio=0.9, mutual=True)
    assert (np.asarray(res.idx) == np.arange(n)).mean() > 0.9
    # window mask: predictions at the true locations with tiny radius
    uv2 = rng.uniform(0, 100, size=(n, 2)).astype(np.float32)
    mask = window_mask(jnp.asarray(uv2), jnp.asarray(uv2), 1.0)
    np.testing.assert_array_equal(np.asarray(mask), np.eye(n, dtype=bool))


def test_extract_orb_full_frame(rng):
    img = rng.uniform(0, 255, size=(480, 640)).astype(np.float32)
    import scipy.ndimage as ndi
    img = ndi.gaussian_filter(img, 1.5) * 8
    cfg = OrbConfig(n_features=500, n_levels=4)
    feats = extract_orb(jnp.asarray(img), cfg)
    n_valid = int(feats.valid.sum())
    assert n_valid > 100
    assert feats.uv.shape[0] == feats.desc_u8.shape[0] == feats.desc_pm1.shape[0]
    # level-0 coords within image bounds
    uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
    assert uv[:, 0].max() < 640 and uv[:, 1].max() < 480
    # levels populated beyond level 0
    lv = np.asarray(feats.level)[np.asarray(feats.valid)]
    assert lv.max() >= 1
