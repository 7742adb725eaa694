"""DBoW2 text vocabulary import/export (ORBvoc.txt format).

The reference loads its vocabulary from a DBoW2 text file at startup
(``src/Utility.cpp:66-77``, ``src/ORB_SLAM2/System.cc:66-76``). The real
ORBvoc.txt is LFS-stripped in the reference tree, so these tests write a
small synthetic file in the exact format (header ``k L scoring weighting``,
node lines ``parent is_leaf b0..b31 weight``) and verify the importer.
"""

import numpy as np
import pytest

from semantic_slam_tpu.slam.vocab import (
    Vocabulary, bow_vector, vocab_from_dbow2_text, vocab_to_dbow2_text,
    _bytes_to_pm1, _pm1_to_bytes)

import jax.numpy as jnp


def _write_synthetic_dbow2(path, rng, k=3, n_interior=4, n_leaves=9):
    """A small tree: header + interleaved interior and leaf nodes. Returns
    the leaf descriptors (in file order = DBoW2 word-id order) + weights."""
    lines = [f"{k} 2 0 0"]
    leaf_desc, leaf_w = [], []
    n_nodes = n_interior + n_leaves
    is_leaf_flags = ([0] * n_interior + [1] * n_leaves)
    rng.shuffle(is_leaf_flags)
    for i in range(n_nodes):
        desc = rng.integers(0, 256, 32).astype(np.uint8)
        w = float(rng.uniform(0.1, 2.0))
        parent = int(rng.integers(0, max(1, i)))
        if is_leaf_flags[i]:
            leaf_desc.append(desc)
            leaf_w.append(w)
        byte_s = " ".join(str(int(b)) for b in desc)
        lines.append(f"{parent} {is_leaf_flags[i]} {byte_s} {w:.6g}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return np.stack(leaf_desc), np.array(leaf_w, np.float32)


def test_import_leaves_in_file_order(tmp_path, rng):
    path = str(tmp_path / "voc.txt")
    leaf_desc, leaf_w = _write_synthetic_dbow2(path, rng)
    voc = vocab_from_dbow2_text(path)
    assert voc.words_pm1.shape == (len(leaf_desc), 256)
    np.testing.assert_array_equal(_pm1_to_bytes(np.asarray(voc.words_pm1)),
                                  leaf_desc)
    np.testing.assert_allclose(np.asarray(voc.idf), leaf_w, rtol=1e-5)


def test_bit_order_matches_orb_unpack(rng):
    """_bytes_to_pm1 must agree with ops.orb.unpack_to_pm1 so imported words
    match descriptors produced by the Pallas ORB front end."""
    from semantic_slam_tpu.ops.orb import unpack_to_pm1

    u8 = rng.integers(0, 256, (5, 32)).astype(np.uint8)
    np.testing.assert_array_equal(
        _bytes_to_pm1(u8), np.asarray(unpack_to_pm1(jnp.asarray(u8))))


def test_roundtrip_export_import(tmp_path, rng):
    bits = rng.integers(0, 2, (17, 256))
    voc = Vocabulary(
        words_pm1=jnp.asarray(np.where(bits, 1, -1).astype(np.int8)),
        idf=jnp.asarray(rng.uniform(0.1, 3.0, 17).astype(np.float32)))
    path = str(tmp_path / "voc.txt")
    vocab_to_dbow2_text(voc, path)
    back = vocab_from_dbow2_text(path)
    np.testing.assert_array_equal(np.asarray(back.words_pm1),
                                  np.asarray(voc.words_pm1))
    np.testing.assert_allclose(np.asarray(back.idf), np.asarray(voc.idf),
                               rtol=1e-5)


def test_imported_vocab_assigns_nearest_hamming(tmp_path, rng):
    """bow_vector with an imported vocabulary bins descriptors to their
    true nearest-Hamming word (numpy oracle)."""
    path = str(tmp_path / "voc.txt")
    leaf_desc, _ = _write_synthetic_dbow2(path, rng, n_leaves=16)
    voc = vocab_from_dbow2_text(path)
    # descriptors = noisy copies of random words
    V = leaf_desc.shape[0]
    word_pm1 = _bytes_to_pm1(leaf_desc).astype(np.int32)
    pick = rng.integers(0, V, 40)
    desc = word_pm1[pick].copy()
    flip = rng.integers(0, 256, (40, 20))
    for i in range(40):
        desc[i, flip[i]] *= -1
    ham = (256 - desc @ word_pm1.T) // 2                # [40, V] oracle
    expect_hist = np.zeros(V)
    idf = np.asarray(voc.idf)
    for i in range(40):
        expect_hist[np.argmin(ham[i])] += 1
    expect = expect_hist * idf
    expect /= max(expect.sum(), 1e-9)
    got = np.asarray(bow_vector(voc, jnp.asarray(desc.astype(np.int8)),
                                jnp.ones(40, bool)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_bad_header_rejected(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("10 6\n")
    with pytest.raises(ValueError):
        vocab_from_dbow2_text(path)
