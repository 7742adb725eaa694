"""Binary bag-of-words place recognition (DBoW2 + KeyFrameDatabase replacement).

The reference loads a pre-trained ORB vocabulary tree and scores keyframes
through DBoW2 (``System.cc:66-76``, ``Utility.cpp:66-77``). TPU-native
redesign: the vocabulary is a flat array of binary word centroids, trained by
k-medians directly on ±1 descriptor planes — every step is an MXU Hamming
matmul:

  - assignment: [N, 256] x [256, V] dot -> nearest word (argmax of dot ==
    argmin of Hamming);
  - update: per-word majority vote of member bits = sign of a masked sum;
  - transform: descriptors -> tf-idf-weighted, L1-normalized BoW vectors;
  - database query: one [K, V] x [V] matvec scores a keyframe against the
    whole database (DBoW2 L1 score), replacing inverted-file traversal.

A flat vocabulary of V≈1-4k words costs one small matmul per frame — cheaper
on the MXU than tree descent, and exactly equivalent in retrieval quality at
this scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    words_pm1: jnp.ndarray   # [V, 256] int8 word centroids
    idf: jnp.ndarray         # [V] f32 inverse document frequency weights


@functools.partial(jax.jit, static_argnames=("n_words", "iters"))
def _kmedians(desc_pm1: jnp.ndarray, valid: jnp.ndarray, seed: jnp.ndarray,
              *, n_words: int, iters: int = 8) -> jnp.ndarray:
    """Binary k-medians on ±1 descriptors. Returns [V, 256] int8 centroids."""
    N = desc_pm1.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, N, (n_words,), replace=False)
    words = desc_pm1[init_idx].astype(jnp.int8)

    def step(words, _):
        # bf16 operands + f32 accumulation: exact for +-1 x 256-dim and
        # avoids the pathologically slow int8->int32 dot lowering on v5e
        # (see ops/match.hamming_matrix)
        dots = jax.lax.dot_general(
            desc_pm1.astype(jnp.bfloat16), words.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [N, V]
        assign = jnp.argmax(jnp.where(valid[:, None], dots, -(2 ** 30)), -1)
        onehot = jax.nn.one_hot(assign, n_words, dtype=jnp.float32)
        onehot = onehot * valid[:, None]
        sums = onehot.T @ desc_pm1.astype(jnp.float32)   # [V, 256] bit votes
        counts = jnp.sum(onehot, 0)[:, None]
        new = jnp.where(counts > 0, jnp.sign(sums), words.astype(jnp.float32))
        new = jnp.where(new == 0, 1.0, new)
        return new.astype(jnp.int8), None

    words, _ = jax.lax.scan(step, words, None, length=iters)
    return words


def train_vocabulary(desc_pm1: np.ndarray, valid: np.ndarray,
                     n_words: int = 1024, iters: int = 8,
                     seed: int = 0) -> Vocabulary:
    """Train the vocabulary + uniform idf (idf refined by add_documents)."""
    words = _kmedians(jnp.asarray(desc_pm1), jnp.asarray(valid),
                      seed, n_words=n_words, iters=iters)
    return Vocabulary(words_pm1=words,
                      idf=jnp.ones((n_words,), jnp.float32))


def _bytes_to_pm1(desc_u8: np.ndarray) -> np.ndarray:
    """uint8 [*, 32] -> int8 [*, 256] in {-1,+1}, LSB-first per byte (same
    bit order as ops.orb.unpack_to_pm1)."""
    bits = np.unpackbits(desc_u8.astype(np.uint8), axis=-1, bitorder="little")
    return np.where(bits, 1, -1).astype(np.int8)


def _pm1_to_bytes(pm1: np.ndarray) -> np.ndarray:
    bits = (np.asarray(pm1) > 0).astype(np.uint8)
    return np.packbits(bits, axis=-1, bitorder="little")


def vocab_from_dbow2_text(path: str) -> Vocabulary:
    """Import an ORB-SLAM2 / DBoW2 text vocabulary (ORBvoc.txt) into the
    flat word-array representation.

    Format (DBoW2 TemplatedVocabulary::loadFromTextFile, loaded by the
    reference at ``src/Utility.cpp:66-77`` / ``src/ORB_SLAM2/System.cc:66-76``):
    header line ``k L scoring weighting``, then one line per non-root node:
    ``parent_id is_leaf b0 .. b31 weight`` (32 descriptor bytes). Leaves
    become words in file order — exactly DBoW2's word-id assignment rule —
    so word ids here match what the reference's KeyFrameDatabase would use.

    The tree's interior nodes exist only to accelerate CPU word lookup by
    approximate descent; on TPU the flat [N,256]x[256,V] Hamming matmul does
    the *exact* nearest-word assignment, so only the leaves are kept. Leaf
    weights (idf for TF_IDF weighting) are preserved.
    """
    words = []
    weights = []
    with open(path) as f:
        header = f.readline().split()
        if len(header) < 4:
            raise ValueError(f"bad DBoW2 header: {header!r}")
        for line in f:
            parts = line.split()
            if not parts:
                continue
            is_leaf = int(parts[1])
            if not is_leaf:
                continue
            desc = np.array([int(x) for x in parts[2:34]], np.uint8)
            words.append(desc)
            weights.append(float(parts[34]))
    if not words:
        raise ValueError("DBoW2 vocabulary has no leaf nodes")
    words_u8 = np.stack(words)                          # [V, 32]
    return Vocabulary(words_pm1=jnp.asarray(_bytes_to_pm1(words_u8)),
                      idf=jnp.asarray(np.array(weights, np.float32)))


def vocab_to_dbow2_text(vocab: Vocabulary, path: str) -> None:
    """Export the flat vocabulary as a depth-1 DBoW2 text tree (root with V
    leaf children) — loadable by the reference's loadFromTextFile."""
    words_u8 = _pm1_to_bytes(np.asarray(vocab.words_pm1))
    idf = np.asarray(vocab.idf)
    V = words_u8.shape[0]
    with open(path, "w") as f:
        f.write(f"{V} 1 0 0\n")
        for i in range(V):
            bytes_s = " ".join(str(int(b)) for b in words_u8[i])
            f.write(f"0 1 {bytes_s} {idf[i]:.6g}\n")


@jax.jit
def bow_vector(vocab: Vocabulary, desc_pm1: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] descriptors -> [V] L1-normalized tf-idf BoW vector."""
    dots = jax.lax.dot_general(
        desc_pm1.astype(jnp.bfloat16), vocab.words_pm1.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    assign = jnp.argmax(jnp.where(valid[:, None], dots, -(2 ** 30)), -1)
    V = vocab.words_pm1.shape[0]
    hist = jnp.sum(jax.nn.one_hot(assign, V, dtype=jnp.float32)
                   * valid[:, None], axis=0)
    v = hist * vocab.idf
    return v / jnp.maximum(jnp.sum(v), 1e-9)


@jax.jit
def bow_score(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score: 1 - 0.5 * |a - b|_1 for L1-normalized vectors
    (1 = identical distributions, 0 = disjoint). Broadcasts over leading
    dims of `a` (database batch)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


class KeyFrameDatabase:
    """BoW database over keyframe slots (KeyFrameDatabase replacement).

    Stores [K, V] BoW vectors; a query is one matvec over the full database.
    """

    def __init__(self, vocab: Vocabulary, max_keyframes: int):
        self.vocab = vocab
        V = vocab.words_pm1.shape[0]
        self.vectors = jnp.zeros((max_keyframes, V), jnp.float32)
        self.active = np.zeros(max_keyframes, bool)

    def add(self, kf_slot: int, desc_pm1, valid):
        v = bow_vector(self.vocab, jnp.asarray(desc_pm1), jnp.asarray(valid))
        self.vectors = self.vectors.at[kf_slot].set(v)
        self.active[kf_slot] = True
        return v

    def query(self, desc_pm1, valid, exclude=()):
        """Scores against all active keyframes. Returns np [K] (excluded and
        inactive slots = -1)."""
        q = bow_vector(self.vocab, jnp.asarray(desc_pm1), jnp.asarray(valid))
        scores = np.array(bow_score(self.vectors, q))   # writable copy
        scores[~self.active] = -1.0
        for e in exclude:
            if 0 <= e < len(scores):
                scores[e] = -1.0
        return scores

    def detect_loop_candidates(self, kf_slot: int, desc_pm1, valid,
                               covis_neighbors, min_score_ratio: float = 0.75,
                               min_gap: int = 20, recent=None):
        """ORB-SLAM2 DetectLoopCandidates semantics: the minimum BoW score
        against covisible neighbors sets the bar; candidates must beat
        ratio*bar, not be covisible, and be temporally distant."""
        scores = self.query(desc_pm1, valid, exclude=[kf_slot])
        neigh = [n for n in covis_neighbors if n >= 0 and self.active[n]]
        if neigh:
            bar = min(float(scores[n]) for n in neigh)
        else:
            bar = 0.0
        bar = max(bar, 0.0)
        cand = []
        for k in np.argsort(-scores):
            if scores[k] <= max(bar * min_score_ratio, 1e-3):
                break
            too_close = (int(k) in recent if recent is not None
                         else abs(int(k) - kf_slot) < min_gap)
            if k in neigh or too_close:
                continue
            cand.append((int(k), float(scores[k])))
        return cand
