"""Sort-free stream compaction.

Picking "the indices of the first C set bits" with ``lax.top_k`` lowers to a
bitonic sort network over the whole array (~log²N exchange passes). On TPU a
stable compaction is much cheaper as arithmetic the MXU already does well:

  1. positions = inclusive prefix sum of the mask — two levels of
     lower-triangular matmuls (lane-tiled, see ops/normals.py for the same
     trick on images; lax.cumsum lowers to a serial scan and costs ~3 ms on
     image-sized arrays),
  2. selection = a one-hot [C, P] comparison contracted against iota — one
     f32 matvec on the MXU, no gather/scatter (arbitrary-index scatters run
     ~50x below bandwidth on TPU).

Used by the tracking front end to compact frustum-visible map points
(slam/tracking.py) — replaces a 16k-lane top_k that dominated the
search-by-projection step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


@functools.lru_cache(maxsize=None)
def _tri(n: int) -> np.ndarray:
    return np.tril(np.ones((n, n), np.float32))


def _prefix_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a [N] f32 vector, recursive lane tiling."""
    N = x.shape[0]
    n_rows = -(-N // _LANE)
    xf = jnp.zeros((n_rows * _LANE,), jnp.float32).at[:N].set(x)
    xf = xf.reshape(n_rows, _LANE)
    tri = jnp.asarray(_tri(_LANE))
    within = xf @ tri.T                                  # [R, L] inclusive
    if n_rows == 1:
        return within.reshape(-1)[:N]
    row_tot = within[:, -1]                              # [R]
    if n_rows <= _LANE * 8:
        offs = jnp.asarray(_tri(n_rows)) @ row_tot - row_tot
    else:
        offs = _prefix_f32(row_tot) - row_tot            # exclusive offsets
    return (within + offs[:, None]).reshape(-1)[:N]


def prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a [N] integer/bool vector via levels of
    lower-triangular matmuls (exact in f32 for sums < 2^24 — fine for
    masks/counts)."""
    return _prefix_f32(x.astype(jnp.float32)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("C",))
def compact_indices(mask: jnp.ndarray, C: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[P] bool -> (idx [C] i32, filled [C] bool).

    idx[c] is the index of the (c+1)-th set bit of `mask` (in order);
    slots past the population count are 0 and marked unfilled. Selection is
    a one-hot matvec when [C, P] is small enough to fuse, else one scatter
    (still far cheaper than sorting P lanes)."""
    P = mask.shape[0]
    ps = prefix_sum(mask)                                # [P] 1-based ranks
    pos = jnp.where(mask, ps - 1, C)                     # target slot or C
    if C * P <= (1 << 24):
        sel = (pos[None, :] == jnp.arange(C)[:, None])   # [C, P] one-hot
        idx = (sel.astype(jnp.float32)
               @ jnp.arange(P, dtype=jnp.float32)).astype(jnp.int32)
    else:
        idx = jnp.zeros((C,), jnp.int32).at[pos].set(
            jnp.arange(P, dtype=jnp.int32), mode="drop")
    n = ps[-1] if P > 0 else jnp.int32(0)
    filled = jnp.arange(C) < n
    return idx, filled
