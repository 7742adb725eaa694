"""Pallas FAST-9 kernel vs the XLA reference formulation.

Runs the Mosaic kernel in interpreter mode on the CPU test mesh and checks
exact interior agreement with ops/fast.fast_score_two_thresholds (the
border differs by construction: zero-padded vertical halo vs jnp.roll wrap;
detect_fast_grid masks both inside the edge margin).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from semantic_slam_tpu.ops.fast import (fast_score_two_thresholds,
                                        fast_score_reference)
from semantic_slam_tpu.ops.fast_pallas import fast_scores_pallas


@pytest.mark.parametrize("shape", [(64, 128), (60, 200), (167, 223)])
def test_pallas_matches_xla_interior(shape, rng):
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    hi_p, lo_p = fast_scores_pallas(img, 20.0, 7.0, interpret=True)
    hi_x, lo_x = fast_score_two_thresholds(img, 20.0, 7.0)
    m = np.zeros(shape, bool)
    m[4:-4, 4:-4] = True
    np.testing.assert_allclose(np.asarray(hi_p)[m], np.asarray(hi_x)[m],
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(lo_p)[m], np.asarray(lo_x)[m],
                               atol=1e-3)


def test_pallas_matches_numpy_oracle(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 144)).astype(np.float32))
    hi_p, _ = fast_scores_pallas(img, 25.0, 10.0, interpret=True)
    oracle = fast_score_reference(np.asarray(img), 25.0)
    m = np.zeros((48, 144), bool)
    m[4:-4, 4:-4] = True
    np.testing.assert_allclose(np.asarray(hi_p)[m], oracle[m], atol=1e-3)
