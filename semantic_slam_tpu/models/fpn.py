"""Feature Pyramid Network (P2-P6) over the ResNet C2-C5 features."""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]) -> Tuple[jnp.ndarray, ...]:
        conv1 = lambda name: nn.Conv(  # noqa: E731
            self.out_channels, (1, 1), dtype=self.dtype, name=name,
            precision=jax.lax.Precision.DEFAULT)
        conv3 = lambda name: nn.Conv(  # noqa: E731
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
            name=name, precision=jax.lax.Precision.DEFAULT)

        laterals = [conv1(f"lateral{i+2}")(f) for i, f in enumerate(feats)]
        # top-down pathway
        ps = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jax.image.resize(ps[-1], lat.shape, method="nearest")
            ps.append(lat + up)
        ps = ps[::-1]                       # P2..P5 (fine -> coarse)
        ps = [conv3(f"post{i+2}")(p) for i, p in enumerate(ps)]
        p6 = nn.max_pool(ps[-1], (1, 1), (2, 2))   # P6 for RPN
        return tuple(ps) + (p6,)
