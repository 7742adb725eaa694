"""ResNet backbone (Flax) for the instance-segmentation stack.

TPU-native counterpart of the reference's R-50 backbone inside
maskrcnn-benchmark (``src/MaskRCNN.py.in`` uses the caffe2 R-50-FPN config).
Convs run in bfloat16 (MXU) with f32 parameters and explicit DEFAULT matmul
precision — the package-level f32 matmul pin is for geometry code, NN layers
opt back into the fast path here.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1
    projection: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s=1: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, precision=jax.lax.Precision.DEFAULT)
        norm = lambda: nn.GroupNorm(num_groups=32, dtype=jnp.float32)  # noqa: E731

        residual = x
        y = conv(self.filters, 1)(x)
        y = nn.relu(norm()(y))
        y = conv(self.filters, 3, self.strides)(y)
        y = nn.relu(norm()(y))
        y = conv(self.filters * 4, 1)(y)
        y = norm()(y)
        if self.projection:
            residual = conv(self.filters * 4, 1, self.strides)(x)
            residual = norm()(residual)
        return nn.relu(y + residual.astype(y.dtype))


class ResNet(nn.Module):
    """Returns feature maps (C2, C3, C4, C5) at strides 4/8/16/32."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)   # R-50
    width: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype,
                    precision=jax.lax.Precision.DEFAULT)(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x).astype(self.dtype))
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        outs = []
        filters = self.width
        for stage, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if stage == 0 else 2
            x = BottleneckBlock(filters, stride, projection=True,
                                dtype=self.dtype)(x)
            for _ in range(n_blocks - 1):
                x = BottleneckBlock(filters, dtype=self.dtype)(x)
            outs.append(x)
            filters *= 2
        return tuple(outs)
