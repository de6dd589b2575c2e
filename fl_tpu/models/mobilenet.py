"""LightweightMobileNet — depthwise-separable CNN for constrained clients.

Architecture parity with the reference (src/shared/models_pytorch.py:249-328):
conv3x3(→32·w) + BN + relu, then depthwise-separable blocks with
(out_channels, stride) config [(64,1),(128,2),(128,1),(256,2),(256,1),(512,2)]
scaled by a width multiplier through the same ``make_divisible`` rounding,
global average pooling, linear classifier. The factory's "lightweight" preset
uses width_multiplier=0.5 (ref: src/shared/models_pytorch.py:384-398).

Depthwise conv maps to ``feature_group_count`` in XLA; on TPU the depthwise
stage runs on the VPU and the pointwise 1×1 conv is a pure MXU matmul.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def make_divisible(v: float, divisor: int = 8) -> int:
    """Channel rounding used by MobileNet-family width scaling
    (ref: src/shared/models_pytorch.py:279-283)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MobileNetBlock(nn.Module):
    """Depthwise 3×3 + pointwise 1×1, each with BN+relu
    (ref: src/shared/models_pytorch.py:249-266)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_ra = not train
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (3, 3), strides=self.strides, padding="SAME",
                    feature_group_count=in_ch, use_bias=False, dtype=self.dtype,
                    name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class LightweightMobileNet(nn.Module):
    num_classes: int = 10
    width_multiplier: float = 1.0
    dtype: jnp.dtype = jnp.float32

    BLOCK_CONFIG = ((64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2))

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        use_ra = not train
        ch = make_divisible(32 * self.width_multiplier)
        x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)

        for i, (out_ch, stride) in enumerate(self.BLOCK_CONFIG):
            out_ch = make_divisible(out_ch * self.width_multiplier)
            x = MobileNetBlock(out_ch, strides=(stride, stride), dtype=self.dtype,
                               name=f"block{i + 1}")(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        return x.astype(jnp.float32)
