"""FederatedResNet — a lightweight ResNet for federated clients.

Architecture parity with the reference (src/shared/models_pytorch.py:168-246):
conv3x3(→64, no bias) + BN + relu, then three stages of basic blocks
([2, 2, 2] by default) at 64/128/256 channels with strides 1/2/2, global
average pooling, and a linear classifier. Shortcut is a 1×1 conv + BN when
the shape changes. The dataset→model map routes cifar100 here
(ref: src/shared/models_pytorch.py:377-378).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ResNetBlock(nn.Module):
    """Basic 2-conv residual block (ref: src/shared/models_pytorch.py:168-194)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_ra = not train
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn2")(y)

        if self.strides != (1, 1) or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="shortcut_conv")(x)
            residual = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype,
                                    name="shortcut_bn")(residual)
        return nn.relu(y + residual)


class FederatedResNet(nn.Module):
    num_classes: int = 10
    num_blocks: Sequence[int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        use_ra = not train
        x = nn.Conv(64, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)

        stage_features = (64, 128, 256)
        stage_strides = (1, 2, 2)
        for s, (features, n_blocks, first_stride) in enumerate(
            zip(stage_features, self.num_blocks, stage_strides)
        ):
            for b in range(n_blocks):
                strides = (first_stride, first_stride) if b == 0 else (1, 1)
                x = ResNetBlock(features, strides=strides, dtype=self.dtype,
                                name=f"layer{s + 1}_block{b + 1}")(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)
