"""SimpleCNN — the MNIST flagship model.

Architecture parity with the reference (src/shared/models_pytorch.py:59-97):
conv3x3(1→32) → relu → maxpool2 → conv3x3(32→64) → relu → maxpool2 →
flatten(7·7·64) → dense(128) → relu → dropout(0.25) → dense(num_classes).

TPU notes: NHWC layout; convs and the 3136×128 dense land on the MXU. The
whole fwd/bwd is ~25 MFLOP/sample, so the win at scale comes from batching
thousands of (client × sample) images into one program, not from per-op
tuning.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SimpleCNN(nn.Module):
    num_classes: int = 10
    dropout_rate: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))  # (B, 7*7*64)
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)
