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
    """``fast_ops=True`` swaps the stem conv and the pools for the
    GEMM-shaped formulations in fl_tpu.ops.fast_layers (same parameter
    tree and forward values; maxpool gradient splits ties instead of
    scattering to one argmax). Used by the 512-client bench path where
    XLA's grouped-conv lowering of the vmapped per-client conv costs
    layout copies + a slow wgrad (see that module's docstring)."""

    num_classes: int = 10
    dropout_rate: float = 0.25
    dtype: jnp.dtype = jnp.float32
    fast_ops: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.fast_ops:
            from fl_tpu.ops.fast_layers import FastConv3x3, max_pool_2x2

            conv1 = FastConv3x3(32, dtype=self.dtype, name="conv1")
            pool = max_pool_2x2
        else:
            conv1 = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv1")
            pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))  # noqa: E731
        x = x.astype(self.dtype)
        x = conv1(x)
        x = nn.relu(x)
        x = pool(x)
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = pool(x)
        x = x.reshape((x.shape[0], -1))  # (B, 7*7*64)
        x = nn.Dense(128, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)
