"""CIFAR10CNN — VGG-style 6-conv CNN with BatchNorm.

Architecture parity with the reference (src/shared/models_pytorch.py:100-165):
three blocks of [conv-bn-relu ×2 → maxpool2 → dropout] at 32/64/128 channels,
then flatten(4·4·128) → dense(512) → dropout → dense(256) → dropout →
dense(num_classes). Dropout rate 0.3.

BatchNorm under vmap: each simulated client keeps its own ``batch_stats``
collection (per-client running statistics), exactly like each reference
client process owns its own torch BN buffers. Aggregation of the stats is
handled by FedAvg (see fl_tpu.fl.fedavg).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CIFAR10CNN(nn.Module):
    num_classes: int = 10
    dropout_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        det = not train
        use_ra = not train  # BN: batch stats in train, running stats in eval

        def block(x, features, idx):
            x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{idx}")(x)
            x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype,
                             name=f"bn{idx}")(x)
            x = nn.relu(x)
            x = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{idx + 1}")(x)
            x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype,
                             name=f"bn{idx + 1}")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
            return x

        x = block(x, 32, 1)
        x = block(x, 64, 3)
        x = block(x, 128, 5)

        x = x.reshape((x.shape[0], -1))  # (B, 4*4*128)
        x = nn.Dense(512, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        x = nn.Dense(256, dtype=self.dtype, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)
        return x.astype(jnp.float32)
