"""CIFAR10CNN — VGG-style 6-conv CNN with BatchNorm (or GroupNorm for DP).

Architecture parity with the reference (src/shared/models_pytorch.py:100-165):
three blocks of [conv-norm-relu ×2 → maxpool2 → dropout] at 32/64/128
channels, then flatten(4·4·128) → dense(512) → dropout → dense(256) →
dropout → dense(num_classes). Dropout rate 0.3.

BatchNorm under vmap: each simulated client keeps its own ``batch_stats``
collection (per-client running statistics), exactly like each reference
client process owns its own torch BN buffers. Aggregation of the stats is
handled by FedAvg (see fl_tpu.fl.fedavg).

``norm="group"`` swaps BatchNorm for GroupNorm (8 groups): BatchNorm
couples examples through batch statistics, which makes per-example
gradients — the object DP-SGD clips — ill-defined; GroupNorm normalizes
within each example (the standard DP substitution, as in opacus). The
group variant also carries the ghost-norm DP instrumentation contract
(``DP_LAYERS`` + ``dp_capture``/``dp_perturb``, see
fl_tpu.fl.privacy.make_ghost_dp_sgd_grad_fn): convs and denses capture
their INPUT and perturb their pre-activation; GroupNorms capture their
OUTPUT and perturb it too (scale/bias per-example grads derive from the
output + cotangent).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class CIFAR10CNN(nn.Module):
    num_classes: int = 10
    dropout_rate: float = 0.3
    dtype: jnp.dtype = jnp.float32
    norm: str = "batch"  # "batch" (reference parity) | "group" (DP-sound)
    group_norm_groups: int = 8
    # scatter-free max-pool BACKWARD (bit-exact; fl_tpu.ops.pool_vjp).
    # MEASURED NET-NEGATIVE on the 512-client TPU bench (1.04 vs 1.19
    # rounds/s): the int32 argmax + one-hot tensors at conv-activation
    # scale cost more HBM traffic than select-and-scatter saves — see
    # docs/performance.md round-3 table. Kept as a tested formulation.
    fast_pool_bwd: bool = False

    @property
    def DP_LAYERS(self) -> Optional[Tuple[Tuple, ...]]:
        """Ghost-norm instrumentation map — only the GroupNorm variant is
        DP-sound (BatchNorm couples examples). GroupNorm entries carry the
        normalization geometry so the ghost engine can recompute x̂ from
        the captured layer INPUT (inverting the affine output would divide
        by the learned scale — inf/NaN when a channel's scale hits 0)."""
        if self.norm != "group":
            return None
        widths = {1: 32, 2: 32, 3: 64, 4: 64, 5: 128, 6: 128}
        layers = []
        for i in range(1, 7):
            layers.append((f"conv{i}", "conv3x3"))
            layers.append((f"gn{i}", "groupnorm",
                           {"groups": min(self.group_norm_groups, widths[i]),
                            "eps": 1e-6}))
        layers += [("fc1", "dense"), ("fc2", "dense"), ("fc3", "dense")]
        return tuple(layers)

    @nn.compact
    def __call__(self, x, *, train: bool = False, dp_perturb=None,
                 dp_capture: bool = False):
        if self.norm not in ("batch", "group"):
            raise ValueError(f"norm={self.norm!r} not in ('batch', 'group')")
        x = x.astype(self.dtype)
        det = not train
        use_ra = not train  # BN: batch stats in train, running stats in eval

        captures = {}

        def tap(name, t):
            if dp_capture:
                captures[name] = t
            return t

        def pert(name, t):
            if dp_perturb is not None:
                t = t + dp_perturb[name].astype(t.dtype)
            return t

        def norm_layer(x, idx):
            if self.norm == "batch":
                return nn.BatchNorm(use_running_average=use_ra,
                                    dtype=self.dtype, name=f"bn{idx}")(x)
            # ghost instrumentation: capture the INPUT (x̂ is recomputed
            # from it with the group statistics), perturb the output
            x = tap(f"gn{idx}", x)
            y = nn.GroupNorm(
                num_groups=min(self.group_norm_groups, x.shape[-1]),
                dtype=self.dtype, name=f"gn{idx}")(x)
            return pert(f"gn{idx}", y)

        def conv_norm_relu(x, features, idx):
            x = tap(f"conv{idx}", x)
            x = pert(f"conv{idx}",
                     nn.Conv(features, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"conv{idx}")(x))
            x = norm_layer(x, idx)
            return nn.relu(x)

        if self.fast_pool_bwd:
            # identical forward, scatter-free VJP (fl_tpu.ops.pool_vjp)
            from fl_tpu.ops.pool_vjp import max_pool_2x2 as pool
        else:
            pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))  # noqa: E731

        def block(x, features, idx):
            x = conv_norm_relu(x, features, idx)
            x = conv_norm_relu(x, features, idx + 1)
            x = pool(x)
            x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
            return x

        x = block(x, 32, 1)
        x = block(x, 64, 3)
        x = block(x, 128, 5)

        x = x.reshape((x.shape[0], -1))  # (B, 4*4*128)
        x = tap("fc1", x)
        x = pert("fc1", nn.Dense(512, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        x = tap("fc2", x)
        x = pert("fc2", nn.Dense(256, dtype=self.dtype, name="fc2")(x))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=det)(x)
        x = tap("fc3", x)
        x = pert("fc3", nn.Dense(self.num_classes, dtype=self.dtype,
                                 name="fc3")(x))
        out = x.astype(jnp.float32)
        return (out, captures) if dp_capture else out
