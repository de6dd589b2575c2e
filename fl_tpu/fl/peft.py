"""Parameter-efficient federated fine-tuning: LoRA adapters + freezing.

Cross-device FL increasingly fine-tunes a pretrained backbone rather than
training from scratch; transmitting and averaging the full parameter tree
is then waste — only the adapters move. This module provides the two
standard mechanisms, both engine-integrated:

- **Freezing** (`RoundEngineConfig.trainable_patterns`): a per-leaf 0/1
  gradient mask built from regex patterns over the flax param paths.
  Frozen leaves receive exactly-zero optimizer updates (masked gradients
  give zero Adam moments, zero SGD velocity), so their FedAvg deltas are
  exactly zero and the global model's frozen region is bit-stable across
  rounds — an invariant the tests pin.
- **LoRA** (Hu et al. 2022): :class:`LoRADense` factorizes each update as
  W + (α/r)·A·B with A ~ N(0, 1/r) frozen-init and B = 0, so fine-tuning
  starts EXACTLY at the pretrained function. On TPU the adapter path is
  two skinny GEMMs fused into the same program as the frozen base GEMM.
  `FederatedViT(lora_rank=r)` threads it through every attention/MLP
  projection; :func:`lora_trainable_patterns` gives the matching freeze
  set (adapters + LayerNorms + head).

DP composition: gradient masking is post-processing of the (possibly
noised) gradient and deltas stay inside the same clip ball, so every
dp_mode composes unchanged (conservatively accounted on the full tree).
Drift correctors (scaffold/fednova/feddyn) assume full-dimension
trajectories and are refused at config time.

The reference has no fine-tuning/freezing machinery at all (its trainer
optimizes every parameter, src/shared/training.py:184-207) — capability
extension.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fl_tpu.core import pytree as pt


class LoRADense(nn.Module):
    """Dense with a rank-r low-rank adapter: y = xW + b + (α/r)·(xA)B.

    A: (in, r) ~ N(0, 1/r); B: (r, out) = 0 — the adapter starts as the
    zero function. Freeze `kernel`/`bias` and train `lora_a`/`lora_b`
    (see :func:`lora_trainable_patterns`)."""

    features: int
    rank: int = 4
    alpha: float = 8.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_f, self.features), jnp.float32)
        a = self.param("lora_a",
                       nn.initializers.normal(stddev=1.0 / self.rank),
                       (in_f, self.rank), jnp.float32)
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features), jnp.float32)
        y = x @ w.astype(self.dtype)
        y = y + (x @ a.astype(self.dtype)) @ b.astype(self.dtype) \
            * (self.alpha / self.rank)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def merge_lora(params: Any, alpha: float = 8.0) -> Any:
    """Fold every {kernel, lora_a, lora_b} triple into the base kernel
    (W ← W + (α/r)·A·B, adapters zeroed) — deployment export: the merged
    tree computes the identical function with the plain Dense cost."""
    def walk(node):
        if isinstance(node, dict):
            if {"kernel", "lora_a", "lora_b"} <= set(node):
                a, b = node["lora_a"], node["lora_b"]
                r = a.shape[-1]
                merged = dict(node)
                merged["kernel"] = (node["kernel"]
                                    + (alpha / r) * (a @ b)).astype(
                    node["kernel"].dtype)
                merged["lora_a"] = jnp.zeros_like(a)
                merged["lora_b"] = jnp.zeros_like(b)
                return merged
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(params)


def trainable_mask(params: Any, patterns: Sequence[str]) -> Any:
    """Params-shaped f32 0/1 tree: leaf is trainable iff its "/"-joined
    path matches ANY of the regex ``patterns`` (re.search semantics)."""
    if not patterns:
        raise ValueError("trainable_patterns must name at least one "
                         "pattern (an empty set would freeze everything)")
    compiled = [re.compile(p) for p in patterns]
    flat = pt.flatten_dict(params)
    hits = {k: any(c.search(k) for c in compiled) for k in flat}
    if not any(hits.values()):
        raise ValueError(
            f"no parameter path matches {list(patterns)}; example paths: "
            f"{sorted(flat)[:5]}")
    mask_flat = {k: jnp.ones_like(v, jnp.float32) if hits[k]
                 else jnp.zeros_like(v, jnp.float32)
                 for k, v in flat.items()}
    return pt.unflatten_dict(mask_flat)


def lora_trainable_patterns() -> Tuple[str, ...]:
    """The standard LoRA fine-tuning set: adapters, LayerNorm scales/
    biases, and the classification head."""
    return ("lora_a", "lora_b", r"(^|/)ln[_0-9]*\w*/", "(^|/)head/")


def count_trainable(mask: Any) -> Tuple[int, int]:
    """(trainable, total) parameter counts under a 0/1 mask tree."""
    leaves = jax.tree.leaves(mask)
    total = sum(leaf.size for leaf in leaves)
    trainable = int(sum(float(leaf.sum()) for leaf in leaves))
    return trainable, total
