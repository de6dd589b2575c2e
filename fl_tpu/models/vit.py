"""FederatedViT — a compact Vision Transformer for federated image
classification.

Beyond the reference's model zoo (src/shared/models_pytorch.py ships four
CNNs and no attention architecture) — added because the transformer block is
the best-case architecture for the TPU's MXU: every parameterized op (patch
embed, QKV/out projections, MLP) is a dense GEMM with static shapes, no
grouped-conv lowering, no select-and-scatter pool backward — precisely the
two op families the round-2/3 profiling campaigns found to be the CNN
superstep's off-roofline hotspots (docs/performance.md).

Design follows the "simple ViT" recipe (Beyer, Zhai & Kolesnikov 2022):
conv-as-GEMM patch embedding, learned positional embeddings, pre-LN encoder
blocks, global average pooling instead of a class token (better at small
scale, and one fewer sequence position to pad). LayerNorm everywhere — no
batch statistics — so the model composes with EVERY dp_mode (dp_sgd refuses
BatchNorm models; client-level modes average stats awkwardly) and with all
drift correctors.

Federated fine-tuning: ``freeze_patterns`` in fl_tpu.fl.peft (LoRA /
head-only) target the ``attn``/``mlp`` Dense kernels by path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _dense(features, lora_rank, dtype, name):
    """Projection factory: plain Dense, or LoRA-adapted Dense when
    fine-tuning (fl_tpu.fl.peft.LoRADense — same function at init since
    B=0, so a pretrained checkpoint loads into the base kernels)."""
    if lora_rank > 0:
        from fl_tpu.fl.peft import LoRADense

        return LoRADense(features, rank=lora_rank, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class EncoderBlock(nn.Module):
    """Pre-LN transformer block with explicit QKV/out projections (rather
    than nn.MultiHeadDotProductAttention) so every parameterized GEMM can
    carry a LoRA adapter and is addressable by path for freezing."""

    embed_dim: int
    num_heads: int
    mlp_ratio: int
    dropout_rate: float
    dtype: Any
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x, *, train: bool):
        b, n, d = x.shape
        hd = d // self.num_heads
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        q = _dense(d, self.lora_rank, self.dtype, "q")(h)
        k = _dense(d, self.lora_rank, self.dtype, "k")(h)
        v = _dense(d, self.lora_rank, self.dtype, "v")(h)
        q = q.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores / np.sqrt(hd), axis=-1)
        attn = nn.Dropout(self.dropout_rate,
                          deterministic=not train)(attn)
        h = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v)
        h = h.transpose(0, 2, 1, 3).reshape(b, n, d)
        h = _dense(d, self.lora_rank, self.dtype, "out")(h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = _dense(self.embed_dim * self.mlp_ratio, self.lora_rank,
                   self.dtype, "mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = _dense(self.embed_dim, self.lora_rank, self.dtype,
                   "mlp_out")(h)
        return x + h


class FederatedViT(nn.Module):
    """Patch-embed → +pos → depth×(pre-LN MHSA + MLP) → LN → mean-pool →
    head. Defaults give ~550k params at 32×32 (CNN-zoo scale)."""

    num_classes: int = 10
    patch_size: int = 4
    embed_dim: int = 128
    depth: int = 4
    num_heads: int = 4
    mlp_ratio: int = 2
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    # > 0: every attention/MLP projection becomes a LoRADense of this rank
    # (fl_tpu.fl.peft) — pair with RoundEngineConfig.trainable_patterns =
    # fl_tpu.fl.peft.lora_trainable_patterns() for federated fine-tuning
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, _ = x.shape
        if h % self.patch_size or w % self.patch_size:
            raise ValueError(
                f"input {h}x{w} not divisible by patch_size="
                f"{self.patch_size}")
        x = x.astype(self.dtype)
        # conv with kernel == stride == patch: XLA lowers this to ONE GEMM
        # of shape (B·num_patches, patch²·C) × (patch²·C, embed_dim)
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(x)
        n_patches = (h // self.patch_size) * (w // self.patch_size)
        x = x.reshape(b, n_patches, self.embed_dim)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, n_patches, self.embed_dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        for i in range(self.depth):
            x = EncoderBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                             self.dropout_rate, self.dtype,
                             lora_rank=self.lora_rank,
                             name=f"block{i}")(x, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        x = x.mean(axis=1)  # global average pooling over patches
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)

    @staticmethod
    def flops_per_sample(input_hw: int = 32, patch: int = 4,
                         dim: int = 128, depth: int = 4,
                         mlp_ratio: int = 2, channels: int = 3) -> int:
        """Forward MACs (host-side estimate for capability adaptation)."""
        n = (input_hw // patch) ** 2
        embed = n * patch * patch * channels * dim
        per_block = (4 * n * dim * dim            # QKV + out proj
                     + 2 * n * n * dim            # attention matmuls
                     + 2 * n * dim * dim * mlp_ratio)
        return int(embed + depth * per_block)
