"""Top-k sparsification of model updates.

Parity target: ``TopKSparsificationCompressor`` (src/shared/compression.py:
250-370) — keep the top-k elements by |value| of each tensor, storing values
+ flat indices. The reference does torch.topk per layer on host; here it is
``jax.lax.top_k`` over the flat update vector on device (XLA's top_k is
already a tuned TPU sort-based kernel; a Pallas rewrite would not beat it).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_sparsify(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Return (values (k,), indices (k,) int32) of the largest-|x| entries."""
    (d,) = x.shape
    k = min(k, d)
    _, idx = jax.lax.top_k(jnp.abs(x), k)
    return jnp.take(x, idx), idx.astype(jnp.int32)


def topk_densify(values: jax.Array, indices: jax.Array, d: int) -> jax.Array:
    """Scatter the sparse (values, indices) back to a dense (d,) vector."""
    return jnp.zeros((d,), values.dtype).at[indices].set(values)


def topk_sparsify_ratio(x: jax.Array, sparsity_ratio: float
                        ) -> Tuple[jax.Array, jax.Array]:
    """Keep ceil((1 − ratio)·d) entries (ref semantics: sparsity_ratio is the
    dropped fraction, compression.py:327-370)."""
    (d,) = x.shape
    k = max(1, int(round(d * (1.0 - sparsity_ratio))))
    return topk_sparsify(x, k)
