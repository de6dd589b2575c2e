"""Pytree utilities for model weights.

The reference passes model weights around as ``{name: torch.Tensor}`` dicts
and loops over layers on the host for every norm / average / delta
(e.g. ``src/shared/privacy.py:119-123`` global-norm loop,
``src/aggregation/fedavg.py:278-288`` weighted-average loop). Here all of
those are single fused XLA expressions over pytrees, so they run on-device,
vectorize over a stacked client axis, and never materialize per-layer host
scalars.

Conventions:
- A "weights pytree" is any JAX pytree of arrays (flax param dicts included).
- A "stacked" pytree has a leading client axis C on every leaf.
- ``flatten_dict``/``unflatten_dict`` convert between nested flax params and
  the flat ``{"a/b/kernel": arr}`` form used on the wire and in checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


def tree_zeros_like(tree: PyTree) -> PyTree:
    return jax.tree.map(jnp.zeros_like, tree)


def tree_add(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree.map(jnp.add, a, b)


def tree_sub(a: PyTree, b: PyTree) -> PyTree:
    return jax.tree.map(jnp.subtract, a, b)


def tree_scale(tree: PyTree, scalar) -> PyTree:
    return jax.tree.map(lambda x: x * scalar, tree)


def tree_dot(a: PyTree, b: PyTree) -> jax.Array:
    """Inner product over all leaves."""
    parts = jax.tree.leaves(jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b))
    return jnp.sum(jnp.stack(parts)) if parts else jnp.zeros(())


def global_norm(tree: PyTree) -> jax.Array:
    """Global L2 norm over every leaf (ref semantics:
    src/shared/privacy.py:119-123 — sqrt of the sum of per-layer squared
    norms, computed as one fused reduction)."""
    sq = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree)]
    if not sq:
        return jnp.zeros(())
    return jnp.sqrt(jnp.sum(jnp.stack(sq)))


def clip_by_global_norm(tree: PyTree, max_norm: float) -> Tuple[PyTree, jax.Array]:
    """Scale the whole pytree so its global L2 norm is at most ``max_norm``.

    Returns ``(clipped_tree, min(actual_norm, max_norm))`` — the second value
    is the reference's "actual sensitivity" (src/shared/privacy.py:140: it
    returns ``min(total_norm, max_grad_norm)`` which then becomes the Gaussian
    mechanism's sensitivity at privacy.py:296-301).
    """
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    clipped = jax.tree.map(lambda x: (x * scale).astype(x.dtype), tree)
    return clipped, jnp.minimum(norm, max_norm)


def tree_size(tree: PyTree) -> int:
    """Total number of scalar parameters."""
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def tree_bytes(tree: PyTree) -> int:
    """Total parameter bytes (ref: estimate_memory_usage,
    src/shared/models_pytorch.py:42-46)."""
    return int(sum(np.prod(x.shape) * x.dtype.itemsize for x in jax.tree.leaves(tree)))


def tree_ravel(tree: PyTree) -> Tuple[jax.Array, Any]:
    """Flatten a pytree into one 1-D vector; returns (vector, unravel_fn).

    Used by the Pallas kernels (DP clip+noise, quantization, weighted
    aggregation), which operate on the flat parameter vector so every model
    architecture shares one kernel.
    """
    from jax.flatten_util import ravel_pytree

    return ravel_pytree(tree)


def stacked_weighted_mean(stacked: PyTree, weights: jax.Array) -> PyTree:
    """FedAvg core: weighted mean over the leading client axis.

    ``stacked`` leaves have shape (C, ...); ``weights`` has shape (C,) and is
    assumed normalized (Σw = 1). This replaces the reference's per-layer
    host loop (src/aggregation/fedavg.py:267-289) with one einsum per leaf —
    on TPU each einsum is a single fused reduction over HBM-resident client
    replicas.
    """

    def avg(leaf: jax.Array) -> jax.Array:
        w = weights.astype(jnp.float32).reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.sum(leaf.astype(jnp.float32) * w, axis=0).astype(leaf.dtype)

    return jax.tree.map(avg, stacked)


def tree_where(mask_scalar: jax.Array, a: PyTree, b: PyTree) -> PyTree:
    """Per-leaf select by a scalar (or leading-axis-broadcastable) predicate."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            mask_scalar.reshape((-1,) + (1,) * (x.ndim - 1))
            if getattr(mask_scalar, "ndim", 0) == 1 and x.ndim >= 1
            else mask_scalar,
            x,
            y,
        ),
        a,
        b,
    )


# ---------------------------------------------------------------------------
# flat-dict <-> nested-dict conversion (wire / checkpoint form)
# ---------------------------------------------------------------------------

def flatten_dict(nested: Mapping[str, Any], sep: str = "/") -> Dict[str, Any]:
    """Flatten a nested mapping into {"a/b/c": leaf} form."""
    out: Dict[str, Any] = {}

    def rec(prefix: str, node: Any) -> None:
        if isinstance(node, Mapping):
            for k in node:
                rec(f"{prefix}{sep}{k}" if prefix else str(k), node[k])
        else:
            out[prefix] = node

    rec("", nested)
    return out


def unflatten_dict(flat: Mapping[str, Any], sep: str = "/") -> Dict[str, Any]:
    """Inverse of :func:`flatten_dict`."""
    out: Dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return out


def assert_same_structure(a: Mapping[str, Any], b: Mapping[str, Any]) -> None:
    """Raise if two flat weight dicts differ in keys or shapes
    (ref: validate_model_compatibility, src/shared/validation.py:256-283)."""
    ka, kb = set(a.keys()), set(b.keys())
    if ka != kb:
        missing = ka.symmetric_difference(kb)
        raise ValueError(f"Weight structures differ; mismatched keys: {sorted(missing)}")
    for k in a:
        sa, sb = tuple(np.shape(a[k])), tuple(np.shape(b[k]))
        if sa != sb:
            raise ValueError(f"Shape mismatch for {k!r}: {sa} vs {sb}")


def leaves_by_path(tree: PyTree) -> Iterable[Tuple[str, jax.Array]]:
    """Yield (path, leaf) pairs using jax's key-path API."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        yield jax.tree_util.keystr(path), leaf
