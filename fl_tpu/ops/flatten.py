"""Client-stacked pytree <-> (C, D) flat matrix.

The Pallas kernels (DP clip+noise, quantization, weighted reduce) operate on
the flat per-client parameter vector so a single kernel serves every model
architecture. These helpers flatten a pytree whose leaves carry a leading
client axis C into one (C, D) matrix (D padded to a lane multiple) and back.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def flat_dim(tree: Any, batched: bool = True) -> int:
    """Unpadded total D of a (client-stacked) pytree."""
    start = 1 if batched else 0
    return int(sum(np.prod(x.shape[start:]) for x in jax.tree.leaves(tree)))


def padded_dim(d: int) -> int:
    return ((d + LANE - 1) // LANE) * LANE


def stack_flatten(tree: Any) -> Tuple[jax.Array, Any]:
    """(C, ...)-leaf pytree -> ((C, D_pad) float32 matrix, spec).

    The spec captures leaf shapes/dtypes/treedef for :func:`stack_unflatten`.
    """
    leaves, treedef = jax.tree.flatten(tree)
    c = leaves[0].shape[0]
    flats = [leaf.reshape(c, -1).astype(jnp.float32) for leaf in leaves]
    mat = jnp.concatenate(flats, axis=1)
    d = mat.shape[1]
    d_pad = padded_dim(d)
    if d_pad != d:
        mat = jnp.pad(mat, ((0, 0), (0, d_pad - d)))
    spec = (treedef, [(l.shape, l.dtype) for l in leaves], d)
    return mat, spec


def stack_unflatten(mat: jax.Array, spec: Any) -> Any:
    treedef, shapes_dtypes, d = spec
    mat = mat[:, :d]
    out: List[jax.Array] = []
    offset = 0
    c = mat.shape[0]
    for shape, dtype in shapes_dtypes:
        size = int(np.prod(shape[1:]))
        chunk = jax.lax.dynamic_slice_in_dim(mat, offset, size, axis=1)
        out.append(chunk.reshape((c,) + tuple(shape[1:])).astype(dtype))
        offset += size
    return jax.tree.unflatten(treedef, out)
