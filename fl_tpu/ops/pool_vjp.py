"""2x2/stride-2 max pool with a GEMM-friendly backward.

XLA lowers the VJP of ``lax.reduce_window``(max) to ``select-and-scatter``,
which on TPU is a slow, layout-constraining op — the round-2 xplane profile
of the 512-client bench round attributes ~55 ms/round to it
(docs/performance.md). For the NON-OVERLAPPING 2x2/stride-2 window the
scatter is overkill: each input element belongs to exactly one window, so
the backward is just "route the window's gradient to its (first) argmax" —
expressible as reshape + argmax + compare, all vectorizable ops.

This module wraps the STANDARD forward (``lax.reduce_window`` — identical
values, identical layout pressure on the surrounding convs, unlike the
round-2 ``fast_layers`` attempt that swapped the forward too and lost) in a
``jax.custom_vjp`` whose backward reproduces select-and-scatter's semantics
EXACTLY, including first-match tie-breaking: XLA's scatter with a GE select
keeps the earliest window element on ties, and ``argmax`` picks the first
maximum in the same row-major window order.

Replaces: the maxpool gradient of the reference's torch stack
(src/shared/models_pytorch.py:76-81 uses nn.MaxPool2d, whose CUDA backward
is an atomic scatter); here the TPU-native answer is to avoid scatter
entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool_fwd_raw(x: jnp.ndarray) -> jnp.ndarray:
    """Standard 2x2/stride-2 max pool over (..., H, W, C) — the same
    reduce_window program flax's nn.max_pool emits."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    ndim = x.ndim
    dims = [1] * ndim
    strides = [1] * ndim
    dims[-3] = dims[-2] = 2
    strides[-3] = strides[-2] = 2
    return lax.reduce_window(x, neg_inf, lax.max, tuple(dims),
                             tuple(strides), "VALID")


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return _pool_fwd_raw(x)


def _fwd(x):
    return _pool_fwd_raw(x), x


def _bwd(x, g):
    *lead, H, W, C = x.shape
    Ho, Wo = H // 2, W // 2
    # (..., Ho, 2, Wo, 2, C) -> (..., Ho, Wo, 2, 2, C) -> window axis of 4
    # in ROW-MAJOR window order (matches select-and-scatter's scan order)
    xr = x.reshape(*lead, Ho, 2, Wo, 2, C)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2,
                                     len(lead) + 1, len(lead) + 3,
                                     len(lead) + 4]
    xw = xr.transpose(perm).reshape(*lead, Ho, Wo, 4, C)
    first_max = jnp.argmax(xw, axis=-2)  # first max on ties, like GE-select
    iota = lax.broadcasted_iota(first_max.dtype, xw.shape, xw.ndim - 2)
    onehot = (iota == first_max[..., None, :]).astype(g.dtype)
    dxw = onehot * g[..., None, :]
    # invert the reshape/transpose back to (..., H, W, C)
    inv = dxw.reshape(*lead, Ho, Wo, 2, 2, C).transpose(perm)
    return (inv.reshape(*lead, H, W, C).astype(x.dtype),)


max_pool_2x2.defvjp(_fwd, _bwd)
