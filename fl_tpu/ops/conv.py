"""3x3 SAME conv as 9 shifted GEMMs with a custom VJP — the MXU hot path.

Why this exists (docs/performance.md, round-2 perf item): the bench workload
vmaps local SGD over C=512 clients, each with *its own* conv weights. XLA
lowers the doubly-vmapped `conv_general_dilated` to a grouped conv whose
*backward* (dgrad + wgrad) costs ~2.6x the forward — 34 of 85 ms/step, the
single largest line in the round budget.

The fix: a 3x3 stride-1 SAME conv is exactly

    y[b,h,w,o] = sum_{dh,dw in 0..2} x_pad[b, h+dh, w+dw, :] @ W[dh,dw,:,:]

i.e. nine (B*H*W, I) @ (I, O) matmuls. Under `vmap` over the client axis
each matmul becomes one *batched* GEMM (C, B*H*W, I) @ (C, I, O), which XLA
maps straight onto the MXU. The custom VJP expresses dgrad and wgrad the
same way:

    dx = sum_{dh,dw} shift(dy, 2-dh, 2-dw) @ W[dh,dw].T        (9 GEMMs)
    dW[dh,dw] = shift(x, dh, dw).reshape(BHW, I).T @ dy        (9 GEMMs,
                                                K = B*H*W — MXU-friendly)

All GEMMs accumulate in float32 (`preferred_element_type`) regardless of the
bf16 operand dtype.

Replaces the hot loop of the reference's `_train_epoch`
(src/shared/training.py:184-207) at the kernel level; architecture parity
for the conv layers of src/shared/models_pytorch.py:59-165.

The op is shape-generic (any H, W, I, O; 3x3 stride-1 SAME only) and works
on CPU too; `Conv3x3Fast` (flax module) keeps nn.Conv's parameter naming
("kernel" HWIO + "bias") so checkpoints and param-tree tests are unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gemm(a: jax.Array, b: jax.Array) -> jax.Array:
    """(M, K) @ (K, N) in f32 accumulation. Batched to (C,M,K)@(C,K,N) by vmap."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@jax.custom_vjp
def conv3x3_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv: x (B,H,W,I), w (3,3,I,O) -> (B,H,W,O)."""
    return _fwd_impl(x, w)


def _fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    B, H, W, I = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * H * W, O), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = xp[:, dh:dh + H, dw:dw + W, :].reshape(B * H * W, I)
            acc = acc + _gemm(xs, w[dh, dw])
    return acc.reshape(B, H, W, O).astype(x.dtype)


def _fwd_rule(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd_rule(res, g):
    x, w = res
    B, H, W, I = x.shape
    O = w.shape[-1]
    g = g.astype(x.dtype)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g2 = g.reshape(B * H * W, O)

    dx_acc = jnp.zeros((B * H * W, I), jnp.float32)
    dw_rows = []
    for dh in range(3):
        for dw in range(3):
            # dgrad: dx += shift(dy, 2-dh, 2-dw) @ W[dh,dw]^T
            gs = gp[:, 2 - dh:2 - dh + H, 2 - dw:2 - dw + W, :]
            dx_acc = dx_acc + _gemm(gs.reshape(B * H * W, O), w[dh, dw].T)
            # wgrad: dW[dh,dw] = shift(x, dh, dw)^T @ dy   (K = B*H*W)
            xs = xp[:, dh:dh + H, dw:dw + W, :].reshape(B * H * W, I)
            dw_rows.append(_gemm(xs.T, g2))
    dx = dx_acc.reshape(B, H, W, I).astype(x.dtype)
    dwt = jnp.stack(dw_rows).reshape(3, 3, I, O).astype(w.dtype)
    return dx, dwt


conv3x3_same.defvjp(_fwd_rule, _bwd_rule)


class Conv3x3Fast(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME')``.

    Same parameter names/shapes ("kernel" HWIO, "bias") and init as nn.Conv,
    so param trees, checkpoints, and serialization are unchanged.
    """

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, in_features, self.features), self.param_dtype,
        )
        bias: Optional[jax.Array] = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        x = x.astype(self.dtype)
        y = conv3x3_same(x, kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
