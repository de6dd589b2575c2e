"""3x3/SAME conv with tap-GEMM backward (wgrad + dgrad).

Round-3 profile, after the stem fix: conv2's backward dominates the
remaining attackable time — ``fusion.370`` (dgrad) 49 ms/round and
``multiply_add_fusion.23`` (wgrad+adam) 32.5 ms/round, both grouped-conv
lowerings running ~30-60x off the HBM roofline at the bench's
512-client/tiny-spatial shape (docs/performance.md). The forward is left
EXACTLY as XLA lowers it (round 2 measured every forward reformulation
slower); only the VJP is replaced:

- **wgrad** as one packed patch GEMM:
  ``dW[t,i,f] = sum_bhw x_patches[t, bhw, i] * dy[bhw, f]`` — a
  (9, B·H·W, Ci) x (B·H·W, F) contraction with f32 accumulation, built
  from nine pad-shifted views of the (smaller) input;
- **dgrad** as nine batched GEMMs:
  ``dx = sum_t dy_pad_shift[t] @ w_flip[t]`` — a
  (9, B·H·W, F) x (9, F, Ci) batched contraction summed over taps,
  mathematically the transposed convolution.

Both consume ``dy`` without imposing a conv-kernel layout on it, which is
what made XLA insert full-tensor layout copies around the grouped-conv
backward kernels. Gradients match autodiff to accumulation order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_fwd_raw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME", dimension_numbers=_DN)


@jax.custom_vjp
def conv3x3_tapgemm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x: (B,H,W,Ci), w: (3,3,Ci,F) — standard forward, tap-GEMM VJP."""
    return _conv_fwd_raw(x, w)


def _fwd(x, w):
    return _conv_fwd_raw(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    B, H, W, Ci = x.shape
    F = w.shape[-1]
    BHW = B * H * W

    # ---- wgrad: packed patch GEMM, f32 accumulation
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xpat = jnp.stack([
        xp[:, ky:ky + H, kx:kx + W, :].reshape(BHW, Ci)
        for ky in range(3) for kx in range(3)
    ])  # (9, BHW, Ci)
    dyf = dy.reshape(BHW, F)
    dw = lax.dot_general(
        xpat, dyf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(3, 3, Ci, F).astype(w.dtype)

    # ---- dgrad: nine shifted GEMMs against the flipped kernel
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dypat = jnp.stack([
        dyp[:, ky:ky + H, kx:kx + W, :].reshape(BHW, F)
        for ky in range(3) for kx in range(3)
    ])  # (9, BHW, F)
    wflip = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2) \
        .reshape(9, F, Ci).astype(dy.dtype)  # (9, F, Ci)
    dx = lax.dot_general(
        dypat, wflip,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    ).sum(0).reshape(B, H, W, Ci).astype(x.dtype)
    return dx, dw


conv3x3_tapgemm.defvjp(_fwd, _bwd)


import flax.linen as nn  # noqa: E402


class TapGemmConv(nn.Module):
    """Drop-in for ``nn.Conv(F, (3,3), SAME)``: same parameter tree and
    forward program, tap-GEMM backward."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = conv3x3_tapgemm(x.astype(self.dtype),
                            kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)
