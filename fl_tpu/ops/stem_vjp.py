"""conv1 (stem) with a tap-GEMM weight gradient.

The round-3 xplane profile of the 512-client bench round shows the single
largest line item is a 100 ms/round LAYOUT COPY (``copy.182``) of the
822 MB conv1 output-gradient tensor: XLA's grouped-conv wgrad kernel wants
channels-minor ``{4,0,3,2,1}`` while the backward chain produces
clients-minor ``{3,0,4,2,1}``, and layout assignment reconciles them with a
full-tensor transpose. A further 47 ms/round goes to the grouped-conv wgrad
itself (``multiply_add_fusion.21``) — a tiny 1-input-channel kernel that
tiles the MXU poorly.

The stem is special: it has ONE input channel and it is the FIRST layer, so
its backward consists of the weight gradient only (the input is data — no
dgrad is ever consumed). For a 3x3/SAME conv the wgrad is exactly

    dW[ky,kx,0,f] = sum_{b,y,x} x_pad[b, y+ky, x+kx] * dy[b,y,x,f]

i.e. nine shifted inner products — one (9, B·H·W) x (B·H·W, F) GEMM built
from nine pad-shifted VIEWS of the small input (26 MB at bench scale)
against the large dy consumed ONCE, with no layout constraint of its own.

This module wraps the STANDARD forward (``lax.conv_general_dilated``,
identical values and layout pressure) in a ``jax.custom_vjp`` whose
backward computes the tap-GEMM wgrad (f32 accumulation via
``preferred_element_type``) and an exact transposed-conv dgrad that XLA
dead-code-eliminates when (as in every model here) the stem input needs no
gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv_fwd_raw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DN)


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_stem(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3/SAME stride-1 conv (x: (B,H,W,C), w: (3,3,C,F)) — standard
    forward, tap-GEMM wgrad backward. Profiled/tuned for the C=1 MNIST
    stem; correct for any C."""
    return _conv_fwd_raw(x, w)


def _fwd(x, w):
    return _conv_fwd_raw(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    B, H, W, C = x.shape
    F = w.shape[-1]
    # 9·C pad-shifted views of the (small) input, flattened to the GEMM
    # contraction axis: taps[(ky,kx,c)] = x_pad[:, ky:ky+H, kx:kx+W, c]
    # row-major (C == 1 for the MNIST stem this was profiled on; the
    # general form keeps RGB stems correct)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([
        xp[:, ky:ky + H, kx:kx + W, c].reshape(B * H * W)
        for ky in range(3) for kx in range(3) for c in range(C)
    ])  # (9*C, B*H*W)
    dyf = dy.reshape(B * H * W, F)
    dw = lax.dot_general(
        taps.astype(dy.dtype), dyf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(3, 3, C, F).astype(w.dtype)
    # exact dgrad (transposed conv) — dead-code-eliminated whenever the
    # stem input is data, which is every use in this repo
    dx = lax.conv_general_dilated(
        dy, jnp.flip(w, (0, 1)).swapaxes(2, 3),
        window_strides=(1, 1), padding="SAME", dimension_numbers=_DN,
    ).astype(x.dtype)
    return dx, dw


conv3x3_stem.defvjp(_fwd, _bwd)


import flax.linen as nn  # noqa: E402


class StemConv(nn.Module):
    """Drop-in replacement for the stem ``nn.Conv(F, (3,3), SAME)``: same
    parameter tree (kernel/bias, same initializers), same forward values,
    tap-GEMM weight gradient (conv3x3_stem)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = conv3x3_stem(x.astype(self.dtype), kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)
