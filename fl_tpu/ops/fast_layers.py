"""XLA-friendly reformulations of SimpleCNN's hot layers.

Profiling the 512-client bench superstep (scripts/profile_bench_round.py,
op-level xplane breakdown) showed the vmapped per-client-weights model pays
three structural taxes under XLA's default lowerings:

1. **maxpool backward lowers to select-and-scatter** — 55 ms/round across
   the two pools, plus it anchors activation layouts that force transpose
   copies. ``max_pool_2x2`` reshapes to (..., H/2, 2, W/2, 2, C) and
   reduce-maxes the block dims; its VJP is an equality-mask select, no
   select-and-scatter. (Tie-breaking differs from nn.max_pool's gradient —
   ties split evenly instead of scattering to one argmax — an equivalent
   subgradient.)
2. **conv1 (I=1) lowers to a grouped conv in a batch-major layout**
   [B,H,W,C,32] that costs a 100 ms/round layout copy (%copy.182) plus a
   47 ms/round wgrad. ``conv3x3_patchT`` computes the conv as an explicit
   patch-matrix GEMM with the patch-tap axis in sublanes and the flattened
   spatial axis in lanes (the lane-major "patchT" layout measured in
   scripts/probe_stem_wgrad.py), with a custom VJP whose wgrad is one
   batched GEMM. The input grad (dead for a first layer) is an independent
   subgraph XLA DCEs.
3. The formulations keep every tensor in GEMM-shaped (batch, rows, ch)
   layouts so XLA stops flip-flopping between conv layouts.

Replaces the compute of the reference's hot loop
(src/shared/training.py:184-207) for SimpleCNN
(src/shared/models_pytorch.py:59-97) with compiler-friendly TPU ops.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max pool via block reshape + reduce-max (no select-and-scatter
    in the backward). x (..., H, W, C) with even H, W."""
    *lead, H, W, C = x.shape
    x = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    return x.max(axis=(-4, -2))


# --- conv3x3 as lane-major patch GEMM --------------------------------------

def _geometry(H: int, W: int):
    Hp, Wp = H + 2, W + 2
    offsets = [dh * Wp + dw for dh in range(3) for dw in range(3)]
    return Hp, Wp, Hp * Wp, offsets


def _patches_lane_major(x: jax.Array):
    """x (B,H,W,I) -> P (B, 9I, M): tap-k/channel-i row holds the flattened
    SAME-padded image shifted by tap offset k; M = (H+2)(W+2) lane-major."""
    B, H, W, I = x.shape
    Hp, Wp, M, offsets = _geometry(H, W)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xf = xp.transpose(0, 3, 1, 2).reshape(B, I, M)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (0, 2 * Wp + 2)))
    taps = [xf[:, :, off:off + M] for off in offsets]       # 9 x (B, I, M)
    return jnp.concatenate(taps, axis=1)                    # (B, 9I, M)


def _dy_lane_major(dy: jax.Array):
    """dy (B,H,W,O) -> (B, M, O): output position (h, w) at row h*Wp + w
    (no start offset), zero rows elsewhere."""
    B, H, W, O = dy.shape
    Hp, Wp, M, _ = _geometry(H, W)
    return jnp.pad(dy, ((0, 0), (0, 2), (0, 2), (0, 0))).reshape(B, M, O)


@jax.custom_vjp
def conv3x3_patchT(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 stride-1 SAME conv: x (B,H,W,I), w (3,3,I,O) -> (B,H,W,O).

    Forward and wgrad are single batched GEMMs over the lane-major patch
    matrix; no grouped-conv lowering anywhere. Intended for small I (the
    patch matrix is 9x the input); the model uses it for the I=1 stem.
    """
    return _fwd(x, w)


def _fwd(x, w):
    B, H, W, I = x.shape
    O = w.shape[-1]
    Hp, Wp, M, _ = _geometry(H, W)
    P = _patches_lane_major(x)                              # (B, 9I, M)
    w2 = w.reshape(9 * I, O).astype(x.dtype)
    # y2 (B, M, O) = P^T @ w2
    y2 = jax.lax.dot_general(
        P, w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # rows m = h*Wp + w hold output position (h, w): the patch row for
    # output (h, w), tap (dh, dw) is xp[h+dh, w+dw] = row m + dh*Wp + dw
    return y2.reshape(B, Hp, Wp, O)[:, :H, :W, :]


def _fwd_rule(x, w):
    return _fwd(x, w), (x, w)


def _bwd_rule(res, g):
    x, w = res
    B, H, W, I = x.shape
    O = w.shape[-1]
    Hp, Wp, M, offsets = _geometry(H, W)
    g = g.astype(x.dtype)
    dy2 = _dy_lane_major(g)                                 # (B, M, O)

    # wgrad: dW (9I, O) = sum_B P @ dy2  (contract over B and M)
    P = _patches_lane_major(x)
    dw2 = jax.lax.dot_general(
        P, dy2, (((0, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = dw2.reshape(3, 3, I, O).astype(w.dtype)

    # dgrad (dead for a first layer; independent subgraph, DCE'd then):
    # dx[m] = sum_k dy[m - off_k] @ w[k]^T  — negative-shift patches of dy
    dyf = dy2.transpose(0, 2, 1)                            # (B, O, M)
    smax = offsets[-1]
    dyh = jnp.pad(dyf, ((0, 0), (0, 0), (smax, 0)))
    dtaps = [dyh[:, :, smax - off: smax - off + M] for off in offsets]
    Pd = jnp.concatenate(dtaps, axis=1)                     # (B, 9O, M)
    wd = jnp.transpose(w, (0, 1, 3, 2)).reshape(9 * O, I).astype(x.dtype)
    dx2 = jax.lax.dot_general(
        Pd, wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dx rows: input pixel (h', w') sits at xp row (h'+1)*Wp + (w'+1)
    dx = dx2.reshape(B, Hp, Wp, I)[:, 1:H + 1, 1:W + 1, :]
    return dx, dw


conv3x3_patchT.defvjp(_fwd_rule, _bwd_rule)


class FastConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding='SAME')`` backed by
    conv3x3_patchT. Identical parameter tree ("kernel" HWIO + "bias") and
    initialization, so checkpoints/serialization are unchanged."""

    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, in_features, self.features),
                            self.param_dtype)
        x = x.astype(self.dtype)
        y = conv3x3_patchT(x, kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y
