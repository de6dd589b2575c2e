"""Lossy uplink compression with error feedback for the on-chip FL path.

In deployment, clients compress their round delta before transmitting
(fl_tpu.fl.compression serves that wire path). The on-chip simulation
models the same bandwidth-limited uplink *inside the superstep*: each
client's delta is compressed+decompressed on-device, and the quantization
residual is carried to the next round as **error feedback** (Seide et al.
2014; Karimireddy et al. 2019 "EF signSGD") — the client transmits
``compress(delta + e_t)`` and keeps ``e_{t+1} = delta + e_t − transmitted``,
which provably restores convergence for biased compressors like top-k.

Formulation: the whole population's deltas live as one (C, D) flat matrix
(the same layout the DP kernel and robust aggregators use), so

- ``int8``: per-row block-wise symmetric quantization (block max / 127,
  round-to-nearest), the on-device mirror of the wire codec in
  fl_tpu/ops/quantize.py — 4× uplink reduction;
- ``topk``: per-row keep-k by magnitude via one batched ``lax.top_k`` and a
  scatter — D/k× reduction.

Everything is vectorized over the client axis; under a mesh the matrix is
client-sharded and the ops need no collectives.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

UPLINK_KINDS = ("none", "int8", "topk", "powersgd")
# "powersgd" (low-rank factorization with a warm-started right factor) lives
# in fl_tpu.fl.powersgd — it carries per-client Q state across rounds, so it
# does not fit the stateless make_uplink_fn interface below.

_BLOCK = 2048  # quantization block (matches fl_tpu.ops.quantize.CHUNK)


def int8_roundtrip_matrix(mat: jax.Array) -> jax.Array:
    """(C, D) -> (C, D): per-row blockwise int8 quantize → dequantize."""
    C, D = mat.shape
    pad = (-D) % _BLOCK
    xp = jnp.pad(mat, ((0, 0), (0, pad))) if pad else mat
    nb = xp.shape[1] // _BLOCK
    x3 = xp.reshape(C, nb, _BLOCK).astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(x3), axis=2), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x3 / scales[:, :, None]), -128, 127)
    out = (q * scales[:, :, None]).reshape(C, nb * _BLOCK)
    return out[:, :D] if pad else out


def topk_roundtrip_matrix(mat: jax.Array, k: int) -> jax.Array:
    """(C, D) -> (C, D): keep each row's k largest-|x| entries, zero rest."""
    C, D = mat.shape
    k = max(1, min(k, D))
    _, idx = jax.lax.top_k(jnp.abs(mat), k)            # (C, k)
    vals = jnp.take_along_axis(mat, idx, axis=1)
    out = jnp.zeros_like(mat)
    return jax.vmap(lambda o, i, v: o.at[i].set(v))(out, idx, vals)


def make_uplink_fn(kind: str, topk_keep_ratio: float = 0.01,
                   d_valid: int = None
                   ) -> Callable[[jax.Array], jax.Array]:
    """Compression round-trip (C, D) -> (C, D) for the configured kind.

    ``d_valid``: the real (unpadded) parameter dimension — the top-k budget
    is ``ceil(d_valid·keep_ratio)``; without it the budget would be
    computed against the lane-padded matrix width, keeping slightly more
    coordinates than the configured ratio.
    """
    if kind == "none":
        return lambda mat: mat  # identity (no compression)
    if kind == "int8":
        return int8_roundtrip_matrix
    if kind == "powersgd":
        raise ValueError(
            "powersgd carries per-client Q state and is applied via "
            "fl_tpu.fl.powersgd.apply_powersgd_with_error_feedback, not "
            "through the stateless make_uplink_fn interface")
    if kind == "topk":
        def fn(mat):
            d = d_valid if d_valid is not None else mat.shape[1]
            k = max(1, int(round(d * topk_keep_ratio)))
            return topk_roundtrip_matrix(mat, k)
        return fn
    raise ValueError(f"unknown uplink compression {kind!r}; "
                     f"choose from {UPLINK_KINDS}")


def apply_uplink_with_error_feedback(mat: jax.Array, ef: jax.Array,
                                     mask: jax.Array,
                                     uplink_fn: Callable) -> tuple:
    """One EF step over participant rows.

    transmitted = compress(delta + e_t); e_{t+1} = delta + e_t − transmitted.
    Non-participants transmit nothing and keep their residual unchanged.
    Returns (transmitted (C, D), new_ef (C, D)).
    """
    alive = (mask > 0.0).astype(mat.dtype)[:, None]
    carried = mat + ef
    transmitted = uplink_fn(carried) * alive
    new_ef = jnp.where(alive > 0, carried - transmitted, ef)
    return transmitted, new_ef
