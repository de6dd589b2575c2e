"""Quantization kernels for model-update compression.

Parity target: ``QuantizationCompressor`` (src/shared/compression.py:123-249)
— affine (asymmetric) and symmetric quantization at 1-32 bits. The reference
quantizes per-layer on host with torch ops; here quantization runs
on-device over the flat update vector:

- generic N-bit path: pure jnp (fused by XLA; one pass over HBM)
- int8 path: Pallas kernel with on-core stochastic rounding
  (pltpu.stochastic_round), the TPU-idiomatic way to keep E[q] = x

Dequantization mirrors both paths. Scales/zero-points are per-tensor
(matching the reference's per-layer granularity when driven through
fl_tpu.fl.compression, which quantizes each layer's flat slice).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fl_tpu.ops.dp import on_tpu

CHUNK = 2048


# ---------------------------------------------------------------------------
# generic N-bit affine/symmetric quantization (jnp)
# ---------------------------------------------------------------------------

def quantize_affine(
    x: jax.Array, bits: int = 8, symmetric: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize to ``bits`` levels. Returns (q_int32, scale, zero_point).

    Symmetric: q = round(x/s), s = max|x|/(2^(b-1)−1), zp = 0
    Asymmetric: q = round((x−min)/s), s = (max−min)/(2^b−1), zp = min
    (ref: _quantize_tensor, compression.py:203-229).
    """
    x = x.astype(jnp.float32)
    if symmetric:
        qmax = float(2 ** (bits - 1) - 1)
        scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12) / qmax
        q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax)
        zp = jnp.zeros((), jnp.float32)
    else:
        lo, hi = jnp.min(x), jnp.max(x)
        qmax = float(2**bits - 1)
        scale = jnp.maximum(hi - lo, 1e-12) / qmax
        q = jnp.clip(jnp.round((x - lo) / scale), 0, qmax)
        zp = lo
    return q.astype(jnp.int32), scale, zp


def dequantize_affine(
    q: jax.Array, scale: jax.Array, zero_point: jax.Array, symmetric: bool = False
) -> jax.Array:
    """Inverse of :func:`quantize_affine`
    (ref: _dequantize_tensor, compression.py:230-248)."""
    if symmetric:
        return q.astype(jnp.float32) * scale
    return q.astype(jnp.float32) * scale + zero_point


# ---------------------------------------------------------------------------
# int8 Pallas kernel with stochastic rounding
# ---------------------------------------------------------------------------

def _make_quantize_kernel(stochastic: bool):
    def _quantize_kernel(seed_ref, inv_scale_ref, x_ref, values_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + i)
        # each (8, CHUNK) tile covers 8 quantization blocks -> 8 scales
        inv = jnp.stack(
            [inv_scale_ref[i * 8 + r] for r in range(8)]
        ).reshape(8, 1)
        scaled = x_ref[:] * inv
        if stochastic:
            bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape),
                                 jnp.uint32)
            values_ref[:] = pltpu.stochastic_round(scaled, bits,
                                                   target_dtype=jnp.int8)
        else:
            # interpret mode: stochastic_round has no CPU lowering
            values_ref[:] = jnp.clip(jnp.round(scaled), -128, 127
                                     ).astype(jnp.int8)

    return _quantize_kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_blocks(
    x: jax.Array, seed: jax.Array, *, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Block-quantize a flat (D,) vector to int8 with per-CHUNK scales using
    on-core stochastic rounding. Returns (q_int8 (D,), scales (D/CHUNK,)).

    Block scales bound quantization error by the local dynamic range — a
    strictly better trade than the reference's per-layer min/max for large
    fused layers — and keep the kernel a single pass over HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (d,) = x.shape
    assert d % CHUNK == 0, f"D={d} must be a multiple of {CHUNK}"
    n_blocks = d // CHUNK
    x2 = x.reshape(n_blocks, CHUNK).astype(jnp.float32)
    # per-block scales computed in one fused jnp pass; the kernel gets their
    # reciprocals via scalar prefetch (avoids an awkward SMEM output block)
    scales = jnp.maximum(jnp.max(jnp.abs(x2), axis=1), 1e-12) / 127.0
    inv_scales = 1.0 / scales

    # sublane alignment: pad the block axis to a multiple of 8 and give each
    # program an (8, CHUNK) tile (int8 output still tiles fine: the mosaic
    # constraint is on the *block* shape, 8 × CHUNK)
    n_pad = (-n_blocks) % 8
    if n_pad:
        x2 = jnp.pad(x2, ((0, n_pad), (0, 0)))
        inv_scales_k = jnp.pad(inv_scales, (0, n_pad))
    else:
        inv_scales_k = inv_scales
    n_total = n_blocks + n_pad

    interp = pltpu.InterpretParams() if interpret else False
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed (1,), inv_scales (n_total,)
        grid=(n_total // 8,),
        in_specs=[
            pl.BlockSpec((8, CHUNK), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, CHUNK), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    values = pl.pallas_call(
        _make_quantize_kernel(stochastic=not interpret),
        out_shape=jax.ShapeDtypeStruct((n_total, CHUNK), jnp.int8),
        grid_spec=grid_spec,
        interpret=interp,
    )(jnp.reshape(seed.astype(jnp.int32), (1,)),
      inv_scales_k.astype(jnp.float32), x2)
    return values[:n_blocks].reshape(d), scales


def dequantize_int8_blocks(q: jax.Array, scales: jax.Array) -> jax.Array:
    (d,) = q.shape
    n_blocks = scales.shape[0]
    return (
        q.reshape(n_blocks, d // n_blocks).astype(jnp.float32)
        * scales[:, None]
    ).reshape(d)


def quantize_int8(
    x: jax.Array, seed: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """int8 quantization of a flat vector; Pallas stochastic rounding on
    TPU, jnp round-to-nearest elsewhere. Returns (q, block_scales)."""
    if use_pallas is None:
        use_pallas = on_tpu()
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    if use_pallas or interpret:
        return quantize_int8_blocks(x, seed, interpret=interpret)
    (d,) = x.shape
    n_blocks = max(1, d // CHUNK)
    x2 = x.reshape(n_blocks, -1).astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(x2), axis=1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x2 / scales[:, None]), -128, 127).astype(jnp.int8)
    return q.reshape(d), scales
