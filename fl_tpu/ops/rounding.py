"""Unbiased stochastic f32->bf16 rounding for low-precision param storage.

Deterministic round-to-nearest drops any update smaller than half a ULP of
the parameter — at bf16 (8 mantissa bits) that is ~0.2% of the parameter
magnitude, which silently freezes small Adam steps. Stochastic rounding
rounds up with probability equal to the truncated fraction, so the
*expected* stored value equals the f32 input and small updates survive in
expectation (Gupta et al. 2015, "Deep Learning with Limited Numerical
Precision").

Mechanism: bitcast the f32 to u32, add 16 uniform dither bits below the
bf16 mantissa cutoff, truncate to the top 16 bits. Carry propagation from
the addition is exactly the round-up. IEEE sign-magnitude layout makes the
same trick unbiased for negatives (dither rounds the *magnitude* up with
the correct probability). The dither comes from a murmur3-style integer
hash of (element index, seed) — counter-based, ~8 VPU ops per element,
zero extra HBM traffic, and fuses into whatever XLA fusion consumes the
rounded value. Rounding dither needs statistical uniformity, not
cryptographic strength, so a keyed threefry draw (whose per-element cost
would rival the HBM bytes this feature saves) is deliberately avoided.

No reference counterpart (the reference trains f32 torch end-to-end,
src/shared/training.py); this backs the `param_storage_dtype` option of
fl_tpu.fl.local_training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _murmur3_mix(z: jax.Array) -> jax.Array:
    """murmur3 finalizer: a well-dispersed u32->u32 bijection."""
    z = z ^ (z >> 16)
    z = z * jnp.uint32(0x85EBCA6B)
    z = z ^ (z >> 13)
    z = z * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    return z


def stochastic_round_bf16(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Round f32 ``x`` to bf16, up with probability = truncated fraction.

    ``seed`` is a u32 scalar (vary it per call site and per step —
    repeated seeds give correlated, though still unbiased-per-element,
    rounding). Values whose low 16 bits are zero (already representable
    in bf16) round exactly; non-finite values pass through unchanged.
    """
    assert x.dtype == jnp.float32, x.dtype
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    idx = jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape)
    dither = _murmur3_mix(idx + seed.astype(jnp.uint32)) & jnp.uint32(0xFFFF)
    r = (u + dither) >> 16
    out = jax.lax.bitcast_convert_type(r.astype(jnp.uint16), jnp.bfloat16)
    return jnp.where(jnp.isfinite(x), out, x.astype(jnp.bfloat16))


def stochastic_round_tree_bf16(tree, seed: jax.Array):
    """`stochastic_round_bf16` over a pytree, decorrelating leaves by
    folding the leaf index into the seed."""
    leaves, treedef = jax.tree.flatten(tree)
    rounded = [
        stochastic_round_bf16(
            leaf, seed + jnp.uint32((i * 0x9E3779B1) & 0xFFFFFFFF))
        for i, leaf in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, rounded)
