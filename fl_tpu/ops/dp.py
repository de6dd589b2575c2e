"""Fused DP clip + Gaussian-noise Pallas kernel.

The DP hot path adds i.i.d. Gaussian noise to every element of every
client's update (421K elements × C clients for SimpleCNN). Done naively
(reference: a fresh ``torch.normal`` per layer per client,
src/shared/privacy.py:239-247) this is multiple HBM round trips per layer;
here it is ONE kernel over the (C, D) flat update matrix that fuses:

    scale-by-clip-coefficient → on-core PRNG (Box–Muller) → add noise

so each element is read once and written once — HBM-bandwidth-bound at
exactly 2·4·C·D bytes. Noise is generated on-core by the TPU PRNG
(pltpu.prng_random_bits), seeded per (client, chunk) so client streams are
independent and reproducible from the round key.

The pure-jnp reference implementation (`_clip_noise_jnp`) is the numerical
oracle for tests and the CPU path; both paths share the same clip/σ math,
while noise bits differ by construction (different PRNGs) — DP correctness
depends on the distribution, not the stream.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 2048  # columns per kernel program; multiple of 128 lanes


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def gaussian_factor(epsilon: float, delta: float) -> float:
    """σ/sensitivity of the Gaussian mechanism (ref: privacy.py:209)."""
    return math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _clip_noise_kernel(seed_ref, scale_ref, sigma_ref, x_ref, out_ref):
    """One program handles one (1, BLOCK_ROWS, CHUNK) tile of one client's
    flat vector (viewed as (C, R, CHUNK) for TPU sublane alignment).

    seed/scale/sigma arrive as (C,) scalar-prefetch arrays in SMEM, indexed
    by the client grid coordinate."""
    from jax.experimental.pallas import tpu as pltpu

    c = _program_id(0)
    j = _program_id(1)
    # unique stream per (client, tile): the per-client seed plus tile index
    pltpu.prng_seed(seed_ref[c] + j)

    shape = x_ref.shape  # (1, BLOCK_ROWS, CHUNK)
    # Box–Muller from two independent uint32 draws (bitcast: prng_random_bits
    # yields int32 and an arithmetic >> would smear the sign bit)
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits -> uniform in [2^-25, 1): strictly positive for the log.
    # (shift as uint32, then bitcast to int32 for the float cast — the
    # shifted value is < 2^24 so the sign bit is clear; mosaic has no
    # uint32->f32 cast)
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32).astype(jnp.float32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32).astype(jnp.float32)
    u1 = i1 * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = i2 * (1.0 / (1 << 24))
    two_pi = 2.0 * np.pi
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(two_pi * u2)

    out_ref[:] = x_ref[:] * scale_ref[c] + sigma_ref[c] * z


def _program_id(axis: int):
    from jax.experimental import pallas as pl

    return pl.program_id(axis)


BLOCK_ROWS = 8  # f32 sublane multiple
TILE = BLOCK_ROWS * CHUNK  # elements per kernel program
MAX_LEAF_CHUNK = 65536  # lane-width cap: (1, 8, chunk) f32 block <= 2 MB VMEM


def leaf_chunk(D: int):
    """Zero-copy chunk width for a standalone (C, D) leaf, or None.

    D//BLOCK_ROWS must be a lane multiple (the (C, 8, D/8) view is then a
    free reshape) and small enough for one VMEM block. SimpleCNN's fc1
    kernel (D = 3136·128 = 401408) gives chunk = 50176 — the 822 MB leaf
    is processed with ZERO flatten/pad/unflatten copies."""
    if D % (BLOCK_ROWS * 128) == 0 and D // BLOCK_ROWS <= MAX_LEAF_CHUNK:
        return D // BLOCK_ROWS
    return None


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def _clip_noise_pallas(x, scale, sigma, seeds, *, interpret: bool = False,
                       chunk: int = CHUNK):
    """x: (C, D) f32 with D % (BLOCK_ROWS·chunk) == 0; scale/sigma: (C,)
    f32; seeds: (C,) int32. ``chunk`` is the per-program lane width —
    callers with a leaf whose D/BLOCK_ROWS is a lane multiple pass
    chunk=D//BLOCK_ROWS so the (C, 8, chunk) view is a zero-copy
    reshape (the per-leaf DP epilogue, fl_tpu.fl.privacy)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, D = x.shape
    assert D % (BLOCK_ROWS * chunk) == 0, \
        f"D={D} must be a multiple of {BLOCK_ROWS * chunk}"
    rows = D // chunk
    x3 = x.reshape(C, rows, chunk)
    # the generic pallas interpreter lacks TPU PRNG primitives; use the
    # TPU-semantics interpreter for CPU testing
    interp = pltpu.InterpretParams() if interpret else False
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seeds, scales, sigmas as (C,) SMEM arrays
        grid=(C, rows // BLOCK_ROWS),
        in_specs=[
            pl.BlockSpec((1, BLOCK_ROWS, chunk), lambda c, j, *_: (c, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, chunk),
                               lambda c, j, *_: (c, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _clip_noise_kernel,
        out_shape=jax.ShapeDtypeStruct((C, rows, chunk), jnp.float32),
        grid_spec=grid_spec,
        interpret=interp,
    )(seeds.astype(jnp.int32),
      scale.astype(jnp.float32),
      sigma.astype(jnp.float32),
      x3.astype(jnp.float32))
    return out.reshape(C, D)


# ---------------------------------------------------------------------------
# jnp reference path
# ---------------------------------------------------------------------------

def _clip_noise_jnp(x, scale, sigma, keys):
    noise = jax.vmap(lambda k, row: jax.random.normal(k, row.shape))(keys, x)
    return x * scale[:, None] + sigma[:, None] * noise


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def clip_noise_matrix(
    x: jax.Array,
    keys: jax.Array,
    epsilon: float,
    delta: float,
    max_norm: float,
    d_valid: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference-mode DP over a (C, D) flat update matrix.

    Per client: clip the row's L2 norm to ``max_norm``, set
    σ = min(‖row‖, max_norm)·√(2·ln(1.25/δ))/ε (the reference's
    sensitivity-=-clipped-norm rule, privacy.py:296-301), add N(0, σ²) to
    every element. ``d_valid`` restricts the norm to the unpadded prefix.

    Returns (noisy_matrix, sensitivity (C,), sigma (C,)).
    """
    C, D = x.shape
    x = x.astype(jnp.float32)
    if d_valid is not None and d_valid != D:
        col = jnp.arange(D)[None, :] < d_valid
        sq = jnp.sum(jnp.square(x) * col, axis=1)
    else:
        sq = jnp.sum(jnp.square(x), axis=1)
    norms = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    sens = jnp.minimum(norms, max_norm)
    sigma = sens * gaussian_factor(epsilon, delta)

    if use_pallas is None:
        use_pallas = on_tpu()
    if use_pallas:
        data = (jax.random.key_data(keys)
                if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key)
                else keys)
        data = data.astype(jnp.uint32)
        seeds = (data[:, 0] ^ data[:, -1]).astype(jnp.int32)
        pad = (-D) % TILE
        xp = jnp.pad(x, ((0, 0), (0, pad))) if pad else x
        noisy = _clip_noise_pallas(xp, scale, sigma, seeds,
                                   interpret=interpret)
        noisy = noisy[:, :D] if pad else noisy
    else:
        noisy = _clip_noise_jnp(x, scale, sigma, keys)
    return noisy, sens, sigma
