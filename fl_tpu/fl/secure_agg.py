"""Secure aggregation: pairwise additive masking (SecAgg-style).

Bonawitz et al. 2017 ("Practical Secure Aggregation for Privacy-Preserving
Machine Learning"): each pair of clients (i, j) agrees on a random mask
m_ij; client i ships x_i + Σ_{j} ±m_ij, and the ± antisymmetry makes every
pair cancel in the server's SUM — the server learns only Σ x_i, never any
individual update. SecAgg+ (Bell et al. 2020) showed a sparse k-regular
pairing graph suffices; here the graph is a ring with offsets 1..k.

TPU-native formulation: updates live as one (C, D) flat matrix (the same
layout the DP kernel uses), and each ring offset o contributes one (C, D)
noise draw added at row i and subtracted at row (i+o) mod C — a
``jnp.roll``, so the whole masking is k noise generations + k rolls, no
per-pair loops. Weighted FedAvg compatibility: clients pre-scale their
delta by n_i·mask_i before masking (the SecAgg-standard trick), the server
divides the masked sum by Σ n_i·mask_i.

Dropout semantics (simulation-grade): a pair's mask is generated only when
BOTH endpoints participate this round (the alive-mask product), which keeps
cancellation exact under partial participation. The deployment-grade
dropout *recovery* (Shamir-shared seeds reconstructed for clients that die
mid-round, Bonawitz §4) is out of scope — the simulation backend knows
participation before aggregation, exactly like the reference's coordinator
(round timeout → aggregate-with-remaining, round_manager.py:630-648).

Privacy note: masking hides individual updates from an honest-but-curious
aggregator; it composes with (not replaces) the DP modes — DP bounds what
the SUM reveals, SecAgg bounds what the server sees per client.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from fl_tpu.core import prng


def ring_pair_masks(
    key: jax.Array,
    num_clients: int,
    dim: int,
    neighbors: int = 8,
    scale: float = 1.0,
    alive: jax.Array = None,
) -> jax.Array:
    """(C, D) pairwise masks over a ring-``neighbors`` graph, summing to ~0.

    Row i carries +noise for pairs (i, i+o) and -noise for pairs (i-o, i),
    o = 1..neighbors; each pair's noise is drawn once from a key derived
    from the (offset, start-row) pair identity, so both endpoints could
    derive it independently from a shared seed. ``alive`` (C,) zeroes every
    pair with a non-participating endpoint, preserving cancellation under
    partial participation.
    """
    C, D = num_clients, dim
    k = min(neighbors, max(C - 1, 0))
    if alive is None:
        alive = jnp.ones((C,), jnp.float32)
    alive = alive.astype(jnp.float32)
    masks = jnp.zeros((C, D), jnp.float32)
    for o in range(1, k + 1):
        okey = jax.random.fold_in(key, o)
        pair_keys = jax.vmap(lambda i, ok=okey: jax.random.fold_in(ok, i))(
            jnp.arange(C)
        )
        noise = jax.vmap(
            lambda pk: scale * jax.random.normal(pk, (D,), jnp.float32)
        )(pair_keys)
        # pair (i, j=(i+o)%C) is live only when both endpoints participate
        both = alive * jnp.roll(alive, -o)
        noise = noise * both[:, None]
        masks = masks + noise - jnp.roll(noise, o, axis=0)
    return masks


def secure_fedavg_delta(
    global_vars: Any,
    new_stacked: Any,
    num_samples: jax.Array,
    mask: jax.Array,
    round_key: jax.Array,
    neighbors: int = 8,
    scale: float = 1.0,
) -> Any:
    """Sample-weighted FedAvg whose per-client payloads are pairwise-masked.

    Numerically: the server-visible quantity per client is
    ``n_i·m_i·(θ_i − g) + pairmask_i`` — individually indistinguishable
    from noise at adequate ``scale`` — and the summed masks cancel, so the
    result equals ``fedavg_delta`` up to float cancellation (~C·eps·scale).
    """
    from fl_tpu.ops.flatten import stack_flatten, stack_unflatten

    deltas = jax.tree.map(
        lambda c, g: (c - g[None]).astype(jnp.float32),
        new_stacked, global_vars,
    )
    mat, spec = stack_flatten(deltas)
    C, D = mat.shape
    w = num_samples.astype(jnp.float32) * mask.astype(jnp.float32)
    scaled = mat * w[:, None]
    skey = prng.stream_key(round_key, prng.Stream.SECURE_AGG)
    masked = scaled + ring_pair_masks(skey, C, D, neighbors, scale,
                                      alive=mask)
    total = masked.sum(axis=0) / jnp.maximum(w.sum(), 1e-12)
    avg_delta = stack_unflatten(total[None], spec)
    return jax.tree.map(
        lambda g, d: (g + d[0].astype(jnp.float32)).astype(g.dtype),
        global_vars, avg_delta,
    )


def masked_payloads(
    stacked_updates: Any,
    num_samples: jax.Array,
    mask: jax.Array,
    round_key: jax.Array,
    neighbors: int = 8,
    scale: float = 1.0,
) -> Tuple[jax.Array, Any]:
    """The per-client wire payloads of the mechanism (for inspection/tests):
    returns (masked (C, D) matrix, flatten spec)."""
    from fl_tpu.ops.flatten import stack_flatten

    mat, spec = stack_flatten(stacked_updates)
    C, D = mat.shape
    w = num_samples.astype(jnp.float32) * mask.astype(jnp.float32)
    skey = prng.stream_key(round_key, prng.Stream.SECURE_AGG)
    return (mat * w[:, None]
            + ring_pair_masks(skey, C, D, neighbors, scale, alive=mask),
            spec)
