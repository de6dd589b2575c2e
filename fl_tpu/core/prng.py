"""PRNG discipline for federated simulation.

Requirements (SURVEY.md §7 "hard parts"): with up to thousands of simulated
clients per round, every client needs independent, reproducible randomness
for (a) its local data shuffle, (b) dropout, and (c) its DP Gaussian noise —
and the whole experiment must be resumable from (round, seed) alone.

Scheme: a single experiment root key; per-round key = fold_in(root, round);
per-client key = fold_in(round_key, client_id); per-purpose key =
fold_in(client_key, purpose_tag). Because ``fold_in`` is a keyed hash, client
streams are independent and any (round, client) key can be reconstructed
without replaying history — which is what makes orbax resume exact.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp


class Stream(enum.IntEnum):
    """Purpose tags folded into per-client keys."""

    SHUFFLE = 0
    DROPOUT = 1
    DP_NOISE = 2
    INIT = 3
    PARTICIPATION = 4
    AUGMENT = 5
    EVAL = 6
    SECURE_AGG = 7
    PERSONALIZE = 8
    ROUNDING = 9
    UPLINK_Q = 10
    DISTRIBUTED_DP = 11
    SERVER = 12  # server-side stochastic steps (e.g. FedDF proxy batches)


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def root_key_from_digest(digest: bytes) -> jax.Array:
    """Root key carrying up to 124 bits of a hash digest.

    ``PRNGKey(int(digest[:4]))`` keeps only 31 bits — two clients collide
    with ~50% probability at ~54k clients (birthday bound) and the space is
    brute-forceable. Folding four 31-bit words keeps the derivation cheap
    while preserving enough of the digest that collisions are negligible.
    """
    if len(digest) < 16:
        raise ValueError("root_key_from_digest needs >= 16 digest bytes")
    words = [int.from_bytes(digest[i:i + 4], "big") & 0x7FFFFFFF
             for i in range(0, 16, 4)]
    key = jax.random.PRNGKey(words[0])
    for w in words[1:]:
        key = jax.random.fold_in(key, w)
    return key


def round_key(root: jax.Array, round_number) -> jax.Array:
    return jax.random.fold_in(root, round_number)


def client_key(rkey: jax.Array, client_id) -> jax.Array:
    return jax.random.fold_in(rkey, client_id)


def stream_key(ckey: jax.Array, stream: Stream) -> jax.Array:
    return jax.random.fold_in(ckey, int(stream))


def client_round_keys(root: jax.Array, round_number, num_clients: int) -> jax.Array:
    """Vectorized (C, 2) key batch for one round — built inside jit, so the
    whole round superstep stays a single XLA program."""
    rkey = round_key(root, round_number)
    ids = jnp.arange(num_clients, dtype=jnp.uint32)
    return jax.vmap(lambda i: jax.random.fold_in(rkey, i))(ids)
