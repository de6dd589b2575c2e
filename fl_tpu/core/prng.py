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
