"""Explicit collective formulations of FedAvg over the device mesh.

Two equivalent formulations of the same reduction (SURVEY.md §2.4's
"TPU-native equivalent" column):

1. **Compiler-scheduled** (the engine default): stacked client pytrees carry
   a NamedSharding over the ``clients`` mesh axis; ``fedavg_stacked``'s
   weighted sum is a plain jnp reduction and XLA lowers the cross-shard part
   to an ICI all-reduce automatically.

2. **Explicit shard_map** (this module): each device reduces its local
   client shard, then a ``jax.lax.psum`` over the mesh axis combines
   partial weighted sums — the hand-written equivalent of what XLA emits,
   useful for pedagogy, determinism pinning, and as the integration point
   for custom Pallas ring collectives on larger slices.

Both produce identical results; test_parallel.py asserts it.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fl_tpu.core.mesh import CLIENT_AXIS


def fedavg_psum_shard_map(
    mesh: Mesh,
    stacked_weights: Any,
    num_samples: jax.Array,
    mask: Optional[jax.Array] = None,
    axis_name: str = CLIENT_AXIS,
) -> Any:
    """FedAvg as an explicit shard_map + psum over the mesh.

    ``stacked_weights`` leaves: (C, ...) sharded on axis 0; ``num_samples``
    and ``mask``: (C,) sharded on axis 0. Returns the replicated weighted
    mean — numerically identical to fl_tpu.fl.fedavg.fedavg_stacked.
    """
    C = num_samples.shape[0]
    if mask is None:
        mask = jnp.ones((C,), jnp.float32)

    def local_block(w_shard, n_shard, m_shard):
        # local weighted partial sums + local weight mass
        weights = n_shard.astype(jnp.float32) * m_shard.astype(jnp.float32)
        local_mass = weights.sum()
        partial_sums = jax.tree.map(
            lambda x: jnp.tensordot(weights, x.astype(jnp.float32), axes=1),
            w_shard,
        )
        # combine across devices over ICI
        total_mass = jax.lax.psum(local_mass, axis_name)
        totals = jax.tree.map(
            lambda s: jax.lax.psum(s, axis_name), partial_sums
        )
        return jax.tree.map(
            lambda s: s / jnp.maximum(total_mass, 1e-12), totals
        )

    in_specs = (
        jax.tree.map(lambda _: P(axis_name), stacked_weights),
        P(axis_name),
        P(axis_name),
    )
    out_specs = jax.tree.map(lambda _: P(), stacked_weights)
    fn = jax.shard_map(
        local_block, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
    )
    out = fn(stacked_weights, num_samples, mask)
    # cast back to the input dtypes
    return jax.tree.map(lambda o, w: o.astype(w.dtype), out, stacked_weights)


def make_sharded_fedavg(mesh: Mesh, axis_name: str = CLIENT_AXIS):
    """Jitted explicit-collective FedAvg bound to a mesh."""
    return jax.jit(
        partial(fedavg_psum_shard_map, mesh, axis_name=axis_name)
    )
