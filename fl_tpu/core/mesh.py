"""Device mesh and sharding helpers.

The federated scaling axis is the *client* axis (the reference "scales" by
spawning one gRPC client process/thread per client — SURVEY.md §2.4). Here
that axis is a named mesh dimension: stacked client params / data shards /
RNG keys are sharded over ``clients``; model weights inside each replica stay
replicated (the models are small CNNs — no tensor parallelism is needed, as
in the reference). FedAvg then reduces across the mesh, and XLA lowers that
reduction to ICI collectives.

Works identically on a real TPU slice and on the CPU backend with
``--xla_force_host_platform_device_count=N`` (the test + dryrun story).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CLIENT_AXIS = "clients"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = CLIENT_AXIS,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 1-D mesh over ``n_devices`` devices with the client axis.

    A 1-D mesh is the right shape here: local training is embarrassingly
    parallel over clients, and the only cross-device communication is the
    FedAvg reduction, which on a 1-D mesh rides the ICI ring.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    return Mesh(devices, (axis_name,))


def client_sharding(mesh: Mesh, ndim_tail: int = 0) -> NamedSharding:
    """Sharding that splits the leading (client) axis over the mesh; the
    trailing ``ndim_tail`` axes are replicated. Usable for any-rank leaves via
    PartitionSpec('clients') — trailing dims default to replicated."""
    del ndim_tail  # PartitionSpec implicitly replicates unnamed trailing dims
    return NamedSharding(mesh, P(CLIENT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (global model params, scalars)."""
    return NamedSharding(mesh, P())


def shard_client_tree(tree, mesh: Mesh):
    """Place a stacked-client pytree with the client axis split over the mesh."""
    sh = client_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Round ``n`` up to a multiple of ``m`` (client counts must divide evenly
    over mesh devices; surplus slots are masked out of the aggregation)."""
    return ((n + m - 1) // m) * m
