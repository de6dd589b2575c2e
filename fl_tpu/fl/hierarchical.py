"""Hierarchical federated learning (client → edge → cloud, HierFAVG).

Real deployments often aggregate in two tiers: clients report to a nearby
*edge* server every round (cheap, low-latency), and edges synchronize to
the *cloud* only every τ rounds (expensive WAN hop) — HierFAVG (Liu et
al. 2020, "Client-Edge-Cloud Hierarchical Federated Learning"). Between
cloud syncs each edge's model evolves independently on its own client
group, so the topology trades WAN traffic for bounded edge divergence.

TPU-native formulation: the E edge models live as ONE stacked pytree;
each round is one jitted superstep — every client trains from its edge's
model (a `jnp.take` gather over the fixed assignment), and the per-edge
sample-weighted aggregation is a one-hot einsum (one GEMM; a single psum
under a mesh — the same reduction shape as fl_tpu.fl.clustered, with the
argmin assignment replaced by a fixed topology). The cloud sync is a
sample-weighted mean over the edge axis.

Exactness anchors (tested): with one edge, or with cloud sync every
round, HierFAVG is algebraically plain FedAvg — within-edge weighting
composed with edge-total weighting equals global sample weighting — and
this implementation reproduces the flat engine bit-near-exactly in both
limits (it shares the per-(round, client) PRNG key schedule).

The reference has a single-tier coordinator only
(src/coordinator/grpc_server.py); this is a capability extension.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from fl_tpu.data.federated import FederatedArrays


@dataclasses.dataclass(frozen=True)
class HierarchicalConfig:
    """HierFAVG knobs."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    # client -> edge id, length num_clients. None = contiguous split
    # over num_edges groups.
    edge_assignment: Optional[Sequence[int]] = None
    num_edges: int = 2
    # τ: edge-aggregation rounds between cloud syncs (1 = sync every
    # round, the flat-FedAvg limit)
    global_sync_every: int = 2
    seed: int = 0


@dataclasses.dataclass
class HierarchicalRoundResult:
    round_number: int
    train_loss: float
    train_accuracy: float
    cloud_synced: bool
    edge_divergence: float   # mean L2 distance edge-model ↔ cloud model
    round_time_s: float


class HierarchicalFederatedEngine:
    """Owns the stacked edge models, the cloud master, and the jitted
    edge-round superstep."""

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        config: HierarchicalConfig,
        mesh=None,
    ):
        E, C = config.num_edges, data.num_clients
        if E < 1:
            raise ValueError("num_edges must be >= 1")
        if E > C:
            raise ValueError(f"num_edges={E} exceeds the client "
                             f"population ({C})")
        if config.global_sync_every < 1:
            raise ValueError("global_sync_every must be >= 1")
        if config.edge_assignment is None:
            # balanced contiguous blocks (sizes differ by ≤1) — naive
            # repeat(ceil(C/E))[:C] can truncate the LAST edges empty
            # (e.g. C=4, E=3 → [0,0,1,1]), the exact state the explicit
            # path rejects below
            assignment = np.sort(np.arange(C) % E)
        else:
            assignment = np.asarray(list(config.edge_assignment), np.int32)
            if assignment.shape != (C,):
                raise ValueError(
                    f"edge_assignment must have length {C}, got "
                    f"{assignment.shape}")
            if assignment.min() < 0 or assignment.max() >= E:
                raise ValueError(
                    f"edge ids must be in [0, {E}); got range "
                    f"[{assignment.min()}, {assignment.max()}]")
            if len(np.unique(assignment)) < E:
                raise ValueError(
                    "every edge needs at least one client (empty edges "
                    "would freeze their model; drop them instead)")
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = C
        self.assignment = assignment.astype(np.int32)
        if mesh is not None and C % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={C} must divide evenly over the "
                f"{mesh.devices.size}-device mesh")
        self.data = data.to_device(mesh)
        self.round_number = 0
        self._root_key = prng.root_key(config.seed)
        self.cloud_variables: Variables = model.init(
            prng.stream_key(self._root_key, prng.Stream.INIT))
        # all edges start at the cloud model
        self.edge_variables: Variables = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (E,) + x.shape).copy(),
            self.cloud_variables)
        # per-edge sample totals (cloud-sync weights)
        w = np.zeros(E, np.float64)
        np.add.at(w, self.assignment, np.asarray(data.num_samples,
                                                 np.float64))
        self._edge_weights = jnp.asarray(w / max(w.sum(), 1.0),
                                         jnp.float32)
        if mesh is not None:
            from fl_tpu.core.mesh import client_sharding, replicate_tree

            self.edge_variables = replicate_tree(self.edge_variables,
                                                 mesh)
            self._assignment_dev = jax.device_put(
                jnp.asarray(self.assignment), client_sharding(mesh))
        else:
            self._assignment_dev = jnp.asarray(self.assignment)
        self._superstep = self._build_superstep()
        self._cloud_sync = jax.jit(self._cloud_sync_fn)
        self._eval_fn = make_eval_fn(model)
        self.history: List[HierarchicalRoundResult] = []

    # ------------------------------------------------------------------
    def _cloud_sync_fn(self, edge_vars):
        """Sample-weighted mean over the edge axis → new cloud model,
        rebroadcast to every edge."""
        w = self._edge_weights
        cloud = jax.tree.map(
            lambda l: jnp.tensordot(
                w, l.astype(jnp.float32), axes=1).astype(l.dtype),
            edge_vars)
        edges = jax.tree.map(
            lambda c, l: jnp.broadcast_to(
                c[None], l.shape).astype(l.dtype),
            cloud, edge_vars)
        return cloud, edges

    def _build_superstep(self):
        cfg = self.config
        data = self.data
        E = cfg.num_edges
        local_train = make_local_train_fn(
            self.model, cfg.training,
            samples_per_client=data.samples_per_client,
            mean=data.mean, std=data.std, homogeneous_epochs=True)
        epochs = jnp.int32(cfg.training.local_epochs)

        def per_client(edge_vars, edge_id, images_u8, labels, n_valid,
                       key):
            start = jax.tree.map(
                lambda l: jnp.take(l, edge_id, axis=0), edge_vars)
            trained, metrics = local_train(
                start, images_u8, labels, n_valid, epochs, key)
            delta = jax.tree.map(lambda a, b: a - b, trained, start)
            return delta, metrics

        def body(edge_vars, assignment, images, labels, num_samples,
                 keys, psum_):
            deltas, metrics = jax.vmap(
                per_client, in_axes=(None, 0, 0, 0, 0, 0)
            )(edge_vars, assignment, images, labels, num_samples, keys)
            # within-edge sample weighting: onehot column j sums to the
            # edge's sample total after psum
            w = num_samples.astype(jnp.float32)
            onehot = jax.nn.one_hot(assignment, E) * w[:, None]  # (C, E)
            den = psum_(onehot.sum(0))                           # (E,)
            safe = jnp.maximum(den, 1e-12)
            new_edges = jax.tree.map(
                lambda v, d: v + (
                    psum_(jnp.einsum(
                        "ce,c...->e...", onehot, d.astype(jnp.float32),
                        preferred_element_type=jnp.float32))
                    / safe.reshape((E,) + (1,) * (v.ndim - 1))
                ).astype(v.dtype),
                edge_vars, deltas)
            wsum = jnp.maximum(psum_(w.sum()), 1.0)
            out = {
                "train_loss": psum_((metrics["loss"] * w).sum()) / wsum,
                "train_accuracy":
                    psum_((metrics["accuracy"] * w).sum()) / wsum,
            }
            return new_edges, out

        if self.mesh is None:
            def superstep(edge_vars, assignment, images, labels,
                          num_samples, rkey):
                C = images.shape[0]
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rkey, i)
                )(jnp.arange(C, dtype=jnp.uint32))
                return body(edge_vars, assignment, images, labels,
                            num_samples, keys, lambda x: x)

            return jax.jit(superstep)

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, csh = P(), P(axis)

        def sharded(edge_vars, assignment, images, labels, num_samples,
                    rkey):
            CL = images.shape[0]
            base = jax.lax.axis_index(axis) * CL
            keys = jax.vmap(
                lambda i: jax.random.fold_in(rkey, i)
            )(base.astype(jnp.uint32) + jnp.arange(CL, dtype=jnp.uint32))
            return body(edge_vars, assignment, images, labels,
                        num_samples, keys,
                        lambda x: jax.lax.psum(x, axis))

        return jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(rep, csh, csh, csh, csh, rep),
            out_specs=(rep, rep),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def run_round(self) -> HierarchicalRoundResult:
        t0 = time.time()
        rkey = prng.round_key(self._root_key, jnp.int32(self.round_number))
        self.edge_variables, metrics = self._superstep(
            self.edge_variables, self._assignment_dev, self.data.images,
            self.data.labels, self.data.num_samples, rkey)
        synced = (self.round_number + 1) % self.config.global_sync_every == 0
        if synced:
            self.cloud_variables, self.edge_variables = self._cloud_sync(
                self.edge_variables)
        # edge divergence vs the cloud master (0 right after a sync)
        div = 0.0
        for e_leaf, c_leaf in zip(jax.tree.leaves(self.edge_variables),
                                  jax.tree.leaves(self.cloud_variables)):
            d = np.asarray(e_leaf, np.float64) - np.asarray(
                c_leaf, np.float64)[None]
            div += float(np.sum(d * d))
        div = float(np.sqrt(div / self.config.num_edges))
        result = HierarchicalRoundResult(
            round_number=self.round_number,
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            cloud_synced=bool(synced),
            edge_divergence=div,
            round_time_s=time.time() - t0,
        )
        self.round_number += 1
        self.history.append(result)
        return result

    def run(self, num_rounds: int) -> List[HierarchicalRoundResult]:
        return [self.run_round() for _ in range(num_rounds)]

    # ------------------------------------------------------------------
    def evaluate(self, images: np.ndarray, labels: np.ndarray,
                 edge: Optional[int] = None) -> Dict[str, float]:
        """Evaluate the cloud model (or one edge's model) on a test set."""
        if edge is not None and not 0 <= edge < self.config.num_edges:
            # jax gather would clamp an out-of-range index and silently
            # return the last edge's metrics
            raise IndexError(
                f"edge {edge} out of range [0, {self.config.num_edges})")
        variables = (self.cloud_variables if edge is None
                     else jax.tree.map(lambda l: l[edge],
                                       self.edge_variables))
        from fl_tpu.fl.local_training import evaluate_test_set

        return evaluate_test_set(self._eval_fn, variables, images, labels,
                                 self.data.mean, self.data.std)
