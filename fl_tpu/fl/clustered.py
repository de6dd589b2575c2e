"""Clustered federated learning (IFCA) — one superstep, k global models.

When the client population is a mixture of distinct data distributions
(e.g. label-permuted cohorts, regional writing styles), a single FedAvg
model fits the mixture's average and serves every cohort poorly. The
Iterative Federated Clustering Algorithm (Ghosh et al. 2020, "An Efficient
Framework for Clustered Federated Learning") maintains k global models;
each round every client (1) evaluates all k models on its own shard,
(2) adopts the best-fitting one, (3) trains it locally, and (4) the server
aggregates deltas *per cluster*. Cluster identities emerge from the
argmin dynamics alone — no labels, no pre-assignment.

TPU-native formulation: the entire round — k-way model evaluation per
client, argmin assignment, gathered local training, and per-cluster
weighted aggregation — is ONE jitted XLA program. The per-cluster
reduction is an einsum of the one-hot assignment matrix against the
stacked client deltas (an MXU matmul), so "grouping" costs one GEMM
instead of host-side bucketing. Under a mesh the client axis is sharded
with ``shard_map`` and the cluster-sum lowers to a single psum, exactly
like the main engine's FedAvg.

The reference has no clustering support (one global model end-to-end,
src/coordinator/grpc_server.py:433-463); this is a capability extension.
DP composition is not wired here — IFCA's assignment release is an extra
channel a DP accountant must cover; use the main engine's client_dp /
dp_ftrl modes when privacy is required.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.core import pytree as pt

# NOTE: fl_tpu.data.federated imports fl_tpu.fl.partition, so importing it
# at module scope from inside the fl package is circular; FederatedArrays
# is referenced by annotation only (duck-typed at runtime).
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from fl_tpu.data.federated import FederatedArrays

from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    cross_entropy_loss,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables


@dataclasses.dataclass(frozen=True)
class ClusteredConfig:
    """IFCA knobs."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    num_clusters: int = 2
    seed: int = 0
    # assignment is argmin of the per-model loss over at most this many
    # leading valid samples of each shard (cost control for huge shards;
    # None = the full shard, the paper's estimator)
    assign_max_samples: Optional[int] = None
    # IFCA's convergence guarantee assumes cluster inits near their
    # population optima (Ghosh et al. 2020 Thm 2-3; with purely random
    # inits the authors run random restarts, §5). warmstart_clients gives
    # the practical initializer: cluster j starts from one round of local
    # training on client warmstart_clients[j]'s shard, seeding each
    # cluster with one population's flavor. None = k random inits.
    warmstart_clients: Optional[tuple] = None


@dataclasses.dataclass
class ClusteredRoundResult:
    round_number: int
    cluster_sizes: List[int]
    train_loss: float
    train_accuracy: float
    assignment_loss: float   # mean over clients of the adopted model's loss
    round_time_s: float


class ClusteredFederatedEngine:
    """Owns k stacked global models and the jitted IFCA superstep."""

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        config: ClusteredConfig,
        mesh=None,
    ):
        if config.num_clusters < 1:
            raise ValueError("num_clusters must be >= 1")
        if config.num_clusters > data.num_clients:
            raise ValueError(
                f"num_clusters={config.num_clusters} exceeds the client "
                f"population ({data.num_clients})")
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = data.num_clients
        if mesh is not None and self.num_clients % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={self.num_clients} must divide evenly over "
                f"the {mesh.devices.size}-device mesh")
        self.data = data.to_device(mesh)
        self.round_number = 0
        self._root_key = jax.random.PRNGKey(config.seed)

        # k independent random inits — IFCA's symmetry breaking (§3.1)
        k = config.num_clusters
        inits = [model.init(jax.random.fold_in(self._root_key, j))
                 for j in range(k)]
        if config.warmstart_clients is not None:
            ws = tuple(config.warmstart_clients)
            if len(ws) != k:
                raise ValueError(
                    f"warmstart_clients must name exactly num_clusters="
                    f"{k} clients, got {len(ws)}")
            if any(not 0 <= c < data.num_clients for c in ws):
                raise ValueError(
                    f"warmstart_clients out of range [0, {data.num_clients})")
            # one local-training round per cluster on its seed client's
            # shard, from the SHARED init (so clusters differ only by the
            # population flavor of their seed client, not by init noise)
            warm_train = jax.jit(make_local_train_fn(
                model, config.training,
                samples_per_client=data.samples_per_client,
                mean=data.mean, std=data.std, homogeneous_epochs=True))
            epochs = jnp.int32(config.training.local_epochs)
            base = inits[0]
            inits = []
            for j, c in enumerate(ws):
                wkey = jax.random.fold_in(
                    jax.random.fold_in(self._root_key, 0x1FCA), j)
                warmed, _ = warm_train(
                    base, jnp.asarray(data.images[c]),
                    jnp.asarray(data.labels[c]),
                    jnp.asarray(data.num_samples[c]), epochs, wkey)
                inits.append(warmed)
        self.cluster_variables: Variables = jax.tree.map(
            lambda *leaves: jnp.stack(leaves), *inits)
        if mesh is not None:
            from fl_tpu.core.mesh import replicate_tree

            self.cluster_variables = replicate_tree(
                self.cluster_variables, mesh)

        self._superstep = self._build_superstep()
        self._eval_fn = make_eval_fn(model)
        self.assignments: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def _build_superstep(self):
        cfg = self.config
        model = self.model
        data = self.data
        k = cfg.num_clusters
        N = data.samples_per_client
        n_assign = (N if cfg.assign_max_samples is None
                    else min(cfg.assign_max_samples, N))
        mean = jnp.asarray(data.mean, jnp.float32)
        std = jnp.asarray(data.std, jnp.float32)
        local_train = make_local_train_fn(
            model, cfg.training, samples_per_client=N,
            mean=mean, std=std, homogeneous_epochs=True)
        epochs = jnp.int32(cfg.training.local_epochs)

        def shard_loss(variables_j, x_norm, labels, msk):
            logits, _ = model.apply(variables_j, x_norm, train=False)
            per = cross_entropy_loss(logits, labels, reduce=False)
            return (per * msk).sum() / jnp.maximum(msk.sum(), 1.0)

        def per_client(stacked_vars, images_u8, labels, n_valid, rng):
            n = jnp.maximum(n_valid.astype(jnp.int32), 1)
            x_head = (images_u8[:n_assign].astype(jnp.float32) / 255.0
                      - mean) / std
            msk = (jnp.arange(n_assign) < n).astype(jnp.float32)
            losses = jax.vmap(
                shard_loss, in_axes=(0, None, None, None)
            )(stacked_vars, x_head, labels[:n_assign], msk)  # (k,)
            assign = jnp.argmin(losses)
            selected = jax.tree.map(
                lambda l: jnp.take(l, assign, axis=0), stacked_vars)
            trained, metrics = local_train(
                selected, images_u8, labels, n_valid, epochs, rng)
            delta = pt.tree_sub(trained, selected)
            return assign, delta, losses[assign], metrics

        def _expand(vec, ndim):
            return vec.reshape((k,) + (1,) * (ndim - 1))

        def body(stacked_vars, images, labels, num_samples, keys, psum_):
            assign, deltas, a_loss, metrics = jax.vmap(
                per_client, in_axes=(None, 0, 0, 0, 0)
            )(stacked_vars, images, labels, num_samples, keys)
            weights = num_samples.astype(jnp.float32)
            # per-cluster weighted mean as one GEMM: onehot^T (w ⊙ Δ);
            # den/num partial sums psum into the global reduction
            onehot = jax.nn.one_hot(assign, k) * weights[:, None]  # (C, k)
            den = psum_(onehot.sum(0))                             # (k,)
            num = jax.tree.map(
                lambda d: psum_(jnp.einsum(
                    "ck,c...->k...", onehot, d.astype(jnp.float32),
                    preferred_element_type=jnp.float32)),
                deltas)
            safe = jnp.maximum(den, 1e-12)
            new_vars = jax.tree.map(
                lambda v, s: v + jnp.where(
                    _expand(den > 0, v.ndim), s / _expand(safe, v.ndim),
                    jnp.zeros_like(v)),
                stacked_vars, num)
            wsum = jnp.maximum(psum_(weights.sum()), 1.0)
            out_metrics = {
                "train_loss":
                    psum_((metrics["loss"] * weights).sum()) / wsum,
                "train_accuracy":
                    psum_((metrics["accuracy"] * weights).sum()) / wsum,
                "assignment_loss":
                    psum_(a_loss.sum())
                    / psum_(jnp.float32(images.shape[0])),
            }
            return new_vars, assign, den, out_metrics

        if self.mesh is None:
            def superstep(stacked_vars, images, labels, num_samples,
                          rkey):
                C = images.shape[0]
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rkey, i)
                )(jnp.arange(C, dtype=jnp.uint32))
                return body(stacked_vars, images, labels, num_samples,
                            keys, lambda x: x)

            return jax.jit(superstep)

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, csh = P(), P(axis)

        def sharded(stacked_vars, images, labels, num_samples, rkey):
            CL = images.shape[0]
            base = jax.lax.axis_index(axis) * CL
            keys = jax.vmap(
                lambda i: jax.random.fold_in(rkey, i)
            )(base.astype(jnp.uint32) + jnp.arange(CL, dtype=jnp.uint32))
            return body(stacked_vars, images, labels, num_samples, keys,
                        lambda x: jax.lax.psum(x, axis))

        return jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(rep, csh, csh, csh, rep),
            out_specs=(rep, csh, rep, rep),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def run_round(self) -> ClusteredRoundResult:
        t0 = time.time()
        rkey = prng.round_key(self._root_key, jnp.int32(self.round_number))
        new_vars, assign, den, metrics = self._superstep(
            self.cluster_variables, self.data.images, self.data.labels,
            self.data.num_samples, rkey)
        self.cluster_variables = new_vars
        self.assignments = np.asarray(assign)
        sizes = np.bincount(self.assignments,
                            minlength=self.config.num_clusters)
        result = ClusteredRoundResult(
            round_number=self.round_number,
            cluster_sizes=sizes.astype(int).tolist(),
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            assignment_loss=float(metrics["assignment_loss"]),
            round_time_s=time.time() - t0,
        )
        self.round_number += 1
        return result

    def run(self, num_rounds: int) -> List[ClusteredRoundResult]:
        return [self.run_round() for _ in range(num_rounds)]

    # ------------------------------------------------------------------
    def cluster_model(self, j: int) -> Variables:
        """Extract cluster j's variables (host-side view)."""
        if not 0 <= j < self.config.num_clusters:
            raise IndexError(f"cluster {j} out of range")
        return jax.tree.map(lambda l: l[j], self.cluster_variables)

    def evaluate_clusters(self, images: np.ndarray, labels: np.ndarray
                          ) -> List[Dict[str, Any]]:
        """Evaluate every cluster model on a test set; returns
        per-cluster loss/accuracy dicts."""
        from fl_tpu.fl.local_training import evaluate_test_set

        out = []
        for j in range(self.config.num_clusters):
            m = evaluate_test_set(self._eval_fn, self.cluster_model(j),
                                  images, labels, self.data.mean,
                                  self.data.std)
            out.append({"cluster": j, **m})
        return out
