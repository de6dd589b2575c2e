"""Decentralized federated learning (D-PSGD): no server at all.

Lian et al. 2017 ("Can Decentralized Algorithms Outperform Centralized
Ones?") / decentralized FedAvg: every client keeps ITS OWN model; each
round it trains locally, then replaces its parameters with a weighted
average of its neighbors' — gossip over a communication graph encoded as
a doubly-stochastic mixing matrix W:

    θ_i ← Σ_j W_ij · θ_j^{local}

Consensus emerges from the spectral gap of W (no coordinator, no single
point of failure/trust). With the complete graph and uniform weights
(W = 11ᵀ/C) every round collapses to exact FedAvg — tested against the
flat engine.

TPU mapping: all C client models are one stacked (C, D) matrix, so the
entire gossip exchange is ONE dense GEMM W @ Θ on the MXU — the graph
topology is data, not program structure, so ring/torus/expander graphs
all compile to the same kernel. Under a mesh the client axis is sharded;
mixing needs every neighbor's row, so the round's only collective is one
all-gather of the (C, D_pad) parameter matrix followed by the local
W-block GEMM.

The reference is strictly coordinator-centric (src/coordinator/); this is
a capability extension completing the topology family (central,
hierarchical, clustered, asynchronous, decentralized).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import prng
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    evaluate_test_set,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel, Variables

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from fl_tpu.data.federated import FederatedArrays


def ring_mixing_matrix(C: int, self_weight: float = 1.0 / 3.0
                       ) -> np.ndarray:
    """Symmetric ring: each client averages itself and its two ring
    neighbors (doubly stochastic by construction)."""
    if not 0.0 < self_weight < 1.0:
        raise ValueError("self_weight must be in (0, 1)")
    side = (1.0 - self_weight) / 2.0
    W = np.zeros((C, C))
    for i in range(C):
        W[i, i] = self_weight
        W[i, (i - 1) % C] += side
        W[i, (i + 1) % C] += side
    return W


def metropolis_mixing_matrix(adjacency: np.ndarray) -> np.ndarray:
    """Metropolis–Hastings weights for an arbitrary undirected graph:
    W_ij = 1/(1+max(d_i, d_j)) for edges, W_ii = 1 − Σ_j W_ij — doubly
    stochastic for any connected symmetric adjacency (Xiao & Boyd 2004)."""
    A = np.asarray(adjacency, bool)
    if A.shape[0] != A.shape[1]:
        raise ValueError("adjacency must be square")
    if not (A == A.T).all():
        raise ValueError("adjacency must be symmetric (undirected graph)")
    C = A.shape[0]
    A = A & ~np.eye(C, dtype=bool)   # no self-edges in degree counts
    deg = A.sum(1)
    W = np.zeros((C, C))
    for i in range(C):
        for j in np.flatnonzero(A[i]):
            W[i, j] = 1.0 / (1.0 + max(deg[i], deg[j]))
        W[i, i] = 1.0 - W[i].sum()
    return W


def validate_mixing_matrix(W: np.ndarray, num_clients: int) -> np.ndarray:
    W = np.asarray(W, np.float64)
    if W.shape != (num_clients, num_clients):
        raise ValueError(
            f"mixing matrix must be ({num_clients}, {num_clients}), "
            f"got {W.shape}")
    if (W < -1e-9).any():
        raise ValueError("mixing weights must be non-negative")
    if not np.allclose(W.sum(1), 1.0, atol=1e-6):
        raise ValueError("mixing matrix rows must sum to 1 (stochastic)")
    if not np.allclose(W.sum(0), 1.0, atol=1e-6):
        raise ValueError(
            "mixing matrix columns must sum to 1 (double stochasticity "
            "preserves the parameter mean — required for convergence to "
            "a consensus optimum, Lian et al. 2017 Assumption 1)")
    return W


@dataclasses.dataclass(frozen=True)
class DecentralizedConfig:
    """D-PSGD knobs."""

    training: FederatedTrainingConfig = dataclasses.field(
        default_factory=FederatedTrainingConfig)
    # (C, C) doubly-stochastic mixing matrix; None = symmetric ring
    mixing_matrix: Optional[np.ndarray] = None
    seed: int = 0


@dataclasses.dataclass
class DecentralizedRoundResult:
    round_number: int
    train_loss: float
    train_accuracy: float
    consensus_distance: float  # mean L2 distance client-model ↔ mean model
    round_time_s: float


class DecentralizedFederatedEngine:
    """Owns the C per-client models and the jitted train+gossip round."""

    def __init__(
        self,
        model: FLModel,
        data: "FederatedArrays",
        config: DecentralizedConfig,
        mesh=None,
    ):
        C = data.num_clients
        W = (ring_mixing_matrix(C) if config.mixing_matrix is None
             else config.mixing_matrix)
        self._W = jnp.asarray(validate_mixing_matrix(W, C), jnp.float32)
        self.model = model
        self.config = config
        self.mesh = mesh
        self.num_clients = C
        if mesh is not None and C % mesh.devices.size != 0:
            raise ValueError(
                f"num_clients={C} must divide evenly over the "
                f"{mesh.devices.size}-device mesh")
        self.data = data.to_device(mesh)
        self.round_number = 0
        self._root_key = prng.root_key(config.seed)
        init = model.init(prng.stream_key(self._root_key,
                                          prng.Stream.INIT))
        if "batch_stats" in init:
            raise ValueError(
                "decentralized gossip mixes params only; use a stats-free "
                "model (e.g. create_model('cifar10_cnn', norm='group'))")
        # every client starts from the SAME init (standard D-PSGD setup:
        # consensus is exact at round 0)
        self.client_variables: Variables = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (C,) + x.shape).copy(),
            init)
        if mesh is not None:
            from fl_tpu.core.mesh import shard_client_tree

            self.client_variables = shard_client_tree(
                self.client_variables, mesh)
        self._superstep = self._build_superstep()
        self._eval_fn = make_eval_fn(model)
        self.history: List[DecentralizedRoundResult] = []

    # ------------------------------------------------------------------
    def _build_superstep(self):
        cfg = self.config
        data = self.data
        C = self.num_clients
        local_train = make_local_train_fn(
            self.model, cfg.training,
            samples_per_client=data.samples_per_client,
            mean=data.mean, std=data.std, homogeneous_epochs=True)
        epochs = jnp.int32(cfg.training.local_epochs)

        def mix(W_rows, trained):
            # gossip as one GEMM per leaf: θ_i ← Σ_j W_ij θ_j
            return jax.tree.map(
                lambda l: jnp.einsum(
                    "cj,j...->c...", W_rows, l.astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(l.dtype),
                trained)

        def body(client_vars, W_rows, images, labels, num_samples, keys,
                 full_of, psum_):
            trained, metrics = jax.vmap(local_train)(
                client_vars, images, labels, num_samples,
                jnp.broadcast_to(epochs, (images.shape[0],)), keys)
            mixed = mix(W_rows, full_of(trained))
            w = num_samples.astype(jnp.float32)
            wsum = jnp.maximum(psum_(w.sum()), 1.0)
            # consensus distance ON DEVICE (pulling C full models to host
            # for this scalar would cost ~C·D·4 bytes over the relay
            # every round): per-client squared distance to the mean,
            # accumulated across leaves, one scalar out
            sq = jnp.zeros((images.shape[0],), jnp.float32)
            for leaf in jax.tree.leaves(mixed):
                flat = leaf.astype(jnp.float32).reshape(
                    (leaf.shape[0], -1))
                mean = psum_(flat.sum(0)) / float(C)
                sq = sq + jnp.sum(
                    jnp.square(flat - mean[None, :]), axis=1)
            consensus = psum_(jnp.sqrt(sq).sum()) / float(C)
            out = {
                "train_loss": psum_((metrics["loss"] * w).sum()) / wsum,
                "train_accuracy":
                    psum_((metrics["accuracy"] * w).sum()) / wsum,
                "consensus_distance": consensus,
            }
            return mixed, out

        if self.mesh is None:
            def superstep(client_vars, images, labels, num_samples, rkey):
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rkey, i)
                )(jnp.arange(C, dtype=jnp.uint32))
                return body(client_vars, self._W, images, labels,
                            num_samples, keys, lambda t: t, lambda x: x)

            return jax.jit(superstep)

        from jax.sharding import PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep, csh = P(), P(axis)

        def sharded(client_vars, images, labels, num_samples, rkey):
            CL = images.shape[0]
            shard = jax.lax.axis_index(axis)
            base = shard * CL
            keys = jax.vmap(
                lambda i: jax.random.fold_in(rkey, i)
            )(base.astype(jnp.uint32) + jnp.arange(CL, dtype=jnp.uint32))
            # mixing needs every neighbor's model: the round's one
            # collective is an all-gather of the trained client models;
            # each shard then applies its own W row-block
            W_rows = jax.lax.dynamic_slice(
                self._W, (base, 0), (CL, C))

            def full_of(tree):
                return jax.tree.map(
                    lambda x: jax.lax.all_gather(x, axis).reshape(
                        (C,) + x.shape[1:]),
                    tree)

            return body(client_vars, W_rows, images, labels, num_samples,
                        keys, full_of, lambda x: jax.lax.psum(x, axis))

        return jax.jit(jax.shard_map(
            sharded, mesh=self.mesh,
            in_specs=(csh, csh, csh, csh, rep),
            out_specs=(csh, rep),
            check_vma=False,
        ))

    # ------------------------------------------------------------------
    def run_round(self) -> DecentralizedRoundResult:
        t0 = time.time()
        rkey = prng.round_key(self._root_key, jnp.int32(self.round_number))
        self.client_variables, metrics = self._superstep(
            self.client_variables, self.data.images, self.data.labels,
            self.data.num_samples, rkey)
        result = DecentralizedRoundResult(
            round_number=self.round_number,
            train_loss=float(metrics["train_loss"]),
            train_accuracy=float(metrics["train_accuracy"]),
            consensus_distance=float(metrics["consensus_distance"]),
            round_time_s=time.time() - t0,
        )
        self.round_number += 1
        self.history.append(result)
        return result

    def run(self, num_rounds: int) -> List[DecentralizedRoundResult]:
        return [self.run_round() for _ in range(num_rounds)]

    # ------------------------------------------------------------------
    def mean_model(self) -> Variables:
        """The consensus (mean) model — the deployable artifact."""
        return jax.tree.map(
            lambda l: l.astype(jnp.float32).mean(0), self.client_variables)

    def client_model(self, i: int) -> Variables:
        if not 0 <= i < self.num_clients:
            raise IndexError(f"client {i} out of range")
        return jax.tree.map(lambda l: l[i], self.client_variables)

    def evaluate(self, images: np.ndarray, labels: np.ndarray,
                 client: Optional[int] = None) -> Dict[str, float]:
        """Evaluate the mean model (or one client's model) on a test set."""
        variables = (self.mean_model() if client is None
                     else self.client_model(client))
        return evaluate_test_set(self._eval_fn, variables, images, labels,
                                 self.data.mean, self.data.std)
