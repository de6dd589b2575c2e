"""FedAvg aggregation — on-device weighted reduction + host API facade.

Parity target: ``FedAvgAggregator`` / ``AdaptiveFedAvg``
(src/aggregation/fedavg.py). The reference's hot loop is a per-layer host
loop accumulating ``Σ wₖ·θₖ`` one torch tensor at a time (fedavg.py:267-289);
here the same math is :func:`fedavg_stacked` — a single fused XLA reduction
over the stacked client axis that runs where the client replicas already
live (HBM), and, when the client axis is sharded over a mesh, lowers to an
ICI all-reduce. The host-level :class:`FedAvgAggregator` keeps the
reference's full API surface (validation/filtering, max-client capping by
sample count, aggregation history, convergence metric) for the services
layer, but delegates the arithmetic to the device path.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.core import pytree as pt
from fl_tpu.core.types import GlobalModel, ModelUpdate
from fl_tpu.utils.validation import ModelUpdateValidator, validate_model_compatibility

logger = logging.getLogger(__name__)


class FedAvgError(Exception):
    """Aggregation failure (ref: FedAvgError, src/aggregation/fedavg.py:20)."""


# ---------------------------------------------------------------------------
# Device path
# ---------------------------------------------------------------------------

def normalized_client_weights(
    num_samples: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """wₖ = maskₖ·nₖ / Σ maskⱼ·nⱼ (ref: _calculate_sample_weights,
    src/aggregation/fedavg.py:247-256; the mask adds partial participation /
    straggler dropout, SURVEY.md §5.3). Falls back to uniform over the mask
    when all counts are zero."""
    n = num_samples.astype(jnp.float32)
    m = jnp.ones_like(n) if mask is None else mask.astype(jnp.float32)
    weighted = n * m
    total = weighted.sum()
    uniform = m / jnp.maximum(m.sum(), 1.0)
    return jnp.where(total > 0, weighted / jnp.maximum(total, 1e-12), uniform)


def fedavg_stacked(
    stacked_weights: Any,
    num_samples: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Any:
    """Sample-weighted average over the leading client axis of a stacked
    pytree. This is the entire FedAvg compute (ref fedavg.py:267-289) as one
    fused reduction."""
    w = normalized_client_weights(num_samples, mask)
    return pt.stacked_weighted_mean(stacked_weights, w)


def fedavg_delta(
    global_tree: Any,
    stacked_client_trees: Any,
    num_samples: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Any:
    """Aggregate as global + Σ wₖ·(θₖ − θ_g). Algebraically identical to
    :func:`fedavg_stacked` when Σw = 1, but with a mask it keeps the global
    model for non-participants' share instead of dragging toward zero."""
    deltas = jax.tree.map(
        lambda c, g: c - g[None], stacked_client_trees, global_tree
    )
    avg_delta = fedavg_stacked(deltas, num_samples, mask)
    return pt.tree_add(global_tree, avg_delta)


def fednova_effective_steps(tau: jax.Array, momentum: float) -> jax.Array:
    """FedNova per-client effective step count a_i (Wang et al. 2020,
    Table 1, local SGD with heavy-ball momentum ρ):

        a_i = [τ_i − ρ(1−ρ^{τ_i})/(1−ρ)] / (1−ρ),    a_i = τ_i at ρ=0,

    the ℓ1 norm of the trajectory's accumulated update coefficients —
    dividing a client's delta by a_i normalizes away how *much* local work
    it did, so heterogeneous epoch budgets stop biasing the aggregate
    toward heavy-working clients (objective inconsistency, §3)."""
    tau = tau.astype(jnp.float32)
    if momentum <= 0.0:
        return tau
    rho = jnp.float32(momentum)
    return (tau - rho * (1.0 - rho ** tau) / (1.0 - rho)) / (1.0 - rho)


def convergence_score(old_tree: Any, new_tree: Any) -> jax.Array:
    """Σℓ‖Δℓ‖ / Σℓ‖θℓ‖ clamped to [0, 1] (ref:
    calculate_convergence_metrics, src/aggregation/fedavg.py:144-190 — note
    the reference sums per-layer norms, not squared norms; matched here)."""
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: jnp.linalg.norm((b - a).ravel()), old_tree, new_tree)
    )
    norms = jax.tree.leaves(
        jax.tree.map(lambda b: jnp.linalg.norm(b.ravel()), new_tree)
    )
    total_diff = jnp.sum(jnp.stack(diffs))
    total_norm = jnp.sum(jnp.stack(norms))
    score = jnp.where(total_norm > 0, total_diff / total_norm, 0.0)
    return jnp.clip(score, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Host facade (services layer / proto interop)
# ---------------------------------------------------------------------------

class FedAvgAggregator:
    """Host-level aggregator with the reference's API surface
    (src/aggregation/fedavg.py:25-357)."""

    def __init__(
        self,
        min_clients: int = 2,
        max_clients: Optional[int] = None,
        validate_updates: bool = True,
        validator: Optional[ModelUpdateValidator] = None,
    ):
        self.min_clients = min_clients
        self.max_clients = max_clients
        self.validate_updates = validate_updates
        self.validator = (validator or ModelUpdateValidator()
                          if validate_updates else None)
        self.aggregation_history: List[Dict[str, Any]] = []

    # -- public API ---------------------------------------------------------
    def aggregate_updates(
        self,
        updates: List[ModelUpdate],
        weights: Optional[List[float]] = None,
    ) -> GlobalModel:
        t0 = time.perf_counter()
        if not updates:
            raise FedAvgError("No model updates provided")
        if weights is not None:
            if len(weights) != len(updates):
                raise FedAvgError("Number of weights must match number of updates")
            if any(w < 0 for w in weights):
                raise FedAvgError("All weights must be non-negative")
            if sum(weights) == 0:
                raise FedAvgError("Sum of weights cannot be zero")

        valid = self._filter_updates(updates)
        if len(valid) < self.min_clients:
            raise FedAvgError(
                f"Insufficient valid updates: {len(valid)} < {self.min_clients}"
            )
        if self.max_clients and len(valid) > self.max_clients:
            valid = sorted(valid, key=lambda u: u.num_samples, reverse=True)
            valid = valid[: self.max_clients]

        if weights is None:
            counts = jnp.asarray([u.num_samples for u in valid], jnp.float32)
        else:
            counts = jnp.asarray(weights[: len(valid)], jnp.float32)

        # stack the flat weight dicts into a client-leading pytree and run
        # the device reduction
        keys = list(valid[0].model_weights.keys())
        stacked = {
            k: jnp.stack([jnp.asarray(u.model_weights[k]) for u in valid])
            for k in keys
        }
        averaged = fedavg_stacked(stacked, counts)

        w_np = np.asarray(normalized_client_weights(counts))
        total_samples = int(sum(u.num_samples for u in valid))
        avg_loss = float(
            sum(u.training_loss * w for u, w in zip(valid, w_np))
        )
        # sample-weighted mean of client-reported train accuracy, so the
        # deployment coordinator's target-accuracy exit criterion has a live
        # signal (the reference reads the same client-reported accuracies via
        # its MetricsCollector, federated_simulation.py:407-428)
        acc_metrics = {}
        reported = [(u.training_metrics.accuracy, w)
                    for u, w in zip(valid, w_np)
                    if u.training_metrics is not None]
        if reported:
            wsum = sum(w for _, w in reported)
            if wsum > 0:
                acc_metrics["train_accuracy"] = float(
                    sum(a * w for a, w in reported) / wsum
                )
        model = GlobalModel(
            round_number=valid[0].round_number,
            model_weights=averaged,
            accuracy_metrics=acc_metrics,
            participating_clients=[u.client_id for u in valid],
            convergence_score=0.0,
        )
        self._record_stats(valid, w_np, total_samples, avg_loss,
                           time.perf_counter() - t0)
        return model

    def validate_update(self, update: ModelUpdate) -> bool:
        if not self.validate_updates or self.validator is None:
            return True
        return self.validator.validate_model_update(update)

    def calculate_convergence_metrics(
        self, old_model: Optional[GlobalModel], new_model: Optional[GlobalModel]
    ) -> float:
        if not old_model or not new_model:
            return 1.0
        common = [k for k in new_model.model_weights if k in old_model.model_weights]
        old = {k: jnp.asarray(old_model.model_weights[k]) for k in common}
        new = {k: jnp.asarray(new_model.model_weights[k]) for k in common}
        return float(convergence_score(old, new))

    def get_aggregation_stats(self) -> Dict[str, Any]:
        if not self.aggregation_history:
            return {"message": "No aggregation history available"}
        recent = self.aggregation_history[-10:]
        participation: Dict[str, int] = {}
        for s in self.aggregation_history:
            for cid in s["client_weights"]:
                participation[cid] = participation.get(cid, 0) + 1
        total_rounds = len(self.aggregation_history)
        return {
            "total_aggregations": total_rounds,
            "recent_aggregations": len(recent),
            "avg_clients_per_round": float(np.mean([s["num_clients"] for s in recent])),
            "avg_samples_per_round": float(np.mean([s["total_samples"] for s in recent])),
            "avg_aggregation_time": float(np.mean([s["aggregation_time"] for s in recent])),
            "avg_training_loss": float(np.mean([s["avg_training_loss"] for s in recent])),
            "client_participation": {
                "unique_clients": len(participation),
                "avg_participation_rate": float(
                    np.mean(list(participation.values())) / total_rounds
                ) if participation else 0.0,
                "most_active_clients": sorted(
                    participation.items(), key=lambda kv: kv[1], reverse=True
                )[:5],
            },
        }

    # -- internals ------------------------------------------------------------
    def _filter_updates(self, updates: List[ModelUpdate]) -> List[ModelUpdate]:
        """Validation filter (ref: _filter_and_validate_updates,
        fedavg.py:209-245 — without reproducing its pop-while-iterating bug:
        incompatible updates are excluded via a clean comprehension)."""
        valid: List[ModelUpdate] = []
        for u in updates:
            if u.num_samples <= 0:
                logger.warning("Skipping %s: invalid sample count", u.client_id)
                continue
            if u.training_loss < 0:
                logger.warning("Skipping %s: invalid training loss", u.client_id)
                continue
            if self.validate_updates and not self.validate_update(u):
                logger.warning("Skipping %s: validation failed", u.client_id)
                continue
            valid.append(u)
        if len(valid) > 1:
            ref = valid[0].model_weights
            kept = [valid[0]]
            for u in valid[1:]:
                try:
                    validate_model_compatibility(ref, u.model_weights)
                    kept.append(u)
                except Exception as e:
                    logger.warning("Removing incompatible update from %s: %s",
                                   u.client_id, e)
            valid = kept
        return valid

    def _record_stats(self, updates, weights, total_samples, avg_loss, dt):
        self.aggregation_history.append({
            "timestamp": time.time(),
            "num_clients": len(updates),
            "total_samples": total_samples,
            "avg_training_loss": avg_loss,
            "aggregation_time": dt,
            "client_weights": {u.client_id: float(w)
                               for u, w in zip(updates, weights)},
            "client_samples": {u.client_id: u.num_samples for u in updates},
        })
        if len(self.aggregation_history) > 100:
            self.aggregation_history = self.aggregation_history[-100:]


class AdaptiveFedAvg(FedAvgAggregator):
    """Performance-aware weighting: blends sample weights with an
    inverse-loss performance score (ref: AdaptiveFedAvg,
    src/aggregation/fedavg.py:360-467)."""

    def __init__(
        self,
        min_clients: int = 2,
        max_clients: Optional[int] = None,
        validate_updates: bool = True,
        performance_weight: float = 0.1,
    ):
        super().__init__(min_clients, max_clients, validate_updates)
        self.performance_weight = performance_weight
        self.client_performance_history: Dict[str, Dict[str, Any]] = {}

    def aggregate_updates(self, updates, weights=None):
        self._update_performance_history(updates)
        if weights is None:
            weights = self._adaptive_weights(updates)
        return super().aggregate_updates(updates, weights)

    def _update_performance_history(self, updates: List[ModelUpdate]) -> None:
        for u in updates:
            h = self.client_performance_history.setdefault(
                u.client_id,
                {"losses": [], "sample_counts": [], "participation_count": 0},
            )
            h["losses"] = (h["losses"] + [u.training_loss])[-10:]
            h["sample_counts"] = (h["sample_counts"] + [u.num_samples])[-10:]
            h["participation_count"] += 1

    def _adaptive_weights(self, updates: List[ModelUpdate]) -> List[float]:
        total = sum(u.num_samples for u in updates)
        sample_w = [
            (u.num_samples / total) if total else 1.0 / len(updates)
            for u in updates
        ]
        if self.performance_weight == 0:
            return sample_w
        all_losses = [
            float(np.mean(h["losses"]))
            for h in self.client_performance_history.values() if h["losses"]
        ]
        max_loss = max(all_losses) if all_losses else 0.0
        adj = []
        for u in updates:
            h = self.client_performance_history.get(u.client_id)
            if h and h["losses"] and max_loss > 0:
                adj.append(1.0 - float(np.mean(h["losses"])) / max_loss)
            else:
                adj.append(1.0)
        blended = [
            (1 - self.performance_weight) * sw + self.performance_weight * a
            for sw, a in zip(sample_w, adj)
        ]
        s = sum(blended)
        return [b / s for b in blended] if s else sample_w


def create_fedavg_aggregator(aggregator_type: str = "standard",
                             **kwargs) -> FedAvgAggregator:
    """Factory (ref: create_fedavg_aggregator, fedavg.py:470-484)."""
    if aggregator_type == "adaptive":
        return AdaptiveFedAvg(**kwargs)
    return FedAvgAggregator(**kwargs)


def benchmark_aggregation_performance(
    num_clients_list=(5, 10, 25, 50), model_size: int = 1_000_000
) -> Dict[str, Any]:
    """Throughput benchmark over dummy updates (ref: fedavg.py:487-548),
    timing the jitted device reduction."""
    results: Dict[str, Any] = {}
    rng = np.random.default_rng(0)
    for n in num_clients_list:
        layer = model_size // 4
        stacked = {
            f"layer{i}": jnp.asarray(rng.normal(size=(n, layer)), jnp.float32)
            for i in range(4)
        }
        counts = jnp.asarray(rng.integers(100, 1000, size=n), jnp.float32)
        fn = jax.jit(fedavg_stacked)
        out = fn(stacked, counts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(stacked, counts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        results[f"{n}_clients"] = {
            "aggregation_time": dt,
            "throughput": n / dt,
            "memory_usage": int(model_size * 4),
        }
    return results
