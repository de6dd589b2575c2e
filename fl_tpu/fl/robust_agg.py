"""Byzantine-robust aggregation: coordinate trimmed mean, median, Krum.

FedAvg's weighted mean has breakdown point zero — one malicious client with
an enormous update (or a forged sample count) steers the global model
arbitrarily. These aggregators bound that influence:

- **coordinate-wise trimmed mean** (Yin et al. 2018): per coordinate, drop
  the k largest and k smallest client values, average the rest;
- **coordinate-wise median**: the k = ⌊(m-1)/2⌋ extreme of trimming;
- **(multi-)Krum** (Blanchard et al. 2017): score each update by the sum of
  its squared distances to its n−f−2 nearest peers, average the m lowest-
  scoring updates — tolerates f colluding Byzantine clients.

TPU-native formulation: updates live as the (C, D) flat matrix. Trim and
median are one `jnp.sort` along the client axis with a position mask (the
participation mask maps non-participants to +inf so they sort past every
real row and take zero weight — no gathers, no dynamic shapes). Krum's
pairwise distances are one Gram GEMM (‖a−b‖² = ‖a‖²+‖b‖²−2ab^T).

Robust aggregators ignore sample-count weights by design (the counts are
attacker-controlled inputs); they combine participant deltas unweighted.
The reference has no robust aggregation (its FedAvg trusts every validated
update — src/aggregation/fedavg.py:247-288); capability extension.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

ROBUST_AGGREGATORS = ("fedavg", "trimmed_mean", "median", "krum")

_BIG = jnp.float32(3.0e38)  # sorts past any real update coordinate


def _masked_sorted(mat: jax.Array, mask: jax.Array) -> jax.Array:
    """Sort each column over the client axis with non-participants last."""
    gone = (mask <= 0.0)[:, None]
    return jnp.sort(jnp.where(gone, _BIG, mat), axis=0)


def trimmed_mean_matrix(mat: jax.Array, mask: jax.Array,
                        trim_k: int) -> jax.Array:
    """(C, D) -> (D,) coordinate-wise trimmed mean over participants.

    Drops the ``trim_k`` smallest and largest participant values per
    coordinate. Requires m − 2·trim_k ≥ 1 (checked by the engine config).
    """
    C = mat.shape[0]
    m = jnp.sum(mask > 0.0).astype(jnp.int32)
    s = _masked_sorted(mat, mask)  # participants occupy rows [0, m)
    idx = jnp.arange(C)[:, None]
    keep = (idx >= trim_k) & (idx < m - trim_k)
    kept = jnp.sum(jnp.where(keep, s, 0.0), axis=0)
    denom = jnp.maximum(m - 2 * trim_k, 1).astype(mat.dtype)
    return kept / denom


def median_matrix(mat: jax.Array, mask: jax.Array) -> jax.Array:
    """(C, D) -> (D,) coordinate-wise median over participants."""
    m = jnp.sum(mask > 0.0).astype(jnp.int32)
    s = _masked_sorted(mat, mask)
    lo = jnp.maximum((m - 1) // 2, 0)
    hi = jnp.maximum(m // 2, 0)
    row_lo = jnp.take(s, lo, axis=0)
    row_hi = jnp.take(s, hi, axis=0)
    return 0.5 * (row_lo + row_hi)


def krum_matrix(mat: jax.Array, mask: jax.Array, f: int,
                m_select: int = 1) -> jax.Array:
    """(C, D) -> (D,): multi-Krum over participants.

    Each participant i gets score = Σ of its n−f−2 smallest squared
    distances to other participants; the ``m_select`` lowest-scoring
    updates are averaged (m_select=1 is classic Krum).
    """
    C = mat.shape[0]
    alive = (mask > 0.0)
    n = jnp.sum(alive).astype(jnp.int32)
    sq = jnp.sum(mat * mat, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (mat @ mat.T)
    d2 = jnp.maximum(d2, 0.0)
    # distances touching a non-participant (or self) never count
    invalid = (~alive)[:, None] | (~alive)[None, :] | jnp.eye(C, dtype=bool)
    d2 = jnp.where(invalid, _BIG, d2)
    d2_sorted = jnp.sort(d2, axis=1)
    # sum the n - f - 2 nearest neighbors of each row
    k_near = jnp.maximum(n - f - 2, 1)
    take = jnp.arange(C)[None, :] < k_near
    scores = jnp.sum(jnp.where(take, d2_sorted, 0.0), axis=1)
    scores = jnp.where(alive, scores, _BIG)
    order = jnp.argsort(scores)
    sel = jnp.minimum(m_select, n)
    w = (jnp.arange(C) < sel).astype(mat.dtype)
    picked = jnp.take(mat, order, axis=0)
    return jnp.tensordot(w, picked, axes=1) / jnp.maximum(sel, 1).astype(
        mat.dtype)


class RobustAggregator:
    """Host-tier robust aggregator for the DEPLOYMENT coordinator — a
    drop-in for :class:`fl_tpu.fl.fedavg.FedAvgAggregator` (the gRPC
    servicer accepts any object with its ``aggregate_updates`` surface)
    that combines full client weight dicts with trimmed mean / median /
    Krum.

    Works on FULL weights, no reference model needed: all three rules are
    shift-equivariant — per-coordinate sort order is invariant to adding
    the common global θ_g (trimmed mean/median), and Krum's pairwise
    distances satisfy ‖θ_i−θ_j‖ = ‖Δ_i−Δ_j‖ — so combining full weights
    equals θ_g + combining deltas. Sample counts are IGNORED by design
    (attacker-controlled metadata); magnitude validation alone cannot
    stop an in-bounds poisoned update, which is exactly the case these
    rules bound.
    """

    def __init__(self, method: str = "median", trim_k: int = 1,
                 krum_f: int = 1, krum_m: int = 1, min_clients: int = 2,
                 validate_updates: bool = True):
        if method not in ("trimmed_mean", "median", "krum"):
            raise ValueError(
                f"method={method!r} not in "
                "('trimmed_mean', 'median', 'krum')")
        # fail fast at config time: aggregation triggers at exactly
        # min_clients, so the threshold itself must be feasible —
        # otherwise every round wedges with a per-round error
        if method == "trimmed_mean" and min_clients - 2 * trim_k < 1:
            raise ValueError(
                f"trimmed_mean(trim_k={trim_k}) needs min_clients >= "
                f"{2 * trim_k + 1}, got {min_clients}")
        if method == "krum" and min_clients < 2 * krum_f + 3:
            raise ValueError(
                f"krum(f={krum_f}) needs min_clients >= 2f+3="
                f"{2 * krum_f + 3} (Blanchard et al. resilience "
                f"condition), got {min_clients}")
        from fl_tpu.fl.fedavg import FedAvgAggregator

        self.method = method
        self.trim_k = trim_k
        self.krum_f = krum_f
        self.krum_m = krum_m
        # reuse the host facade's validation/filter/history machinery
        self._base = FedAvgAggregator(
            min_clients=min_clients, validate_updates=validate_updates)
        self.min_clients = min_clients

    @property
    def aggregation_history(self):
        # property, not an alias: _record_stats REASSIGNS the base list
        # when truncating history, which would orphan a captured alias
        return self._base.aggregation_history

    # -- FedAvgAggregator API surface ----------------------------------
    def validate_update(self, update):
        return self._base.validate_update(update)

    def calculate_convergence_metrics(self, old_model, new_model):
        return self._base.calculate_convergence_metrics(old_model,
                                                        new_model)

    def get_aggregation_stats(self):
        return self._base.get_aggregation_stats()

    def aggregate_updates(self, updates, weights=None):
        import time as _time

        from fl_tpu.core.types import GlobalModel
        from fl_tpu.fl.fedavg import FedAvgError

        del weights  # robust rules are unweighted by design
        t0 = _time.perf_counter()
        if not updates:
            raise FedAvgError("No model updates provided")
        valid = self._base._filter_updates(updates)
        m = len(valid)
        if m < self.min_clients:
            raise FedAvgError(
                f"Insufficient valid updates: {m} < {self.min_clients}")
        if self.method == "trimmed_mean" and m - 2 * self.trim_k < 1:
            raise FedAvgError(
                f"trimmed_mean(trim_k={self.trim_k}) needs more than "
                f"{2 * self.trim_k} updates; got {m}")
        if self.method == "krum" and m < 2 * self.krum_f + 3:
            # Blanchard et al. 2017 resilience condition n ≥ 2f+3: with
            # fewer, f identical colluders can score 0 and get selected
            raise FedAvgError(
                f"krum(f={self.krum_f}) needs at least 2f+3="
                f"{2 * self.krum_f + 3} updates; got {m}")

        from fl_tpu.ops.flatten import stack_flatten, stack_unflatten

        keys = list(valid[0].model_weights.keys())
        stacked = {
            k: jnp.stack([jnp.asarray(u.model_weights[k]) for u in valid])
            for k in keys
        }
        mat, spec = stack_flatten(
            jax.tree.map(lambda x: x.astype(jnp.float32), stacked))
        mask = jnp.ones((m,), jnp.float32)
        if self.method == "trimmed_mean":
            combined = trimmed_mean_matrix(mat, mask, self.trim_k)
        elif self.method == "median":
            combined = median_matrix(mat, mask)
        else:
            combined = krum_matrix(mat, mask, self.krum_f, self.krum_m)
        tree = stack_unflatten(combined[None], spec)
        averaged = {k: v[0] for k, v in tree.items()}

        acc_metrics = {}
        reported = [u.training_metrics.accuracy for u in valid
                    if u.training_metrics is not None]
        if reported:  # UNWEIGHTED mean — counts are attacker-controlled
            acc_metrics["train_accuracy"] = float(
                sum(reported) / len(reported))
        avg_loss = float(sum(u.training_loss for u in valid) / m)
        self._base._record_stats(
            valid, [1.0 / m] * m,
            int(sum(u.num_samples for u in valid)), avg_loss,
            _time.perf_counter() - t0)
        return GlobalModel(
            round_number=valid[0].round_number,
            model_weights=averaged,
            accuracy_metrics=acc_metrics,
            participating_clients=[u.client_id for u in valid],
            convergence_score=0.0,
        )


def robust_combine_deltas(
    global_vars: Any,
    new_stacked: Any,
    mask: jax.Array,
    method: str,
    trim_k: int = 1,
    krum_f: int = 1,
    krum_m: int = 1,
) -> Any:
    """Apply a robust aggregator to the stacked client models and return
    the new global variables (global + robust-combined delta)."""
    from fl_tpu.ops.flatten import stack_flatten, stack_unflatten

    deltas = jax.tree.map(
        lambda c, g: (c - g[None]).astype(jnp.float32),
        new_stacked, global_vars,
    )
    mat, spec = stack_flatten(deltas)
    mask = jnp.asarray(mask, jnp.float32)
    if method == "trimmed_mean":
        combined = trimmed_mean_matrix(mat, mask, trim_k)
    elif method == "median":
        combined = median_matrix(mat, mask)
    elif method == "krum":
        combined = krum_matrix(mat, mask, krum_f, krum_m)
    else:  # pragma: no cover
        raise ValueError(f"unknown robust aggregator: {method!r}")
    delta = stack_unflatten(combined[None], spec)
    return jax.tree.map(
        lambda g, d: (g + d[0].astype(jnp.float32)).astype(g.dtype),
        global_vars, delta,
    )
