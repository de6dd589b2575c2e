"""One-run empirical privacy auditing: measured ε lower bounds.

Implements the auditing procedure of Steinke, Nasr & Jagielski, "Privacy
Auditing with One (1) Training Run" (NeurIPS 2023) at the client level:
``m`` canary clients (random out-of-distribution data) are independently
included or excluded with probability ½ in a SINGLE federated training
run; a black-box score (the drop in the canary's own loss between the
initial and final global model) ranks canaries by apparent membership, and
the number of correct membership guesses yields a high-confidence lower
bound on the client-level ε the run actually provides.

The bound is the dominating-binomial tail of their Theorem 5.2: under
ε-DP, the count of correct guesses C among r non-abstentions satisfies

    P[C ≥ v] ≤ P[Binomial(r, e^ε/(e^ε+1)) ≥ v],

so any ε whose tail probability at the observed count falls below the
significance level is refuted; the largest refuted ε is the audit's lower
bound. For (ε, δ)-DP mechanisms the tail acquires an additive O(m·δ)
correction (their §5.3); we add ``m·δ`` slack, which only *weakens* the
reported bound (conservative direction) and is negligible at δ ≤ 1e-5.

This complements the analytical accountant: ``fl_tpu.fl.accounting``
certifies ε from above; this harness measures it from below. A correct DP
implementation must keep ``audited ε ≤ certified ε`` — a violation is a
*proof* of an accounting or mechanism bug (wrong sensitivity, reused
noise, missing clip), which is exactly the class of defect analytical
validation cannot catch.

The reference has no empirical privacy validation beyond a noise-σ band
check (src/validation/privacy_validator.py:104-108); this is a capability
extension. The audited record is a CLIENT (all its examples), matching
what ``dp_mode="client_dp"`` certifies; auditing example-level ``dp_sgd``
would need per-example canaries inside a shard and is out of scope here.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import optax

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.models.base import FLModel, Variables
from fl_tpu.ops.preprocess import normalize_u8

# ---------------------------------------------------------------------------
# Statistical machinery (pure, exactly testable)
# ---------------------------------------------------------------------------


def binomial_sf(v: int, r: int, p: float) -> float:
    """P[Binomial(r, p) ≥ v], exact (lgamma log-pmf accumulation)."""
    if v <= 0:
        return 1.0
    if v > r:
        return 0.0
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0
    log_p, log_q = math.log(p), math.log1p(-p)
    lg_r = math.lgamma(r + 1)
    total = 0.0
    for k in range(v, r + 1):
        log_pmf = (lg_r - math.lgamma(k + 1) - math.lgamma(r - k + 1)
                   + k * log_p + (r - k) * log_q)
        total += math.exp(log_pmf)
    return min(1.0, total)


def audit_tail_probability(num_correct: int, num_guesses: int,
                           epsilon: float) -> float:
    """The Thm 5.2 dominating tail: P[C ≥ c] under ε-DP with r guesses."""
    p = math.exp(epsilon) / (1.0 + math.exp(epsilon))
    return binomial_sf(num_correct, num_guesses, p)


def empirical_epsilon_lower_bound(
    num_correct: int,
    num_guesses: int,
    num_canaries: int,
    delta: float = 0.0,
    confidence: float = 0.95,
    eps_max: float = 50.0,
) -> float:
    """Largest ε refuted at the given confidence by ``num_correct`` correct
    membership guesses out of ``num_guesses`` (Steinke et al. 2023, Thm
    5.2; ``num_canaries·delta`` slack per §5.3 — conservative).

    Returns 0.0 when the observation is consistent with every ε ≥ 0 (the
    attack found no signal), and ``eps_max`` when even that is refuted.
    """
    if not 0 <= num_correct <= num_guesses:
        raise ValueError("need 0 <= num_correct <= num_guesses")
    if num_guesses == 0:
        return 0.0
    beta = 1.0 - confidence
    slack = num_canaries * delta

    def rejected(eps: float) -> bool:
        return (audit_tail_probability(num_correct, num_guesses, eps)
                + slack) <= beta

    if not rejected(0.0):
        return 0.0
    if rejected(eps_max):
        return eps_max
    lo, hi = 0.0, eps_max  # rejected(lo), not rejected(hi)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if rejected(mid):
            lo = mid
        else:
            hi = mid
    return lo


def canary_guesses(scores: np.ndarray, k_pos: int, k_neg: int) -> np.ndarray:
    """Guess vector from membership scores: the ``k_pos`` highest scores are
    guessed IN (+1), the ``k_neg`` lowest OUT (−1), the rest abstain (0).
    Abstaining on uncertain canaries strengthens the bound (Thm 5.2 is in
    terms of non-abstentions r, and mid-ranked scores are coin flips)."""
    m = len(scores)
    if k_pos + k_neg > m:
        raise ValueError("k_pos + k_neg cannot exceed the canary count")
    order = np.argsort(scores)  # ascending
    guesses = np.zeros(m, np.int8)
    if k_neg:
        guesses[order[:k_neg]] = -1
    if k_pos:
        guesses[order[m - k_pos:]] = 1
    return guesses


# ---------------------------------------------------------------------------
# Canary construction + scoring
# ---------------------------------------------------------------------------


def append_canary_clients(
    data: FederatedArrays,
    num_canaries: int,
    canary_samples: int,
    seed: int = 0,
) -> FederatedArrays:
    """Append ``num_canaries`` canary clients holding i.i.d. uniform-random
    images with uniform-random labels. Random data is maximally
    memorization-sensitive (the model can only reduce its loss by storing
    it), which is what makes the membership signal strong when privacy is
    weak and the audit tight."""
    if canary_samples > data.samples_per_client:
        raise ValueError(
            f"canary_samples={canary_samples} exceeds the padded shard "
            f"length {data.samples_per_client}")
    rng = np.random.default_rng(seed)
    n = data.samples_per_client
    img_shape = data.images.shape[2:]
    imgs = np.zeros((num_canaries, n) + img_shape, np.uint8)
    labs = np.zeros((num_canaries, n), np.int32)
    imgs[:, :canary_samples] = rng.integers(
        0, 256, (num_canaries, canary_samples) + img_shape, dtype=np.uint8)
    labs[:, :canary_samples] = rng.integers(
        0, data.num_classes, (num_canaries, canary_samples), dtype=np.int32)
    counts = np.full((num_canaries,), canary_samples, np.int32)
    return dataclasses.replace(
        data,
        images=np.concatenate([np.asarray(data.images), imgs]),
        labels=np.concatenate([np.asarray(data.labels), labs]),
        num_samples=np.concatenate([np.asarray(data.num_samples), counts]),
    )


def make_update_canaries(
    variables: Variables, num_canaries: int, scale: float, seed: int = 0,
):
    """Random directions on the sphere of radius ``scale`` in the model's
    full variable space, one per canary, stacked on a leading axis.

    Update canaries are the strong audit instrument for client-level
    DP-FedAvg (Steinke et al. 2023 §6; McMahan et al.'s DP-FTRL audits):
    random directions in the ~4·10⁵-dimensional parameter space are
    mutually near-orthogonal AND near-orthogonal to every real client's
    update, so the released aggregate's projection onto a canary's
    direction isolates that canary's own contribution plus the mechanism's
    Gaussian noise — data canaries can't achieve this because natural
    gradients share low-dimensional structure (class priors, generic
    features) that swamps the membership signal.
    """
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(variables)
    outs = [rng.standard_normal((num_canaries,) + np.shape(l)).astype(
        np.float32) for l in leaves]
    sq = sum((o.reshape(num_canaries, -1) ** 2).sum(axis=1) for o in outs)
    norm = np.sqrt(sq)
    outs = [o * (scale / norm).reshape((num_canaries,) + (1,) * (o.ndim - 1))
            for o in outs]
    return jax.tree.unflatten(treedef, outs)


def make_update_dot_fn():
    """Jitted ⟨released global delta, canary direction⟩ for a stacked
    canary-direction pytree — the sufficient statistic for update-canary
    membership (the mechanism's noise contributes N(0, σ²·scale²) to each
    dot; a participating canary adds its full clipped magnitude)."""

    @jax.jit
    def dot_fn(old_vars: Variables, new_vars: Variables, directions):
        delta = jax.tree.map(
            lambda n, o: (n.astype(jnp.float32) - o.astype(jnp.float32)),
            new_vars, old_vars)

        def one(d):
            dots = jax.tree.map(lambda dl, ul: jnp.vdot(dl, ul).real,
                                delta, d)
            return sum(jax.tree.leaves(dots))

        return jax.vmap(one)(directions)

    return dot_fn


def make_canary_dot_fn(model: FLModel):
    """Jitted per-round membership evidence: the projection of the realized
    global update onto each canary's (unit-normalized) loss gradient at the
    round's starting model.

    ⟨θ_t − θ_{t+1}, ∇L_i(θ_t)/‖∇L_i(θ_t)‖⟩ is large and positive when the
    round moved the global model down canary i's descent direction — which
    only the canary's own participation produces, because random-data
    gradients are near-orthogonal to every other client's update in the
    ~4·10⁵-dimensional parameter space. Unlike the black-box loss-drop
    score, this survives FedAvg's 1/m dilution (dilution shrinks the
    magnitude, not the direction) and accumulates across rounds.
    """

    def _unit_grad(variables: Variables, x, y, count):
        n = y.shape[0]
        msk = (jnp.arange(n) < count).astype(jnp.float32)

        def loss_fn(params):
            logits, _ = model.apply(dict(variables, params=params), x,
                                    train=False)
            per = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (per * msk).sum() / jnp.maximum(msk.sum(), 1.0)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(g)
        norm = jnp.sqrt(sum(jnp.vdot(l, l).real for l in leaves))
        return jax.tree.map(lambda l: l / jnp.maximum(norm, 1e-12), g)

    @jax.jit
    def dot_fn(old_vars: Variables, new_vars: Variables,
               images, labels, counts, mean, std):
        moved = jax.tree.map(
            lambda o, n: (o - n).astype(jnp.float32),
            old_vars["params"], new_vars["params"])

        def one(x_u8, y, c):
            g = _unit_grad(old_vars, normalize_u8(x_u8, mean, std), y, c)
            dots = jax.tree.map(lambda m, gl: jnp.vdot(m, gl).real, moved, g)
            return sum(jax.tree.leaves(dots))

        return jax.vmap(one)(images, labels, counts)

    return dot_fn


def make_canary_score_fn(model: FLModel):
    """Jitted black-box per-canary score: mean loss drop between two
    variable sets on each canary's own (masked) samples. Higher = more
    evidence the canary was trained on. Weaker than
    :func:`make_canary_dot_fn` (FedAvg dilution shrinks it below the
    cross-canary noise floor at realistic cohort sizes) but requires only
    query access to the two models."""

    def _mean_loss(variables: Variables, x_u8, y, count, mean, std):
        x = normalize_u8(x_u8, mean, std)
        logits, _ = model.apply(variables, x, train=False)
        n = y.shape[0]
        msk = (jnp.arange(n) < count).astype(jnp.float32)
        per = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return (per * msk).sum() / jnp.maximum(msk.sum(), 1.0)

    @jax.jit
    def score_fn(init_vars: Variables, final_vars: Variables,
                 images, labels, counts, mean, std):
        def one(x, y, c):
            return (_mean_loss(init_vars, x, y, c, mean, std)
                    - _mean_loss(final_vars, x, y, c, mean, std))

        return jax.vmap(one)(images, labels, counts)

    return score_fn


# ---------------------------------------------------------------------------
# The audit harness
# ---------------------------------------------------------------------------


def run_client_membership_audit(
    model: FLModel,
    data: FederatedArrays,
    config,
    num_canaries: int = 16,
    num_rounds: int = 10,
    canary_samples: int = 8,
    guess_fraction: float = 0.25,
    confidence: float = 0.95,
    seed: int = 0,
    mesh=None,
    canary_kind: str = "update",
    score_method: str = "grad_dot",
) -> Dict[str, Any]:
    """Audit one training run of :class:`FederatedRoundEngine` for
    client-level privacy; returns the measured ε lower bound beside the
    accountant's certified ε.

    Two canary instruments:

    - ``canary_kind="update"`` (default, requires ``dp_mode="client_dp"``):
      each canary client submits a fixed random direction of norm equal to
      the clip bound through the PRODUCTION superstep (the engine's
      ``audit_injection`` hook replaces the canary's trained delta ahead of
      the central clip). Scoring is the released round delta's projection
      onto the canary direction, summed over rounds. This is the tight
      instrument: per-round SNR is 1/z against the mechanism's own noise,
      independent of cohort size.
    - ``canary_kind="data"``: black-box canaries holding random
      out-of-distribution examples; score via ``score_method``
      (``"grad_dot"`` or ``"loss_drop"``). Works for any dp_mode including
      ``"none"`` and ``"delta"``, but the membership signal is diluted by
      FedAvg averaging and shared gradient structure — measured in
      tests/test_privacy_audit.py, it separates only for small cohorts /
      many rounds. A loose audit under-estimates ε, which is the safe
      direction for a lower bound, but prefer ``"update"`` canaries when
      the mode allows.

    Canary inclusion bits are sampled i.i.d. uniform as the theorem
    requires; participation masks keep the engine's Bernoulli(q) sampling
    for every client, with excluded canaries forced out.
    """
    from fl_tpu.orchestration.round_engine import FederatedRoundEngine

    if config.dp_mode == "dp_sgd":
        raise ValueError(
            "dp_sgd certifies example-level DP; a client-level canary "
            "audit would not lower-bound it. Audit dp_mode='client_dp', "
            "'delta', or 'none'.")

    if canary_kind not in ("update", "data"):
        raise ValueError("canary_kind must be 'update' or 'data'")
    if score_method not in ("grad_dot", "loss_drop"):
        raise ValueError("score_method must be 'grad_dot' or 'loss_drop'")
    if canary_kind == "update" and config.dp_mode != "client_dp":
        raise ValueError(
            "update canaries inject through the client_dp clip→noise path; "
            "set dp_mode='client_dp' or use canary_kind='data'")

    rng = np.random.default_rng(seed)
    audited = append_canary_clients(data, num_canaries, canary_samples,
                                    seed=seed)
    num_real = data.num_clients
    num_total = num_real + num_canaries
    included = rng.integers(0, 2, num_canaries).astype(bool)

    if canary_kind == "update":
        config = dataclasses.replace(config, audit_injection=True)
    engine = FederatedRoundEngine(model, audited, config, mesh=mesh)
    init_weights = jax.tree.map(lambda a: a.copy(), engine.global_variables)
    canary_batch = (
        jnp.asarray(np.asarray(audited.images)[num_real:]),
        jnp.asarray(np.asarray(audited.labels)[num_real:]),
        jnp.asarray(np.asarray(audited.num_samples)[num_real:]),
    )

    inject_stacked = directions = None
    if canary_kind == "update":
        directions = make_update_canaries(
            engine.global_variables, num_canaries,
            scale=float(config.privacy.max_grad_norm), seed=seed)
        # full (C_total,)-stacked injection tree: zeros for real clients
        inject_stacked = jax.tree.map(
            lambda u: jnp.concatenate([
                jnp.zeros((num_real,) + u.shape[1:], u.dtype),
                jnp.asarray(u)]),
            directions)

    dot_fn = (make_update_dot_fn() if canary_kind == "update"
              else make_canary_dot_fn(model)
              if score_method == "grad_dot" else None)
    scores = np.zeros(num_canaries, np.float64)
    q = config.participation_rate
    for _ in range(num_rounds):
        mask = (rng.random(num_total) < q).astype(np.float32)
        mask[num_real:] *= included.astype(np.float32)
        before = engine.global_variables
        if canary_kind == "update":
            flags = np.zeros(num_total, np.float32)
            flags[num_real:] = mask[num_real:]
            engine.run_round(mask=mask, evaluate=False,
                             inject_flags=flags,
                             inject_deltas=inject_stacked)
            scores += np.asarray(dot_fn(
                before, engine.global_variables, directions))
        else:
            engine.run_round(mask=mask, evaluate=False)
            if dot_fn is not None:
                scores += np.asarray(dot_fn(
                    before, engine.global_variables, *canary_batch,
                    audited.mean, audited.std))

    if canary_kind == "data" and score_method == "loss_drop":
        score_fn = make_canary_score_fn(model)
        scores = np.asarray(score_fn(
            init_weights, engine.global_variables, *canary_batch,
            audited.mean, audited.std,
        ))

    k = max(1, int(round(guess_fraction * num_canaries)))
    guesses = canary_guesses(scores, k_pos=k, k_neg=k)
    truth = np.where(included, 1, -1).astype(np.int8)
    num_guesses = int((guesses != 0).sum())
    num_correct = int(((guesses == truth) & (guesses != 0)).sum())

    delta = config.privacy.delta if config.privacy is not None else 0.0
    eps_lb = empirical_epsilon_lower_bound(
        num_correct, num_guesses, num_canaries, delta=delta,
        confidence=confidence)

    certified: Optional[float] = None
    if engine.rdp_accountant is not None:
        certified = engine.rdp_accountant.get_epsilon(delta)
    elif config.dp_mode == "delta" and engine.budget_tracker is not None:
        certified = engine.budget_tracker.consumed_epsilon

    return {
        "empirical_epsilon_lower_bound": float(eps_lb),
        "certified_epsilon": certified,
        "consistent": (certified is None
                       or eps_lb <= certified + 1e-9),
        "num_canaries": num_canaries,
        "num_guesses": num_guesses,
        "num_correct": num_correct,
        "confidence": confidence,
        "rounds": num_rounds,
        "dp_mode": config.dp_mode,
        "canary_kind": canary_kind,
        "score_method": (score_method if canary_kind == "data"
                         else "update_dot"),
        "scores": scores.tolist(),
        "included": included.tolist(),
    }
