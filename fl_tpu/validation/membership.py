"""Membership-inference attack harness: measured MIA risk, not a heuristic.

Loss-threshold membership inference (Yeom et al. 2018, "Privacy Risk in
Machine Learning"; the score variant of Sablayrolles et al. 2019): an
attacker who can query the released global model guesses that an example
was in the training federation iff its loss is below a threshold. The
attack needs no shadow models and is the standard floor every stronger
MIA builds on — if THIS attack gets traction, the model is memorizing.

This module runs it against models produced by the framework's own
training path and reports rank-AUC and the best threshold advantage
(max TPR − FPR), next to the (ε, δ)-DP ceiling on that advantage
(Kairouz et al. 2015 hypothesis-testing region; tanh(ε/2) at δ=0), so
the privacy story rests on a measured attacker-success gap:
non-private overfit model → AUC well above ½; DP-SGD model → advantage
provably and measurably below the certificate.

The reference has NO measured membership attack — its SecurityValidator
maps ε to a hard-coded "risk level" string
(src/validation/privacy_validator.py:477-503). This harness replaces
that guess with an experiment, complementing
fl_tpu.validation.audit (which turns the same distinguishing game into
a certified ε LOWER bound via update canaries) and
fl_tpu.validation.inversion (reconstruction rather than membership).

Per-example losses are computed by one jitted chunked-scan program
(eval mode, static shapes, bf16-safe), so the attack evaluation runs at
full throughput on TPU and on CPU in tests.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fl_tpu.fl.local_training import cross_entropy_loss
from fl_tpu.models.base import FLModel, Variables


def make_example_loss_fn(
    model: FLModel,
    mean,
    std,
    chunk_size: int = 256,
) -> Callable:
    """Jitted ``fn(variables, images_u8, labels) -> (N,) f32 losses``.

    Images are uint8 (the framework's device-resident storage format);
    normalization happens chunk-by-chunk so the f32 copy of the whole
    set never materializes. N must be a multiple of nothing — it is
    padded to the chunk grid and the pad positions are sliced off.
    """
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    @jax.jit
    def example_losses(variables: Variables, images_u8, labels):
        n = images_u8.shape[0]
        chunk = min(chunk_size, n)
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            images_u8 = jnp.pad(
                images_u8, ((0, pad),) + ((0, 0),) * (images_u8.ndim - 1))
            labels = jnp.pad(labels, (0, pad))
        xs = images_u8.reshape((n_chunks, chunk) + images_u8.shape[1:])
        ys = labels.reshape((n_chunks, chunk))

        def body(_, xy):
            xb, yb = xy
            x = (xb.astype(jnp.float32) / 255.0 - mean) / std
            logits, _ = model.apply(variables, x, train=False)
            return None, cross_entropy_loss(logits, yb, reduce=False)

        _, losses = jax.lax.scan(body, None, (xs, ys))
        return losses.reshape(-1)[:n].astype(jnp.float32)

    return example_losses


def rank_auc(pos: np.ndarray, neg: np.ndarray) -> float:
    """Exact Mann-Whitney AUC of scores ``pos`` (members) vs ``neg``
    (non-members): P(pos_score > neg_score) + ½P(tie)."""
    pos = np.asarray(pos, np.float64)
    neg = np.asarray(neg, np.float64)
    all_scores = np.concatenate([pos, neg])
    order = np.argsort(all_scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    # average ranks over ties (midrank method)
    sorted_scores = all_scores[order]
    i = 0
    n = len(all_scores)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def best_threshold_advantage(pos: np.ndarray, neg: np.ndarray):
    """Max over thresholds of TPR − FPR for the rule score ≥ t, plus the
    achieving threshold. Scores: higher = more member-like."""
    pos = np.sort(np.asarray(pos, np.float64))[::-1]
    neg = np.sort(np.asarray(neg, np.float64))[::-1]
    thresholds = np.unique(np.concatenate([pos, neg]))[::-1]
    # TPR(t) = frac(pos >= t); FPR(t) = frac(neg >= t) — vectorized via
    # searchsorted on the descending arrays
    tpr = np.searchsorted(-pos, -thresholds, side="right") / len(pos)
    fpr = np.searchsorted(-neg, -thresholds, side="right") / len(neg)
    adv = tpr - fpr
    k = int(np.argmax(adv))
    return float(adv[k]), float(thresholds[k])


def membership_advantage_bound(epsilon: float, delta: float = 0.0) -> float:
    """Ceiling on membership advantage (max TPR − FPR) any attacker can
    achieve against an (ε, δ)-DP mechanism.

    From the (ε, δ) hypothesis-testing region (Kairouz et al. 2015):
    TPR ≤ e^ε·FPR + δ and TPR ≤ 1 − (1 − δ − FPR)/e^ε. The two
    frontiers cross at FPR f* = (1 − δ)/(e^ε + 1), giving advantage
    e^ε·f* + δ − f* = (e^ε − 1 + 2δ)/(e^ε + 1) — which reduces to
    tanh(ε/2) at δ=0 (Yeom et al.'s e^ε − 1 is the loose small-ε
    version) and to δ at ε=0. Clamped to [0, 1]."""
    if epsilon < 0 or delta < 0:
        raise ValueError("epsilon and delta must be non-negative")
    t = math.exp(epsilon)
    return float(min(1.0, (t - 1.0 + 2.0 * delta) / (t + 1.0)))


@dataclasses.dataclass
class MembershipReport:
    auc: float                    # rank-AUC of −loss, member vs non-member
    advantage: float              # best TPR − FPR over thresholds
    threshold_loss: float         # loss threshold achieving it
    member_loss_mean: float
    nonmember_loss_mean: float
    n_members: int
    n_nonmembers: int
    epsilon: Optional[float] = None
    delta: Optional[float] = None
    advantage_bound: Optional[float] = None  # DP ceiling, if ε was given

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def loss_attack_report(
    model: FLModel,
    variables: Variables,
    member_images: np.ndarray,
    member_labels: np.ndarray,
    nonmember_images: np.ndarray,
    nonmember_labels: np.ndarray,
    mean,
    std,
    epsilon: Optional[float] = None,
    delta: Optional[float] = None,
) -> MembershipReport:
    """Run the loss-threshold attack against ``variables``.

    Members must be actual training examples; non-members fresh draws
    from the same distribution (the attacker's null). Pass the run's
    certified (ε, δ) to also report the DP advantage ceiling."""
    loss_fn = make_example_loss_fn(model, mean, std)
    m_losses = np.asarray(loss_fn(
        variables, jnp.asarray(member_images), jnp.asarray(member_labels)))
    n_losses = np.asarray(loss_fn(
        variables, jnp.asarray(nonmember_images),
        jnp.asarray(nonmember_labels)))
    # member-likeness score = −loss
    auc = rank_auc(-m_losses, -n_losses)
    adv, thr = best_threshold_advantage(-m_losses, -n_losses)
    bound = (membership_advantage_bound(epsilon, delta or 0.0)
             if epsilon is not None else None)
    return MembershipReport(
        auc=auc, advantage=adv, threshold_loss=-thr,
        member_loss_mean=float(m_losses.mean()),
        nonmember_loss_mean=float(n_losses.mean()),
        n_members=int(len(m_losses)), n_nonmembers=int(len(n_losses)),
        epsilon=epsilon, delta=delta, advantage_bound=bound,
    )


def evaluate_membership_risk(
    engine,
    nonmember_images: np.ndarray,
    nonmember_labels: np.ndarray,
    epsilon: Optional[float] = None,
    delta: Optional[float] = None,
    max_members: int = 4096,
) -> MembershipReport:
    """Attack a FederatedRoundEngine's current global model using its own
    federation data as the member set (valid shard slots only — pad
    slots were never trained on and would dilute the attack)."""
    data = engine.data
    imgs = np.asarray(data.images)      # (C, n, ...)
    labs = np.asarray(data.labels)
    counts = np.asarray(data.num_samples)
    members_x, members_y = [], []
    for c in range(imgs.shape[0]):
        k = int(counts[c])
        members_x.append(imgs[c, :k])
        members_y.append(labs[c, :k])
    mx = np.concatenate(members_x)[:max_members]
    my = np.concatenate(members_y)[:max_members]
    if epsilon is None and engine.privacy is not None \
            and engine.config.dp_mode in ("dp_sgd", "client_dp",
                                          "distributed", "dp_ftrl"):
        # the engine's own certified budget is the honest ceiling input
        epsilon = float(engine.privacy.epsilon)
        delta = float(engine.privacy.delta)
    return loss_attack_report(
        engine.model, engine.global_variables, mx, my,
        nonmember_images, nonmember_labels,
        mean=data.mean, std=data.std, epsilon=epsilon, delta=delta,
    )
