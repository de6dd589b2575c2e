"""q-FedAvg: fair resource allocation as a reweighted FedAvg reduction.

Li et al. 2020, "Fair Resource Allocation in Federated Learning" (q-FFL,
ICLR). The global objective is reweighted toward the worst-served
clients: min_θ Σ_k (p_k / (q+1)) · F_k(θ)^{q+1}. q = 0 recovers plain
(uniform) FedAvg; larger q compresses the spread of per-client losses
(fairness) at some cost in mean accuracy.

q-FedAvg (the paper's Algorithm 2) turns a round of ordinary local SGD
into a step on that objective without re-tuning the learning rate as q
changes:

    Δw_k = L · (θ̂ − w̄_k)            the local update as an estimated
                                      gradient, L = 1/lr
    Δ_k  = F_k(θ̂)^q · Δw_k           loss-weighted direction
    h_k  = q·F_k^{q−1}·‖Δw_k‖² + L·F_k^q
    θ⁺   = θ − Σ_participants Δ_k / Σ_participants h_k

where F_k(θ̂) is client k's loss at the model it received, BEFORE local
training. The h_k denominator is the paper's Lipschitz-style estimate
that keeps the effective step size stable in q.

TPU-native formulation: the per-client deltas are flattened to one
(C, D) matrix (ops.flatten), so the numerator is a single
mask-and-loss-weighted GEMV and the denominator a masked reduction —
under a mesh each shard contributes its local partial and one psum per
reduction finishes the round (same collective budget as plain FedAvg).

The reference (Prashant-ambati/...) has no fairness objective at all —
its FedAvg weights are sample counts only (src/aggregation/fedavg.py:247)
— so this is a capability extension; the fairness signal it optimizes is
the one `fl_tpu.fl.federated_eval.evaluate_federated` measures
(per-client accuracy spread).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from fl_tpu.ops.flatten import stack_flatten, stack_unflatten

Variables = Dict[str, Any]

# floor for F_k before the q / (q−1) powers: a client with exactly zero
# loss would otherwise produce h_k = q·0^{q−1}·‖Δw‖² = inf for q < 1 and
# kill the whole round's denominator
_LOSS_FLOOR = 1e-12


def qffl_combine(
    global_vars: Variables,
    ref_vars: Variables,
    new_stacked: Variables,
    pre_losses: jax.Array,   # (CL,) f32: F_k(θ̂) before local training
    mask: jax.Array,         # (CL,) f32 participation mask
    q: float,
    lr: float,
    psum_: Callable[[jax.Array], jax.Array],
) -> Variables:
    """One q-FedAvg server step (paper Alg. 2 lines 7-9).

    ``new_stacked`` are the post-local-training client variables (leading
    client axis), ``ref_vars`` the model clients actually received (θ̂ —
    differs from ``global_vars`` only under downlink compression; the
    step is applied to the full-precision master). Defined on "params"
    only; models carrying batch_stats are refused at engine config time.
    """
    L = 1.0 / float(lr)
    F = jnp.maximum(pre_losses.astype(jnp.float32), _LOSS_FLOOR)
    Fq = F ** q

    # Δw_k = L(θ̂ − w̄_k) as one (CL, D) matrix
    dmat, _ = stack_flatten(jax.tree.map(
        lambda r, c: (r[None] - c).astype(jnp.float32) * L,
        ref_vars["params"], new_stacked["params"]))
    norms2 = jnp.sum(dmat * dmat, axis=1)              # (CL,) ‖Δw_k‖²

    h = q * F ** (q - 1.0) * norms2 + L * Fq           # (CL,)
    denom = psum_(jnp.sum(h * mask))
    numer = psum_(jnp.tensordot(Fq * mask, dmat, axes=1))   # (D_pad,)
    step = numer / jnp.maximum(denom, 1e-30)

    pmat, pspec = stack_flatten(jax.tree.map(
        lambda g: g[None].astype(jnp.float32), global_vars["params"]))
    new_params = jax.tree.map(
        lambda s, g: s[0].astype(g.dtype),
        stack_unflatten((pmat[0] - step)[None], pspec),
        global_vars["params"])

    new_global = dict(global_vars)
    new_global["params"] = new_params
    return new_global
