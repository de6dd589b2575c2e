"""FedDyn: federated learning with dynamic regularization.

Acar et al. 2021 (ICLR, "Federated Learning Based on Dynamic
Regularization"), Algorithm 1. Like FedProx/SCAFFOLD it fights client
drift, but by making each client's LOCAL objective dynamically consistent
with the global one: client i minimizes

    L_i(θ) − ⟨g_i, θ⟩ + (α/2)·‖θ − θ_g‖²

where g_i is the client's carried first-order state (its previous local
gradient at its own optimum). The first-order condition of that objective
gives the exact state update — no trajectory identity needed, so unlike
SCAFFOLD Option II it does not constrain the local optimizer:

    g_i ← g_i − α·(θ_i − θ_g)                        (participants)
    h   ← h − (α/N)·Σ_{i∈P} (θ_i − θ_g)              (server state)
    θ_g ← mean_{i∈P}(θ_i) − h/α                      (server model)

TPU mapping (mirrors fl_tpu.fl.scaffold): the per-step gradient term
−g_i rides the vmapped trainer's existing ``correction`` operand and the
(α/2)-proximal term IS FedProx's ``proximal_mu`` — FedDyn's local step is
a composition of two hooks the trainer already has. State is one
client-sharded (C, D) matrix + a replicated (D,) vector; the server
update is elementwise math plus the same masked-column-sum psum schedule
as FedAvg.

The reference has no heterogeneity correction (SURVEY.md §2.2); this is a
capability extension alongside FedProx / SCAFFOLD / FedNova.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def feddyn_server_update(
    params_flat: jax.Array,       # (D_pad,) current global params θ_g
    h_flat: jax.Array,            # (D_pad,) server state h
    grad_mat: jax.Array,          # (C_local, D_pad) client states g_i
    delta_mat: jax.Array,         # (C_local, D_pad) θ_i − θ_g
    mask: jax.Array,              # (C_local,) participation mask
    alpha: float,
    num_clients: int,             # global N (not the shard-local count)
    psum: Callable[[jax.Array], jax.Array] = lambda x: x,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One FedDyn round's state + model update (Alg. 1 server lines).

    Returns ``(new_params_flat, new_h, new_grads)``. Non-participants'
    g_i are untouched; h moves by the participant delta-sum over the
    GLOBAL client count N; the new model is the unweighted participant
    mean minus h/α.
    """
    m = (mask > 0).astype(jnp.float32)[:, None]
    new_grads = jnp.where(m > 0, grad_mat - alpha * delta_mat, grad_mat)
    sum_delta = psum(jnp.sum(m * delta_mat, axis=0))        # (D_pad,)
    new_h = h_flat - (alpha / float(num_clients)) * sum_delta
    p_real = psum(mask.astype(jnp.float32).sum())
    mean_theta = params_flat + sum_delta / jnp.maximum(p_real, 1.0)
    # an EMPTY round must not move the model: without participants the
    # paper's server line has no mean to take, and applying −h/α alone
    # would drift θ by the carried state every skipped round
    new_params = jnp.where(p_real > 0, mean_theta - new_h / alpha,
                           params_flat)
    return new_params, new_h, new_grads
