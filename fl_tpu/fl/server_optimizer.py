"""Server-side federated optimizers (FedAdam / FedYogi / FedAvgM).

Adaptive federated optimization (Reddi et al. 2021, "Adaptive Federated
Optimization"): instead of REPLACING the global model with the FedAvg
average, treat the aggregated model movement as a pseudo-gradient

    g_t = x_t - FedAvg(client updates)

and feed it to a server optimizer (Adam -> FedAdam, Yogi -> FedYogi,
SGD+momentum -> FedAvgM). Plain FedAvg is exactly the "sgd, lr=1, no
momentum" member of this family. Adaptive server optimizers substantially
speed DP-FL convergence, where client updates are noisy by construction.

The reference has no server optimizer (its aggregation replaces the model —
src/aggregation/fedavg.py:267-288); this is a capability extension on the
same aggregation surface. Implemented as a thin optax factory + a jitted
apply step the round engine runs on the (small, replicated) global
variables after aggregation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import optax

SERVER_OPTIMIZERS = ("none", "fedavgm", "fedadam", "fedyogi")


def make_server_optimizer(
    name: str,
    learning_rate: float = 1.0,
    momentum: float = 0.9,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-3,
) -> Optional[optax.GradientTransformation]:
    """Build the server optimizer; None for plain FedAvg replacement.

    Defaults follow Reddi et al.: adaptivity eps (their τ) = 1e-3 — much
    larger than training-Adam's 1e-8 because pseudo-gradients are averages.
    """
    if name in (None, "", "none"):
        return None
    if name == "fedavgm":
        return optax.sgd(learning_rate, momentum=momentum)
    if name == "fedadam":
        return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)
    if name == "fedyogi":
        return optax.yogi(learning_rate, b1=b1, b2=b2, eps=eps)
    raise ValueError(
        f"Unknown server optimizer {name!r}; choose from {SERVER_OPTIMIZERS}"
    )


def make_server_update_fn(opt: optax.GradientTransformation):
    """Jitted ``(params, fedavg_params, opt_state) -> (new_params,
    new_state)`` applying one server-optimizer step on the pseudo-gradient
    ``params - fedavg_params``."""

    @jax.jit
    def update(params: Any, fedavg_params: Any,
               opt_state: Any) -> Tuple[Any, Any]:
        pseudo_grad = jax.tree.map(lambda a, b: a - b, params, fedavg_params)
        updates, new_state = opt.update(pseudo_grad, opt_state, params)
        return optax.apply_updates(params, updates), new_state

    return update
