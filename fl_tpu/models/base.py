"""Functional model wrapper.

The reference's ``FederatedCNNBase`` (src/shared/models_pytorch.py:18-56)
carries mutable torch state and exposes get/set weight dicts. In a functional
JAX design the model is a pure ``nn.Module`` plus externally-threaded
variables; :class:`FLModel` bundles the module with its metadata and provides
the same capability surface — weight-dict get/set (flat path keys), parameter
counting, memory estimation — without owning any state.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from fl_tpu.core import pytree as pt

# Model variables: {'params': ..., optional 'batch_stats': ...}
Variables = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FLModel:
    """A model architecture bound to an input spec.

    Pure-functional equivalent of FederatedCNNBase
    (ref: src/shared/models_pytorch.py:18-56).
    """

    module: nn.Module
    name: str
    input_shape: Tuple[int, int, int]  # (H, W, C), NHWC
    num_classes: int

    # -- initialization ----------------------------------------------------
    def init(self, rng: jax.Array) -> Variables:
        dummy = jnp.zeros((1,) + tuple(self.input_shape), jnp.float32)
        variables = self.module.init({"params": rng}, dummy, train=False)
        return dict(variables)

    # -- forward -----------------------------------------------------------
    def apply(
        self,
        variables: Variables,
        x: jax.Array,
        *,
        train: bool,
        dropout_rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Variables]:
        """Run the forward pass.

        Returns ``(logits, new_variables)``; when training with BatchNorm the
        returned variables carry updated ``batch_stats``.
        """
        rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
        has_stats = "batch_stats" in variables
        if train and has_stats:
            logits, mutated = self.module.apply(
                variables, x, train=True, rngs=rngs, mutable=["batch_stats"]
            )
            new_vars = dict(variables)
            new_vars["batch_stats"] = mutated["batch_stats"]
            return logits, new_vars
        logits = self.module.apply(variables, x, train=train, rngs=rngs)
        return logits, variables

    # -- weight-dict interface (ref: get/set_model_weights,
    #    src/shared/models_pytorch.py:25-36) -------------------------------
    def get_model_weights(self, variables: Variables) -> Dict[str, jax.Array]:
        """Flat ``{path: array}`` view over all trainable params (and batch
        stats, which FedAvg also averages — see fl_tpu.fl.fedavg)."""
        return pt.flatten_dict(
            {k: v for k, v in variables.items() if k in ("params", "batch_stats")}
        )

    def set_model_weights(
        self, variables: Variables, weights: Dict[str, jax.Array]
    ) -> Variables:
        """Rebuild variables from a flat weight dict, validating structure."""
        current = self.get_model_weights(variables)
        pt.assert_same_structure(current, weights)
        return pt.unflatten_dict({k: jnp.asarray(v) for k, v in weights.items()})

    # -- introspection (ref: src/shared/models_pytorch.py:38-56) -----------
    def get_parameter_count(self, variables: Variables) -> int:
        return pt.tree_size(variables.get("params", {}))

    def estimate_memory_usage(self, variables: Variables) -> int:
        return pt.tree_bytes(variables)

    def get_model_info(self, variables: Optional[Variables] = None) -> Dict[str, Any]:
        if variables is None:
            variables = self.init(jax.random.PRNGKey(0))
        params = variables.get("params", {})
        return {
            "name": self.name,
            "parameters": pt.tree_size(params),
            "memory_bytes": pt.tree_bytes(variables),
            "layers": len(pt.flatten_dict(params)),
            "trainable_params": pt.tree_size(params),
            "input_shape": tuple(self.input_shape),
            "num_classes": self.num_classes,
        }
