"""Model factory + registry.

Parity target: ``ModelFactory`` (src/shared/models_pytorch.py:331-424),
``benchmark_models`` (:427) and ``validate_model_compatibility`` (:472).
The dataset→model routing matches the reference: mnist→simple_cnn,
cifar10→cifar10_cnn, cifar100→federated_resnet, unknown→simple_cnn.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from fl_tpu.models.base import FLModel
from fl_tpu.models.simple_cnn import SimpleCNN
from fl_tpu.models.cifar10_cnn import CIFAR10CNN
from fl_tpu.models.resnet import FederatedResNet
from fl_tpu.models.mobilenet import LightweightMobileNet
from fl_tpu.models.vit import FederatedViT

# name -> (module class, default input shape HWC)
AVAILABLE_MODELS: Dict[str, Tuple[type, Tuple[int, int, int]]] = {
    "simple_cnn": (SimpleCNN, (28, 28, 1)),
    "cifar10_cnn": (CIFAR10CNN, (32, 32, 3)),
    "federated_resnet": (FederatedResNet, (32, 32, 3)),
    "lightweight_mobilenet": (LightweightMobileNet, (32, 32, 3)),
    # beyond the reference zoo: MXU-native attention architecture (pure
    # dense GEMMs, LayerNorm-only — composes with every dp_mode)
    "federated_vit": (FederatedViT, (32, 32, 3)),
}

_DATASET_INPUT_SHAPES = {
    "mnist": (28, 28, 1),
    "cifar10": (32, 32, 3),
    "cifar100": (32, 32, 3),
}


def create_model(
    model_name: str,
    input_shape: Optional[Tuple[int, int, int]] = None,
    **kwargs: Any,
) -> FLModel:
    """Instantiate a model by registry name
    (ref: ModelFactory.create_model, src/shared/models_pytorch.py:341-357)."""
    if model_name not in AVAILABLE_MODELS:
        raise ValueError(
            f"Unknown model: {model_name}. Available: {list(AVAILABLE_MODELS)}"
        )
    cls, default_shape = AVAILABLE_MODELS[model_name]
    module = cls(**kwargs)
    return FLModel(
        module=module,
        name=model_name,
        input_shape=tuple(input_shape or default_shape),
        num_classes=getattr(module, "num_classes", 10),
    )


def get_model_for_dataset(dataset: str, **kwargs: Any) -> FLModel:
    """Recommended model per dataset
    (ref: src/shared/models_pytorch.py:359-381)."""
    dataset = dataset.lower()
    shape = _DATASET_INPUT_SHAPES.get(dataset)
    if dataset == "mnist":
        return create_model("simple_cnn", input_shape=shape, num_classes=10, **kwargs)
    if dataset == "cifar10":
        return create_model("cifar10_cnn", input_shape=shape, num_classes=10, **kwargs)
    if dataset == "cifar100":
        return create_model(
            "federated_resnet", input_shape=shape, num_classes=100, **kwargs
        )
    return create_model("simple_cnn", **kwargs)


def get_lightweight_model(num_classes: int = 10, **kwargs: Any) -> FLModel:
    """Low-resource preset (ref: src/shared/models_pytorch.py:383-398)."""
    return create_model(
        "lightweight_mobilenet",
        num_classes=num_classes,
        width_multiplier=0.5,
        **kwargs,
    )


def list_available_models() -> List[str]:
    return list(AVAILABLE_MODELS)


def get_model_info(model_name: str) -> Dict[str, Any]:
    """Model metadata without keeping an instance around
    (ref: src/shared/models_pytorch.py:405-424)."""
    return create_model(model_name).get_model_info()


class ModelFactory:
    """Class-style facade matching the reference API
    (ref: src/shared/models_pytorch.py:331)."""

    AVAILABLE_MODELS = AVAILABLE_MODELS
    create_model = staticmethod(create_model)
    get_model_for_dataset = staticmethod(get_model_for_dataset)
    get_lightweight_model = staticmethod(get_lightweight_model)
    list_available_models = staticmethod(list_available_models)
    get_model_info = staticmethod(get_model_info)


def benchmark_models(
    batch_size: int = 1,
    num_classes: int = 10,
    warmup: int = 1,
    iters: int = 5,
) -> Dict[str, Dict[str, Any]]:
    """Time a jitted forward pass of every registered model
    (ref: benchmark_models, src/shared/models_pytorch.py:427-469 — but with
    compile excluded via warmup and device sync via block_until_ready)."""
    results: Dict[str, Dict[str, Any]] = {}
    for name in AVAILABLE_MODELS:
        try:
            model = create_model(name, num_classes=num_classes)
            variables = model.init(jax.random.PRNGKey(0))
            x = jnp.zeros((batch_size,) + model.input_shape, jnp.float32)

            @jax.jit
            def fwd(v, x):
                logits, _ = model.apply(v, x, train=False)
                return logits

            out = fwd(variables, x)
            out.block_until_ready()
            for _ in range(warmup):
                fwd(variables, x).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fwd(variables, x)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters

            info = model.get_model_info(variables)
            info["inference_time"] = dt
            info["output_shape"] = tuple(out.shape)
            results[name] = info
        except Exception as e:  # pragma: no cover - defensive, mirrors ref
            results[name] = {"error": str(e)}
    return results


def validate_model_compatibility(model1: FLModel, model2: FLModel) -> bool:
    """True when two models can participate in the same FedAvg round
    (ref: src/shared/models_pytorch.py:472-505): same architecture, same
    parameter paths, same shapes."""
    try:
        if type(model1.module) is not type(model2.module):
            return False
        v1 = model1.init(jax.random.PRNGKey(0))
        v2 = model2.init(jax.random.PRNGKey(0))
        w1 = model1.get_model_weights(v1)
        w2 = model2.get_model_weights(v2)
        if set(w1) != set(w2):
            return False
        return all(w1[k].shape == w2[k].shape for k in w1)
    except Exception:
        return False
