"""CNN model zoo for federated image classification.

Parity target: ``src/shared/models_pytorch.py`` (SimpleCNN, CIFAR10CNN,
FederatedResNet, LightweightMobileNet + ModelFactory). The modules are flax
``nn.Module``s in NHWC layout — the idiomatic TPU layout, letting XLA tile
convs straight onto the MXU — and every model is pure-functional so its
fwd/bwd can be ``vmap``-ed over a stacked client axis.
"""

from fl_tpu.models.base import FLModel  # noqa: F401
from fl_tpu.models.factory import (  # noqa: F401
    AVAILABLE_MODELS,
    ModelFactory,
    benchmark_models,
    create_model,
    get_lightweight_model,
    get_model_for_dataset,
    get_model_info,
    list_available_models,
    validate_model_compatibility,
)
from fl_tpu.models.simple_cnn import SimpleCNN  # noqa: F401
from fl_tpu.models.cifar10_cnn import CIFAR10CNN  # noqa: F401
from fl_tpu.models.resnet import FederatedResNet, ResNetBlock  # noqa: F401
from fl_tpu.models.mobilenet import LightweightMobileNet, MobileNetBlock  # noqa: F401
from fl_tpu.models.vit import EncoderBlock, FederatedViT  # noqa: F401
