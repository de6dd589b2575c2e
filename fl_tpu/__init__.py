"""fl_tpu — a TPU-native federated-learning framework for privacy-preserving
image classification.

This is a ground-up JAX/XLA/Pallas rebuild of the capabilities of
`Federated-Learning-for-Privacy-Preserving-Image-Classification` (a PyTorch +
gRPC coordinator/client FedAvg system). It is NOT a port: instead of one OS
process per client exchanging serialized weights over gRPC, all simulated
clients run as a single batched XLA program — client-model replicas and data
shards live in HBM, local SGD is `vmap`-ed over the client axis, the client
axis is sharded over a `jax.sharding.Mesh`, and FedAvg's sample-weighted
average is an on-device reduction over ICI.

Layer map (see each subpackage for the reference parity notes):

- ``fl_tpu.core``          pytree weight utilities, mesh/sharding, PRNG
                           discipline, config dataclasses
                           (ref: src/shared/models.py, interfaces.py)
- ``fl_tpu.models``        flax CNN zoo + factory
                           (ref: src/shared/models_pytorch.py)
- ``fl_tpu.ops``           Pallas TPU kernels: fused DP clip+noise, quantize,
                           top-k sparsify, weighted aggregation
- ``fl_tpu.fl``            federated core: vmapped local SGD, FedAvg,
                           convergence, DP engine, compression, partitioning
                           (ref: src/aggregation/, src/shared/privacy*.py,
                           compression.py, data_loader.py)
- ``fl_tpu.data``          datasets + device-resident federated shards
                           (ref: src/shared/data_loader.py)
- ``fl_tpu.parallel``      device-mesh scale-out of the client axis
- ``fl_tpu.orchestration`` round engine, simulation harness, metrics,
                           failure handling, checkpointing
                           (ref: src/coordinator/, src/simulation/)
- ``fl_tpu.services``      gRPC coordinator/client speaking the reference's
                           federated_learning.proto, REST management API,
                           CLIs (ref: src/coordinator/, src/client/, proto/)
- ``fl_tpu.utils``         logging, validation, monitoring, error tracking
                           (ref: src/shared/logging_config.py, validation.py,
                           monitoring.py, error_tracking.py)
"""

__version__ = "0.1.0"

from fl_tpu.core.types import (  # noqa: F401
    ClientCapabilities,
    ComputePowerLevel,
    GlobalModel,
    ModelUpdate,
    PrivacyConfig,
    RoundConfig,
    TrainingMetrics,
    TrainingStatus,
)
