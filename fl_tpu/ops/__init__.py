"""Pallas TPU kernels + on-device numerics for the hot ops.

The reference's "native tier" is libtorch kernels called from Python loops
(SURVEY.md §2.4: no first-party native code). Here the native tier is Pallas:

- ``ops.dp``         fused per-client clip + Gaussian-noise kernel over the
                     flat parameter vector (the DP hot path)
- ``ops.quantize``   int8/int4 quantization with on-core stochastic rounding
- ``ops.topk``       top-k sparsification (XLA top_k — already optimal)
- ``ops.preprocess`` on-device normalize + CIFAR augmentation (crop/flip)
- ``ops.flatten``    client-stacked pytree <-> (C, D) flat matrix

Every kernel has a pure-jnp reference implementation used on CPU (tests)
and as the numerical oracle; the Pallas path activates on TPU.
"""

from fl_tpu.ops.flatten import stack_flatten, stack_unflatten  # noqa: F401
from fl_tpu.ops.preprocess import make_cifar_augment, normalize_u8  # noqa: F401
