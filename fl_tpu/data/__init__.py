"""Datasets and device-resident federated shards.

Parity target: src/shared/data_loader.py (MNIST/CIFAR-10 loaders with
normalization + augmentation, federated partitioning, distribution
analysis). The TPU-native difference: instead of per-client torch
``DataLoader`` iterators feeding host→device copies every batch
(ref :356-362), all client shards are padded to a common length, stacked
into one ``(C, N, H, W, ch)`` array, placed in HBM once, and indexed
on-device for every local step.
"""

from fl_tpu.data.datasets import (  # noqa: F401
    DatasetSplits,
    load_dataset,
    MNIST_MEAN,
    MNIST_STD,
    CIFAR10_MEAN,
    CIFAR10_STD,
)
from fl_tpu.data.federated import (  # noqa: F401
    FederatedArrays,
    FederatedDataset,
    analyze_data_distribution,
    make_federated_arrays,
)
from fl_tpu.data.loader import create_data_loader, FederatedDataLoader  # noqa: F401
