"""Device-resident federated data: padded, stacked client shards.

This replaces the reference's per-client torch ``DataLoader`` pipeline
(src/shared/data_loader.py:336-420) with the TPU-native layout: all client
shards are padded to a common ``samples_per_client`` length and stacked into
a single ``(C, N, H, W, ch)`` uint8 array that is placed in HBM **once**.
Local-SGD steps then gather batches on-device (dynamic_slice of a per-epoch
permutation) — zero host↔device traffic during training. Normalization
(and CIFAR augmentation) happens on-device in float32/bfloat16 at batch
granularity, so HBM holds the 4×-smaller uint8 form.

Unequal shard sizes are handled with sample masks (SURVEY.md §7 hard parts):
``num_samples[c]`` gives the true count; padded slots beyond it are masked
out of loss, gradient, and FedAvg weighting.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from fl_tpu.data.datasets import DatasetSplits
from fl_tpu.fl.partition import partition_indices


@dataclasses.dataclass
class FederatedArrays:
    """Stacked client shards, ready for device placement.

    Leaves are numpy on construction; move to device (optionally sharded over
    a mesh's client axis) with :meth:`to_device`.
    """

    images: np.ndarray        # (C, N, H, W, ch) uint8
    labels: np.ndarray        # (C, N) int32
    num_samples: np.ndarray   # (C,) int32 — true (unpadded) counts
    mean: np.ndarray          # (ch,) float32
    std: np.ndarray           # (ch,) float32
    num_classes: int

    @property
    def num_clients(self) -> int:
        return self.images.shape[0]

    @property
    def samples_per_client(self) -> int:
        return self.images.shape[1]

    def to_device(self, mesh=None):
        """Return jnp copies; with a mesh, shard the client axis over it."""
        arrs = (jnp.asarray(self.images), jnp.asarray(self.labels),
                jnp.asarray(self.num_samples))
        if mesh is not None:
            from fl_tpu.core.mesh import client_sharding
            import jax

            sh = client_sharding(mesh)
            arrs = tuple(jax.device_put(a, sh) for a in arrs)
        return dataclasses.replace(
            self, images=arrs[0], labels=arrs[1], num_samples=arrs[2],
            mean=jnp.asarray(self.mean), std=jnp.asarray(self.std),
        )


class FederatedDataset:
    """Host-side per-client view (ref: FederatedDataset,
    src/shared/data_loader.py:23-63)."""

    def __init__(self, splits: DatasetSplits, indices: np.ndarray, client_id: int):
        self.splits = splits
        self.indices = np.asarray(indices, np.int64)
        self.client_id = client_id

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        j = self.indices[i]
        return self.splits.train_images[j], int(self.splits.train_labels[j])

    def get_statistics(self) -> Dict[str, object]:
        """Class histogram + counts (ref: data_loader.py:49-63)."""
        labels = self.splits.train_labels[self.indices]
        hist = np.bincount(labels, minlength=self.splits.num_classes)
        return {
            "client_id": self.client_id,
            "num_samples": int(len(self.indices)),
            "class_distribution": {int(c): int(n) for c, n in enumerate(hist)},
            "num_classes_present": int((hist > 0).sum()),
        }


def make_federated_arrays(
    splits: DatasetSplits,
    num_clients: int,
    strategy: str = "iid",
    alpha: float = 0.5,
    min_samples_per_client: int = 10,
    samples_per_client: Optional[int] = None,
    seed: int = 0,
) -> FederatedArrays:
    """Partition ``splits`` and build the stacked device layout.

    ``samples_per_client`` pads/caps every shard to a fixed static length
    (defaults to the max shard size rounded up to a multiple of 8 for TPU
    sublane alignment). Capping subsamples deterministically; padding
    repeats index 0 but is masked out via ``num_samples``.
    """
    parts: List[np.ndarray] = partition_indices(
        splits.train_labels, num_clients, strategy, alpha,
        min_samples_per_client, seed=seed,
    )
    counts = np.asarray([len(p) for p in parts], np.int32)
    if samples_per_client is None:
        samples_per_client = int(max(8, ((counts.max() + 7) // 8) * 8))
    n = samples_per_client

    img_shape = splits.train_images.shape[1:]
    images = np.zeros((num_clients, n) + img_shape, dtype=np.uint8)
    labels = np.zeros((num_clients, n), dtype=np.int32)
    for c, idx in enumerate(parts):
        take = idx[:n]
        images[c, : len(take)] = splits.train_images[take]
        labels[c, : len(take)] = splits.train_labels[take]
    counts = np.minimum(counts, n).astype(np.int32)

    return FederatedArrays(
        images=images,
        labels=labels,
        num_samples=counts,
        mean=np.asarray(splits.mean, np.float32),
        std=np.asarray(splits.std, np.float32),
        num_classes=splits.num_classes,
    )


def analyze_data_distribution(
    splits: DatasetSplits, parts: Sequence[np.ndarray]
) -> Dict[str, object]:
    """Cross-client distribution statistics (ref: analyze_data_distribution,
    src/shared/data_loader.py:627-670)."""
    sizes = np.asarray([len(p) for p in parts], np.float64)
    hists = np.stack(
        [np.bincount(splits.train_labels[p], minlength=splits.num_classes)
         for p in parts]
    ).astype(np.float64)
    probs = hists / np.maximum(hists.sum(axis=1, keepdims=True), 1.0)
    # mean pairwise total-variation distance as a non-IID-ness score
    C = len(parts)
    tv = 0.0
    pairs = 0
    for i in range(C):
        for j in range(i + 1, C):
            tv += 0.5 * np.abs(probs[i] - probs[j]).sum()
            pairs += 1
    return {
        "num_clients": C,
        "overall_statistics": {
            "total_samples": int(sizes.sum()),
            "min_samples_per_client": int(sizes.min()) if C else 0,
            "max_samples_per_client": int(sizes.max()) if C else 0,
            "mean_samples_per_client": float(sizes.mean()) if C else 0.0,
            "std_samples_per_client": float(sizes.std()) if C else 0.0,
        },
        "class_distributions": hists.astype(int).tolist(),
        "mean_pairwise_tv_distance": float(tv / pairs) if pairs else 0.0,
    }
