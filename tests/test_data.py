"""Data layer tests: partition semantics, synthetic dataset learnability
preconditions, federated array layout, distribution analysis."""

import numpy as np
import pytest

from fl_tpu.data import (
    analyze_data_distribution,
    create_data_loader,
    load_dataset,
    make_federated_arrays,
)
from fl_tpu.fl.partition import DataPartitioner, partition_indices


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=2000, n_test_synth=400)


def test_iid_partition_covers_all(mnist):
    parts = partition_indices(mnist.train_labels, 10, "iid", seed=0)
    allidx = np.concatenate(parts)
    assert len(allidx) == len(mnist.train_labels)
    assert len(np.unique(allidx)) == len(allidx)  # disjoint
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 10  # near-even


def test_dirichlet_partition_skews(mnist):
    parts = partition_indices(mnist.train_labels, 10, "non_iid", alpha=0.1,
                              min_samples_per_client=1, seed=0)
    hists = np.stack(
        [np.bincount(mnist.train_labels[p], minlength=10) for p in parts]
    )
    # with alpha=0.1 each client should be dominated by few classes
    probs = hists / np.maximum(hists.sum(1, keepdims=True), 1)
    assert (probs.max(axis=1) > 0.3).mean() > 0.5
    # min-samples floor respected in expectation: every client nonempty
    assert all(len(p) > 0 for p in parts)


def test_pathological_partition_limits_classes(mnist):
    parts = partition_indices(mnist.train_labels, 5, "pathological", seed=0)
    for p in parts:
        present = np.unique(mnist.train_labels[p])
        assert len(present) <= 2


def test_partition_deterministic(mnist):
    a = partition_indices(mnist.train_labels, 4, "non_iid", seed=7)
    b = partition_indices(mnist.train_labels, 4, "non_iid", seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = partition_indices(mnist.train_labels, 4, "non_iid", seed=8)
    assert any(len(x) != len(y) or not np.array_equal(x, y) for x, y in zip(a, c))


def test_unknown_strategy_raises(mnist):
    with pytest.raises(ValueError):
        partition_indices(mnist.train_labels, 4, "bogus")


def test_synthetic_mnist_structure(mnist):
    assert mnist.train_images.shape[1:] == (28, 28, 1)
    assert mnist.train_images.dtype == np.uint8
    assert set(np.unique(mnist.train_labels)) <= set(range(10))
    # classes are visually distinct: per-class mean images differ
    means = np.stack(
        [mnist.train_images[mnist.train_labels == c].mean(0) for c in range(10)]
    )
    dists = np.abs(means[:, None] - means[None, :]).mean((-1, -2, -3))
    assert dists[np.triu_indices(10, 1)].min() > 1.0


def test_normalization_matches_reference_constants(mnist):
    x = mnist.normalized(mnist.train_images[:16])
    assert x.dtype == np.float32
    # invert: x*std+mean should be in [0,1]
    inv = x * np.asarray(mnist.std) + np.asarray(mnist.mean)
    assert inv.min() >= -1e-5 and inv.max() <= 1.0 + 1e-5


def test_federated_arrays_layout(mnist):
    fa = make_federated_arrays(mnist, num_clients=8, strategy="iid", seed=0)
    assert fa.images.shape[0] == 8
    assert fa.images.shape[1] % 8 == 0  # sublane-aligned padding
    assert fa.labels.shape == fa.images.shape[:2]
    assert (fa.num_samples <= fa.samples_per_client).all()
    # padded region is masked: counts reflect true sizes
    assert int(fa.num_samples.sum()) <= len(mnist.train_labels)


def test_loader_facade(mnist):
    loader = create_data_loader("mnist", num_clients=4, n_train_synth=2000,
                                n_test_synth=400)
    stats = loader.get_client_statistics()
    assert len(stats) == 4
    assert sum(s["num_samples"] for s in stats.values()) == 2000
    ds = loader.get_client_dataset(0)
    img, label = ds[0]
    assert img.shape == (28, 28, 1) and 0 <= label < 10
    x, y = loader.get_test_set()
    assert x.shape[0] == len(y) == 400
    analysis = loader.analyze_distribution()
    assert analysis["overall_statistics"]["total_samples"] == 2000


def test_distribution_analysis_tv_distance(mnist):
    iid = partition_indices(mnist.train_labels, 6, "iid", seed=0)
    noniid = partition_indices(mnist.train_labels, 6, "non_iid", alpha=0.1, seed=0)
    a = analyze_data_distribution(mnist, iid)
    b = analyze_data_distribution(mnist, noniid)
    assert b["mean_pairwise_tv_distance"] > a["mean_pairwise_tv_distance"]


def test_partitioner_facade(mnist):
    p = DataPartitioner(mnist.train_labels, 5, "iid", seed=0)
    stats = p.get_partition_statistics()
    assert stats["min_samples_per_client"] > 0
    assert len(p.get_client_indices(0)) > 0


def test_cifar_synthetic():
    c = load_dataset("cifar10", n_train_synth=500, n_test_synth=100)
    assert c.train_images.shape == (500, 32, 32, 3)
    assert c.num_classes == 10
