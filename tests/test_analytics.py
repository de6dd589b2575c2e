"""Federated analytics (fl_tpu/fl/analytics.py): DP histograms over the
distributed-Skellam stack, heavy hitters, quantiles, local-DP randomized
response."""

import math

import numpy as np
import pytest

from fl_tpu.fl import analytics as fa


def _population(n_clients=400, domain=64, seed=0):
    """Zipf-ish item population: bucket j has weight ∝ 1/(j+1)."""
    rng = np.random.default_rng(seed)
    w = 1.0 / (np.arange(domain) + 1.0)
    p = w / w.sum()
    return [rng.choice(domain, size=rng.integers(1, 6), p=p)
            for _ in range(n_clients)], p


def test_dp_histogram_estimates_population():
    items, p = _population()
    res = fa.dp_histogram(items, 64, epsilon=4.0, delta=1e-6,
                          max_items_per_client=5, seed=1)
    assert res.participants == 400
    assert res.epsilon <= 4.0 + 1e-9
    total_items = sum(len(x) for x in items)
    # top bucket is ~21% of items; the estimate should land within 5σ + 10%
    top_true = sum((np.asarray(x) == 0).sum() for x in items)
    assert abs(res.counts[0] - top_true) < 5 * res.sigma + 0.1 * top_true
    # overall mass roughly preserved
    assert abs(res.counts.sum() - total_items) < 0.2 * total_items \
        + 8 * res.sigma * math.sqrt(64)


def test_dp_histogram_noise_calibration_and_tradeoff():
    items, _ = _population(n_clients=100)
    tight = fa.dp_histogram(items, 64, epsilon=1.0, max_items_per_client=3,
                            seed=2)
    loose = fa.dp_histogram(items, 64, epsilon=8.0, max_items_per_client=3,
                            seed=2)
    assert tight.sigma > loose.sigma  # more privacy -> more noise
    explicit = fa.dp_histogram(items, 64, noise_scale=50.0,
                               max_items_per_client=3, seed=2)
    assert explicit.sigma == pytest.approx(50.0)
    assert explicit.epsilon > 0


def test_dp_histogram_validation():
    with pytest.raises(ValueError, match="exactly one"):
        fa.dp_histogram([np.array([0])], 4)
    with pytest.raises(ValueError, match="exactly one"):
        fa.dp_histogram([np.array([0])], 4, epsilon=1.0, noise_scale=5.0)
    with pytest.raises(ValueError, match="outside"):
        fa.dp_histogram([np.array([7])], 4, epsilon=1.0)
    with pytest.raises(ValueError, match="at least one client"):
        fa.dp_histogram([], 4, epsilon=1.0)


def test_contribution_cap_bounds_influence():
    """A hoarder client with 10k copies of one item moves the histogram by
    at most the cap — the sensitivity story in practice."""
    base = [np.array([1])] * 50
    hoard = base + [np.full(10_000, 3)]
    res = fa.dp_histogram(hoard, 8, noise_scale=1e-6,
                          max_items_per_client=5, seed=3)
    assert res.counts[3] <= 5 + 1.0  # cap, not 10k


def test_heavy_hitters_recovers_true_hitters_without_false_positives():
    rng = np.random.default_rng(4)
    # items concentrated on buckets {2, 7}; the rest empty
    items = [np.array([2]) if rng.random() < 0.6 else np.array([7])
             for _ in range(600)]
    res = fa.dp_histogram(items, 256, epsilon=4.0, max_items_per_client=1,
                          seed=4)
    hh = fa.heavy_hitters(res, k=10, tau=4.0)
    assert set(hh) == {2, 7}
    assert hh[2] > hh[7]


def test_dp_quantiles_bucketized_domain():
    rng = np.random.default_rng(5)
    values = rng.normal(50, 10, 2000).clip(0, 100)
    edges = np.linspace(0, 100, 101)
    buckets = np.clip(np.digitize(values, edges) - 1, 0, 99)
    items = [np.array([b]) for b in buckets]
    res = fa.dp_histogram(items, 100, epsilon=8.0, max_items_per_client=1,
                          seed=5)
    q = fa.dp_quantiles(res, edges, [0.25, 0.5, 0.75])
    assert abs(q[0.5] - 50) < 5
    assert q[0.25] < q[0.5] < q[0.75]
    with pytest.raises(ValueError, match="edges"):
        fa.dp_quantiles(res, edges[:-5], [0.5])
    with pytest.raises(ValueError, match="outside"):
        fa.dp_quantiles(res, edges, [1.5])


def test_randomized_response_unbiased_and_private():
    rr = fa.RandomizedResponse(domain_size=16, epsilon_local=2.0)
    # response distribution ratios bounded by e^eps (the LDP guarantee)
    assert rr.p_true / rr.p_other == pytest.approx(math.exp(2.0))
    rng = np.random.default_rng(6)
    true_items = rng.integers(0, 16, size=40_000)
    reported = rr.randomize(true_items, rng)
    assert (reported != true_items).mean() > 0.1  # real randomization
    est = rr.estimate_histogram(reported)
    truth = np.bincount(true_items, minlength=16).astype(np.float64)
    assert np.abs(est - truth).max() < 5 * rr.estimator_std(40_000)
    with pytest.raises(ValueError):
        fa.RandomizedResponse(4, 0.0)
