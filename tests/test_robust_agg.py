"""Byzantine-robust aggregation (fl_tpu.fl.robust_agg)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.fl.robust_agg import (
    krum_matrix,
    median_matrix,
    robust_combine_deltas,
    trimmed_mean_matrix,
)


def test_trimmed_mean_drops_extremes():
    mat = jnp.asarray([[1.0, 10.0],
                       [2.0, 20.0],
                       [3.0, 30.0],
                       [4.0, 40.0],
                       [100.0, -500.0]], jnp.float32)  # poisoned row
    mask = jnp.ones(5, jnp.float32)
    out = np.asarray(trimmed_mean_matrix(mat, mask, trim_k=1))
    # per coord: drop min+max, mean of the middle three
    np.testing.assert_allclose(out, [(2 + 3 + 4) / 3, (10 + 20 + 30) / 3],
                               rtol=1e-6)


def test_trimmed_mean_respects_participation_mask():
    mat = jnp.asarray([[1.0], [2.0], [3.0], [1e9], [4.0]], jnp.float32)
    mask = jnp.asarray([1, 1, 1, 0, 1], jnp.float32)  # the 1e9 row is absent
    out = np.asarray(trimmed_mean_matrix(mat, mask, trim_k=1))
    np.testing.assert_allclose(out, [(2 + 3) / 2], rtol=1e-6)


def test_median_odd_and_even_counts():
    mat = jnp.asarray([[1.0], [5.0], [3.0], [9.0], [7.0]], jnp.float32)
    assert float(median_matrix(mat, jnp.ones(5))[0]) == 5.0
    mask = jnp.asarray([1, 1, 1, 1, 0], jnp.float32)  # {1,5,3,9} -> 4.0
    assert float(median_matrix(mat, mask)[0]) == 4.0


def test_krum_rejects_the_outlier():
    rng = np.random.default_rng(0)
    honest = rng.normal(0, 0.1, (6, 16)).astype(np.float32)
    poisoned = np.concatenate([honest, 50.0 * np.ones((1, 16), np.float32)])
    mat = jnp.asarray(poisoned)
    out = np.asarray(krum_matrix(mat, jnp.ones(7), f=1, m_select=1))
    # the selected update is one of the honest cluster, never the outlier
    dists = np.linalg.norm(honest - out, axis=1)
    assert dists.min() < 1e-5
    assert np.linalg.norm(out - 50.0) > 100


def test_krum_ignores_masked_clients():
    rng = np.random.default_rng(1)
    honest = rng.normal(0, 0.1, (5, 8)).astype(np.float32)
    mat = jnp.asarray(np.concatenate(
        [honest, 99.0 * np.ones((1, 8), np.float32)]))
    mask = jnp.asarray([1, 1, 1, 1, 1, 0], jnp.float32)
    out = np.asarray(krum_matrix(mat, mask, f=1, m_select=2))
    assert np.abs(out).max() < 1.0  # nowhere near the masked 99-row


def test_robust_combine_bounds_poisoned_influence_vs_fedavg():
    """A poisoned client with a huge delta (and a forged sample count)
    steers plain FedAvg arbitrarily but moves the trimmed mean only within
    the honest range."""
    from fl_tpu.fl.fedavg import fedavg_delta

    C = 6
    g = {"params": {"w": jnp.zeros((4, 4), jnp.float32)}}
    honest_delta = 0.01
    stacked = {"params": {"w": jnp.full((C, 4, 4), honest_delta)}}
    stacked["params"]["w"] = stacked["params"]["w"].at[0].set(1e4)
    n = jnp.asarray([100000, 10, 10, 10, 10, 10], jnp.float32)  # forged
    mask = jnp.ones(C, jnp.float32)

    naive = fedavg_delta(g, stacked, n, mask)
    robust = robust_combine_deltas(g, stacked, mask, "trimmed_mean",
                                   trim_k=1)
    assert float(jnp.abs(naive["params"]["w"]).max()) > 100
    np.testing.assert_allclose(np.asarray(robust["params"]["w"]),
                               honest_delta, rtol=1e-4)


def test_engine_round_with_robust_aggregation():
    """End-to-end: a trimmed-mean engine round with one poisoned client
    stays finite and close to the all-honest FedAvg result."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=0)
    eng = FederatedRoundEngine(
        create_model("simple_cnn"), fa,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            seed=3, max_clients=4, aggregation="trimmed_mean", trim_k=1,
        ),
    )
    r = eng.run_round(mask=np.ones(4, np.float32), evaluate=False)
    assert np.isfinite(r.train_loss)
    w = eng.get_model_weights()
    assert all(np.isfinite(np.asarray(v)).all() for v in w.values())


def test_engine_config_validation():
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=128, n_test_synth=32)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)

    def build(**kw):
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8), **kw),
        )

    with pytest.raises(ValueError, match="aggregation="):
        build(aggregation="mean_of_medians")
    with pytest.raises(ValueError, match="secure_aggregation"):
        build(aggregation="median", secure_aggregation=True)
    with pytest.raises(ValueError, match="participants"):
        build(aggregation="trimmed_mean", trim_k=1)  # 2 clients, needs >2
