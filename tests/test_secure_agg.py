"""Secure aggregation (pairwise additive masking, fl_tpu.fl.secure_agg)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import prng
from fl_tpu.fl.secure_agg import (
    masked_payloads,
    ring_pair_masks,
    secure_fedavg_delta,
)


def test_ring_masks_cancel_in_sum():
    key = jax.random.PRNGKey(0)
    m = ring_pair_masks(key, num_clients=12, dim=257, neighbors=4, scale=5.0)
    # each pair's noise is added once and subtracted once
    total = np.asarray(m.sum(axis=0))
    assert np.abs(total).max() < 1e-3  # float cancellation only
    # but individual rows are far from zero (each is a sum of 2k draws)
    assert np.abs(np.asarray(m)).max() > 1.0


def test_ring_masks_cancel_under_partial_participation():
    key = jax.random.PRNGKey(1)
    alive = jnp.asarray([1, 0, 1, 1, 0, 1, 1, 1, 0, 1], jnp.float32)
    m = ring_pair_masks(key, 10, 129, neighbors=3, scale=3.0, alive=alive)
    total = np.asarray(m.sum(axis=0))
    assert np.abs(total).max() < 1e-3
    # dropped clients carry no mask at all (they ship nothing)
    dead = np.flatnonzero(np.asarray(alive) == 0)
    assert np.abs(np.asarray(m)[dead]).max() == 0.0


def test_secure_fedavg_matches_plain_fedavg():
    """The server-side mean over masked payloads equals plain weighted
    FedAvg to float-cancellation tolerance."""
    from fl_tpu.fl.fedavg import fedavg_delta

    C = 8
    kg, ks = jax.random.split(jax.random.PRNGKey(2))
    global_vars = {"params": {"w": jax.random.normal(kg, (13, 7)),
                              "b": jax.random.normal(kg, (7,))}}
    stacked = jax.tree.map(
        lambda g: g[None] + 0.01 * jax.random.normal(ks, (C,) + g.shape),
        global_vars,
    )
    num_samples = jnp.asarray([10, 20, 30, 40, 10, 20, 30, 40], jnp.float32)
    mask = jnp.asarray([1, 1, 1, 0, 1, 1, 1, 1], jnp.float32)
    rkey = prng.round_key(prng.root_key(3), jnp.asarray(2))

    plain = fedavg_delta(global_vars, stacked, num_samples, mask)
    secure = secure_fedavg_delta(global_vars, stacked, num_samples, mask,
                                 rkey, neighbors=3, scale=1.0)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(plain),
        jax.tree_util.tree_leaves_with_path(secure),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(pa))


def test_masked_payloads_hide_individual_updates():
    """What the aggregator sees per client is mask-dominated: removing the
    mask changes every client's payload by ~scale, so the raw update is
    not recoverable from a single payload."""
    C = 6
    stacked = {"w": jnp.full((C, 50), 0.001, jnp.float32)}
    n = jnp.full((C,), 10.0)
    mask = jnp.ones((C,), jnp.float32)
    rkey = prng.round_key(prng.root_key(1), jnp.asarray(0))
    payloads, _ = masked_payloads(stacked, n, mask, rkey, neighbors=2,
                                  scale=10.0)
    unmasked = 0.001 * 10.0
    # every payload element is dominated by the mask, not the update
    assert float(jnp.abs(payloads).mean()) > 100 * unmasked


def test_engine_round_with_secure_aggregation():
    """End-to-end: an engine round with secure_aggregation=True produces
    the same global model as without, to masking-cancellation tolerance."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=0)

    def build(secure):
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                seed=11, max_clients=4, secure_aggregation=secure,
                secure_agg_neighbors=2, secure_agg_scale=0.1,
            ),
        )

    mask = np.ones(4, np.float32)
    eng_plain, eng_sec = build(False), build(True)
    r_plain = eng_plain.run_round(mask=mask, evaluate=False)
    r_sec = eng_sec.run_round(mask=mask, evaluate=False)
    assert r_sec.train_loss == pytest.approx(r_plain.train_loss, rel=1e-5)
    w_p, w_s = eng_plain.get_model_weights(), eng_sec.get_model_weights()
    for k in w_p:
        np.testing.assert_allclose(np.asarray(w_s[k]), np.asarray(w_p[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_secure_agg_composes_with_uplink_compression():
    """int8 uplink (with EF) + in-superstep secure aggregation together:
    the round stays close to the plain round (int8 is near-lossless and
    masks cancel), proving the client pipeline
    train -> compress -> mask -> aggregate composes."""
    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=0)

    def build(**kw):
        return FederatedRoundEngine(
            create_model("simple_cnn"), fa,
            RoundEngineConfig(
                training=FederatedTrainingConfig(local_epochs=1,
                                                 batch_size=8),
                seed=12, max_clients=4, **kw),
        )

    mask = np.ones(4, np.float32)
    plain = build()
    combo = build(uplink_compression="int8", secure_aggregation=True,
                  secure_agg_scale=0.05)
    r_p = plain.run_round(mask=mask, evaluate=False)
    r_c = combo.run_round(mask=mask, evaluate=False)
    assert r_c.train_loss == pytest.approx(r_p.train_loss, rel=1e-4)
    w_p, w_c = plain.get_model_weights(), combo.get_model_weights()
    for k in w_p:
        np.testing.assert_allclose(np.asarray(w_c[k]), np.asarray(w_p[k]),
                                   atol=6e-3, err_msg=k)
