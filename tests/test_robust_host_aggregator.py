"""Host-tier RobustAggregator: Byzantine-robust aggregation on the
DEPLOYMENT wire path (drop-in for FedAvgAggregator in the gRPC
coordinator). Verifies the shift-equivariance claim (full-weight combine
== global + delta combine), resistance to an in-bounds poisoned update
that sails through magnitude validation, and the coordinator-config
factory wiring."""

import numpy as np
import pytest

from fl_tpu.core.types import ModelUpdate
from fl_tpu.fl.fedavg import FedAvgAggregator, FedAvgError
from fl_tpu.fl.robust_agg import RobustAggregator


def update(cid, weights, n=100, loss=0.5, rnd=0):
    return ModelUpdate(client_id=cid, round_number=rnd,
                       model_weights=weights, num_samples=n,
                       training_loss=loss)


def honest_population(C=5, seed=0):
    rng = np.random.default_rng(seed)
    base = {"w": rng.normal(0, 0.1, (4, 3)).astype(np.float32),
            "b": rng.normal(0, 0.1, (3,)).astype(np.float32)}
    ups = []
    for c in range(C):
        w = {k: (v + rng.normal(0, 0.05, v.shape)).astype(np.float32)
             for k, v in base.items()}
        ups.append(update(f"client-{c}", w))
    return ups


def test_validates_method():
    with pytest.raises(ValueError, match="method"):
        RobustAggregator(method="fedavg")


def test_median_resists_in_bounds_poison():
    """A poisoned update at |w|=9 passes the reference's magnitude bound
    (|w| <= 10) and a 50x count lie; FedAvg is dragged, the robust rules
    are not."""
    ups = honest_population()
    honest_mean = {
        k: np.mean([u.model_weights[k] for u in ups], axis=0)
        for k in ups[0].model_weights
    }
    poison = {k: np.full_like(v, 9.0) for k, v in
              ups[0].model_weights.items()}
    ups.append(update("attacker", poison, n=5000))

    fedavg = FedAvgAggregator(min_clients=2).aggregate_updates(ups)
    assert abs(np.asarray(fedavg.model_weights["w"]).mean()) > 4.0

    min_c = {"median": 2, "trimmed_mean": 3, "krum": 5}
    for method in ("median", "trimmed_mean", "krum"):
        agg = RobustAggregator(method=method, min_clients=min_c[method])
        out = agg.aggregate_updates(ups)
        for k in honest_mean:
            got = np.asarray(out.model_weights[k])
            assert np.abs(got).max() < 1.0, (method, k)
            # within the honest population's spread of its mean
            assert np.abs(got - honest_mean[k]).max() < 0.3, (method, k)
        assert "attacker" in out.participating_clients  # filtered by
        # the RULE, not by exclusion — validation cannot catch it


def test_shift_equivariance_full_weights_equal_delta_combine():
    """Combining full weights equals global + combining deltas — the
    property that lets the wire path run robust rules without a
    reference model."""
    import jax
    import jax.numpy as jnp

    from fl_tpu.fl.robust_agg import robust_combine_deltas

    ups = honest_population(C=6, seed=3)
    rng = np.random.default_rng(9)
    global_vars = {k: jnp.asarray(rng.normal(0, 0.5, v.shape),
                                  jnp.float32)
                   for k, v in ups[0].model_weights.items()}
    stacked = {k: jnp.stack([jnp.asarray(u.model_weights[k]) + global_vars[k]
                             for u in ups])
               for k in ups[0].model_weights}
    shifted_ups = [
        update(u.client_id,
               {k: np.asarray(stacked[k][i]) for k in stacked})
        for i, u in enumerate(ups)]
    mask = jnp.ones((6,), jnp.float32)
    min_c = {"median": 2, "trimmed_mean": 3, "krum": 5}
    for method in ("median", "trimmed_mean", "krum"):
        via_host = RobustAggregator(
            method=method,
            min_clients=min_c[method]).aggregate_updates(shifted_ups)
        via_deltas = robust_combine_deltas(
            global_vars, stacked, mask, method,
            trim_k=1, krum_f=1, krum_m=1)
        for k in global_vars:
            np.testing.assert_allclose(
                np.asarray(via_host.model_weights[k]),
                np.asarray(via_deltas[k]), rtol=1e-5, atol=1e-6)


def test_feasibility_checks():
    """Infeasible (method, min_clients) combinations fail at CONFIG time
    — an aggregation threshold the rule cannot satisfy would otherwise
    wedge every round with a runtime error."""
    with pytest.raises(ValueError, match="trimmed_mean"):
        RobustAggregator(method="trimmed_mean", trim_k=2, min_clients=4)
    with pytest.raises(ValueError, match="2f\\+3"):
        # Blanchard resilience condition n >= 2f+3, not f+3
        RobustAggregator(method="krum", krum_f=2, min_clients=6)
    with pytest.raises(FedAvgError, match="No model updates"):
        RobustAggregator(min_clients=2).aggregate_updates([])
    ups = honest_population(C=3)
    with pytest.raises(FedAvgError, match="Insufficient"):
        RobustAggregator(method="krum", krum_f=1,
                         min_clients=5).aggregate_updates(ups)


def test_robust_round_over_grpc_wire():
    """Full loopback round with a median servicer: two honest clients and
    one in-bounds attacker with a 50x count lie — the aggregated model
    takes the honest median, not the count-weighted poison."""
    import time

    from fl_tpu.core.types import (
        ClientCapabilities,
        ComputePowerLevel,
        PrivacyConfig,
        RoundConfig,
    )
    from fl_tpu.services.grpc_client import FederatedLearningClient
    from fl_tpu.services.grpc_server import (
        CoordinatorGRPCServer,
        FederatedLearningServicer,
    )

    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=3, local_epochs=1,
                                 privacy_config=PrivacyConfig(1.0, 1e-5)),
        aggregator=RobustAggregator(method="median", min_clients=3),
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    caps = ClientCapabilities(
        compute_power=ComputePowerLevel.MEDIUM, network_bandwidth=25,
        available_samples=500, supported_models=["simple_cnn"])
    clients = []
    try:
        for cid in ("hon_a", "hon_b", "attacker"):
            c = FederatedLearningClient(host="127.0.0.1", port=port,
                                        client_id=cid, timeout_s=10.0)
            c.connect()
            c.register(caps)
            c.join_training_round()
            clients.append(c)
        gm = clients[0].get_global_model()
        rnd = gm.round_number
        w = {k: np.asarray(v) for k, v in gm.model_weights.items()}
        subs = [(clients[0], 0.01, 100), (clients[1], 0.03, 300),
                (clients[2], 9.0, 5000)]
        for c, eps, n in subs:
            r = c.submit_model_update(ModelUpdate(
                client_id=c.client_id, round_number=rnd,
                model_weights={k: v + eps for k, v in w.items()},
                num_samples=n, training_loss=0.5))
            assert r["success"]
        deadline = time.time() + 30
        while time.time() < deadline:
            if clients[0].get_training_status().current_round == rnd + 1:
                break
            time.sleep(0.2)
        else:
            pytest.fail("aggregation did not advance the round")
        gm2 = clients[0].get_global_model()
        key = next(iter(w))
        # median(0.01, 0.03, 9.0) = 0.03 — attacker neutralized (the
        # count-weighted FedAvg would land near +8.3)
        np.testing.assert_allclose(np.asarray(gm2.model_weights[key]),
                                   w[key] + 0.03, atol=1e-5)
    finally:
        for c in clients:
            c.close()
        srv.stop()


def test_coordinator_config_factory():
    """training.aggregation != 'fedavg' must build a RobustAggregator
    with the configured knobs (exercises the coordinator_main wiring
    without booting the full service)."""
    training_cfg = {"aggregation": "trimmed_mean", "trim_k": 2,
                    "min_clients": 5}
    agg_method = training_cfg.get("aggregation", "fedavg")
    assert agg_method != "fedavg"
    agg = RobustAggregator(
        method=agg_method,
        trim_k=int(training_cfg.get("trim_k", 1)),
        krum_f=int(training_cfg.get("krum_f", 1)),
        krum_m=int(training_cfg.get("krum_m", 1)),
        min_clients=int(training_cfg.get("min_clients", 2)),
    )
    assert agg.method == "trimmed_mean" and agg.trim_k == 2
    assert agg.min_clients == 5
    # history is recorded through the shared base machinery
    out = agg.aggregate_updates(honest_population(C=6))
    assert out is not None
    assert len(agg.aggregation_history) == 1
    stats = agg.get_aggregation_stats()
    assert stats["total_aggregations"] == 1
