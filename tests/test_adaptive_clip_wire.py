"""Wire adaptive clipping (VERDICT r3 #8): Andrew et al. 2021 over the
deployment gRPC path.

The on-chip engine has had adaptive clipping since round 3
(round_engine.py adaptive_clip_* knobs, tests/test_adaptive_clip.py); this
suite covers the DEPLOYMENT twin: FederatedTrainer clips to the
coordinator-broadcast C, noises its delta at the inflated z_delta (Thm 1)
and ships a locally-DP-noised clipped-count indicator in
training_metrics.additional_metrics; FederatedLearningServicer runs the
public geometric quantile tracker and broadcasts the moved C in the next
RoundConfig. (ref has no adaptive clipping at all — capability extension;
wire carrier is the proto's existing additional_metrics map,
proto/federated_learning.proto:151, so the interop contract is unchanged.)
"""

import math
import time

import numpy as np
import pytest

from fl_tpu.core.types import (
    ModelUpdate,
    PrivacyConfig,
    RoundConfig,
    TrainingMetrics,
)
from fl_tpu.services.grpc_client import FederatedLearningClient
from fl_tpu.services.grpc_server import (
    CoordinatorGRPCServer,
    FederatedLearningServicer,
)

# eps=8 per noising op: z = sqrt(2 ln(1.25/delta))/eps ~ 0.6, so the
# default sigma_b=0.5 satisfies Thm 1's 2*sigma_b > z feasibility
PC = PrivacyConfig(epsilon=8.0, delta=1e-5, max_grad_norm=4.0)


def _metrics(indicator=None):
    extra = ({} if indicator is None
             else {"adaptive_clip_indicator": float(indicator),
                   "adaptive_clip_norm": 4.0})
    return TrainingMetrics(loss=0.5, accuracy=0.8, epochs_completed=1,
                           training_time=0.1, samples_processed=64,
                           additional_metrics=extra)


def _run_one_wire_round(servicer, port, indicators):
    """Register + join + submit one raw update per indicator; wait for the
    aggregation to advance the round. Returns the round that aggregated."""
    clients = []
    try:
        for i in range(len(indicators)):
            c = FederatedLearningClient(host="127.0.0.1", port=port,
                                        client_id=f"ac_{i}", timeout_s=10.0)
            c.connect()
            clients.append(c)
        rnd = None
        for c, ind in zip(clients, indicators):
            c.join_training_round()
            gm = c.get_global_model()
            rnd = gm.round_number
            w = {k: np.asarray(v) for k, v in gm.model_weights.items()}
            r = c.submit_model_update(ModelUpdate(
                client_id=c.client_id, round_number=rnd,
                model_weights={k: v + 0.01 for k, v in w.items()},
                num_samples=64, training_loss=0.5,
                training_metrics=_metrics(ind)))
            assert r["success"], r["message"]
        deadline = time.time() + 30
        while time.time() < deadline:
            if clients[0].get_training_status().current_round == rnd + 1:
                return rnd
            time.sleep(0.1)
        pytest.fail("aggregation did not advance the round")
    finally:
        for c in clients:
            c.close()


@pytest.fixture()
def adaptive_server():
    servicer = FederatedLearningServicer(
        round_config=RoundConfig(min_clients=2, max_clients=4,
                                 local_epochs=1, privacy_config=PC),
        adaptive_clipping=True, clip_target_quantile=0.5,
        clip_learning_rate=0.2, clip_count_stddev=0.5,
    )
    srv = CoordinatorGRPCServer(servicer, host="127.0.0.1", port=0)
    port = srv.start()
    yield servicer, port
    srv.stop()


def test_geometric_update_matches_reference_rule_and_broadcasts(
        adaptive_server):
    """Both clients report clipped (indicator 1.0) -> fraction 1 > gamma
    -> C shrinks by exactly exp(-eta*(1-gamma)), matching the tested
    on-chip geometric_clip_update, and the NEXT round config broadcasts
    the moved C to clients."""
    servicer, port = adaptive_server
    c0 = float(servicer.round_config.privacy_config.max_grad_norm)
    _run_one_wire_round(servicer, port, [1.0, 1.0])

    expected = c0 * math.exp(-0.2 * (1.0 - 0.5))
    got = float(servicer.round_config.privacy_config.max_grad_norm)
    assert got == pytest.approx(expected, rel=1e-12)

    # host rule == the tested on-chip rule (no drift between the twins)
    from fl_tpu.fl.privacy import geometric_clip_update
    import jax.numpy as jnp

    assert got == pytest.approx(float(geometric_clip_update(
        jnp.float32(c0), jnp.float32(1.0), 0.5, 0.2)), rel=1e-6)

    # the broadcast channel carries the moved C
    c = FederatedLearningClient(host="127.0.0.1", port=port,
                                client_id="probe", timeout_s=10.0)
    c.connect()
    try:
        cfg = c.get_round_config()
        assert cfg.privacy_config.max_grad_norm == pytest.approx(
            expected, rel=1e-6)
    finally:
        c.close()
    assert servicer.metrics_history["clip_norm"][-1][1] == pytest.approx(
        expected, rel=1e-12)


def test_unclipped_fleet_grows_c_and_validator_bound_tracks(adaptive_server):
    """Indicators 0.0 (norms above C) grow C; the auto-validator's |w|
    bound moves with z_delta * C so larger legitimate DP noise is not
    rejected."""
    servicer, port = adaptive_server
    c0 = float(servicer.round_config.privacy_config.max_grad_norm)
    bound0 = servicer.aggregator.validator.max_abs_weight
    _run_one_wire_round(servicer, port, [0.0, 0.0])
    c1 = float(servicer.round_config.privacy_config.max_grad_norm)
    assert c1 == pytest.approx(c0 * math.exp(0.2 * 0.5), rel=1e-12)

    from fl_tpu.fl.privacy import adaptive_clip_delta_multiplier

    z = math.sqrt(2 * math.log(1.25 / PC.delta)) / PC.epsilon
    z_delta = adaptive_clip_delta_multiplier(z, 0.5)
    assert servicer.aggregator.validator.max_abs_weight == pytest.approx(
        10.0 + 8.0 * z_delta * c1, rel=1e-9)
    assert servicer.aggregator.validator.max_abs_weight != bound0


def test_mixed_fleet_without_indicators_leaves_c_untouched(adaptive_server):
    """Legacy clients (no indicator metric) must not steer C: silence is
    not a quantile observation."""
    servicer, port = adaptive_server
    c0 = float(servicer.round_config.privacy_config.max_grad_norm)
    _run_one_wire_round(servicer, port, [None, None])
    assert float(servicer.round_config.privacy_config.max_grad_norm) == c0
    assert "clip_norm" not in servicer.metrics_history \
        or not servicer.metrics_history["clip_norm"]


def test_servicer_refusals():
    base = RoundConfig(min_clients=2, privacy_config=PC)
    with pytest.raises(ValueError, match="privacy_config"):
        FederatedLearningServicer(round_config=RoundConfig(min_clients=2),
                                  adaptive_clipping=True)
    with pytest.raises(ValueError, match="secure_aggregation"):
        FederatedLearningServicer(round_config=base, adaptive_clipping=True,
                                  secure_aggregation=True)
    with pytest.raises(ValueError, match="distributed_dp"):
        FederatedLearningServicer(round_config=base, adaptive_clipping=True,
                                  secure_aggregation=True,
                                  distributed_dp=True)
    with pytest.raises(ValueError, match="quantile"):
        FederatedLearningServicer(round_config=base, adaptive_clipping=True,
                                  clip_target_quantile=1.5)
    # Thm 1 feasibility (2 sigma_b > z) enforced at construction
    from fl_tpu.fl.privacy import PrivacyError

    tight = RoundConfig(min_clients=2, privacy_config=PrivacyConfig(
        epsilon=0.1, delta=1e-5, max_grad_norm=1.0))  # z ~ 48
    with pytest.raises(PrivacyError, match="infeasible"):
        FederatedLearningServicer(round_config=tight, adaptive_clipping=True,
                                  clip_count_stddev=0.5)


def test_client_refusals():
    from fl_tpu.services.federated_trainer import FederatedTrainer

    with pytest.raises(ValueError, match="PrivacyConfig"):
        FederatedTrainer(client_id="x", adaptive_clipping=True)
    with pytest.raises(ValueError, match="secure_aggregation"):
        FederatedTrainer(client_id="x", privacy=PC, adaptive_clipping=True,
                         secure_aggregation=True)
    with pytest.raises(ValueError, match="distributed_dp"):
        FederatedTrainer(client_id="x", privacy=PC, adaptive_clipping=True,
                         secure_aggregation=True, distributed_dp=True)


def test_additional_metrics_round_trip_through_proto():
    """The indicator rides the proto's map<string,double> untouched."""
    from fl_tpu.services.grpc_utils import ProtobufConverter

    conv = ProtobufConverter()
    up = ModelUpdate(client_id="c", round_number=3,
                     model_weights={"w": np.ones((2, 2), np.float32)},
                     num_samples=10, training_loss=0.4,
                     training_metrics=_metrics(0.875))
    back = conv.model_update_from_proto(conv.model_update_to_proto(up))
    assert back.training_metrics.additional_metrics[
        "adaptive_clip_indicator"] == pytest.approx(0.875)
    assert back.training_metrics.additional_metrics[
        "adaptive_clip_norm"] == pytest.approx(4.0)


def test_adaptive_clip_wire_e2e():
    """Full deployment loop: 2 FederatedTrainer FSMs x 2 rounds against a
    live coordinator. Start C far above every delta norm -> every client
    reports (noisily) clipped -> C decreases after each aggregation, and
    clients clip round 2's delta to the round-2 broadcast C."""
    from fl_tpu.orchestration.simulation import (
        FederatedLearningSimulation,
        SimulationConfig,
    )

    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=2,
        target_accuracy=0.999, backend="grpc",
        n_train_synth=128, n_test_synth=32,
        local_epochs=1, batch_size=8,
        privacy_epsilon=16.0, dp_mode="delta", timeout_s=300,
        heterogeneous_clients=False,
        max_grad_norm=100.0,  # >> any 1-epoch tiny-model delta norm
        # sigma_b=0.4 sits just above the Thm-1 feasibility floor for
        # round 2's z (2*sigma_b > 0.623). dp_noise_seed is the explicit
        # test-only determinism hook: it injects fixed per-client DP
        # secrets so the indicator noise realization repeats run to run.
        # Production clients draw secrets from os.urandom — DP noise must
        # NOT be derivable from the public client_id.
        dp_noise_seed=7,
        adaptive_clipping=True, clip_count_stddev=0.4,
        clip_target_quantile=0.5, clip_learning_rate=0.2,
    ))
    results = sim.run_simulation()
    assert results["rounds_completed"] >= 2
    history = results.get("clip_norm_history") or []
    assert len(history) >= 2, "C must move after every aggregation"
    assert history[0] < 100.0  # fraction ~ 1 -> shrink
    assert history[1] < history[0]  # keeps shrinking while C >> norms
