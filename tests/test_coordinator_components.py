"""Coordinator control-plane tests: round manager lifecycle, metrics
collection, failure policy engine."""

import time

import numpy as np
import pytest

from fl_tpu.core.types import ModelUpdate, RoundConfig
from fl_tpu.orchestration.failure import (
    FailureAction,
    FailureHandler,
    FailureType,
)
from fl_tpu.orchestration.metrics import MetricsCollector, MetricsTracker
from fl_tpu.orchestration.round_manager import (
    ClientRoundState,
    RoundManager,
    RoundState,
)


def _weights(val=0.0):
    return {"layer/w": np.full((4, 4), val, np.float32)}


def _update(cid, rnd, val, n=100, loss=0.5):
    return ModelUpdate(client_id=cid, round_number=rnd,
                       model_weights=_weights(val), num_samples=n,
                       training_loss=loss)


# --- round manager -----------------------------------------------------------

def make_manager(**kw):
    cfg = RoundConfig(min_clients=2, max_clients=10, timeout_seconds=5)
    return RoundManager(round_config=cfg, **kw)


def test_round_lifecycle_completes():
    m = make_manager()
    for c in ("a", "b", "c"):
        m.register_client(c)
    rnd = m.start_round()
    assert rnd.state == RoundState.IN_PROGRESS
    assert set(rnd.selected_clients) == {"a", "b", "c"}
    m.submit_update(_update("a", 0, 1.0, n=100))
    m.submit_update(_update("b", 0, 3.0, n=300))
    assert m.submit_update(_update("c", 0, 2.0, n=100))
    # all submitted -> aggregation runs synchronously
    assert m.current_round is None
    assert m.round_history[-1].state == RoundState.COMPLETED
    assert m.global_model is not None
    # weighted mean: (100*1 + 300*3 + 100*2)/500 = 2.4
    np.testing.assert_allclose(
        np.asarray(m.global_model.model_weights["layer/w"]), 2.4, rtol=1e-6
    )


def test_round_rejects_stale_and_double_start():
    m = make_manager()
    m.register_client("a")
    m.register_client("b")
    m.start_round()
    assert not m.submit_update(_update("a", 99, 1.0))
    with pytest.raises(RuntimeError, match="already in progress"):
        m.start_round()


def test_round_requires_min_clients():
    m = make_manager()
    m.register_client("only")
    with pytest.raises(RuntimeError, match="not enough clients"):
        m.start_round()


def test_timeout_aggregates_if_min_reached():
    """ref semantics: timed-out round still aggregates when min_clients
    submitted (round_manager.py:630-648)."""
    cfg = RoundConfig(min_clients=2, max_clients=10, timeout_seconds=0)
    m = RoundManager(round_config=cfg)
    for c in ("a", "b", "c"):
        m.register_client(c)
    rnd = m.start_round()
    m.submit_update(_update("a", 0, 1.0))
    m.submit_update(_update("b", 0, 1.0))
    # c never submits; force the timeout path directly
    m._handle_round_timeout(rnd)
    assert m.round_history[-1].state == RoundState.COMPLETED
    assert rnd.client_states["c"] == ClientRoundState.DROPPED


def test_timeout_fails_below_min():
    cfg = RoundConfig(min_clients=2, max_clients=10, timeout_seconds=0)
    m = RoundManager(round_config=cfg)
    failed = []
    m.on_round_failed.append(lambda r: failed.append(r.round_number))
    for c in ("a", "b"):
        m.register_client(c)
    rnd = m.start_round()
    m.submit_update(_update("a", 0, 1.0))
    m._handle_round_timeout(rnd)
    assert m.round_history[-1].state == RoundState.FAILED
    assert failed == [0]


def test_management_loop_auto_start():
    m = make_manager(auto_start=True, tick_interval_s=0.05)
    m.register_client("a")
    m.register_client("b")
    m.start()
    try:
        deadline = time.time() + 3
        while time.time() < deadline and m.current_round is None:
            time.sleep(0.05)
        assert m.current_round is not None
    finally:
        m.stop()


def test_status_reporting():
    m = make_manager()
    for c in ("a", "b"):
        m.register_client(c)
    m.start_round()
    s = m.get_training_status()
    assert s["round_state"] == "in_progress"
    assert s["registered_clients"] == 2
    m.submit_update(_update("a", 0, 1.0))
    m.submit_update(_update("b", 0, 1.0))
    s = m.get_training_status()
    assert s["completed_rounds"] == 1
    assert len(m.get_round_history()) == 1


# --- metrics ------------------------------------------------------------------

def test_metrics_collector_round_flow():
    c = MetricsCollector()
    c.start_round(0)
    c.record_client_update(0, "a", 100, loss=1.0, accuracy=0.5)
    c.record_client_update(0, "b", 300, loss=0.6, accuracy=0.7)
    c.complete_round(0, avg_training_loss=0.7, global_accuracy=0.65,
                     convergence_score=0.1)
    prog = c.get_training_progress()
    assert prog["rounds_completed"] == 1
    assert prog["latest_accuracy"] == pytest.approx(0.65)
    clients = c.get_client_summary()
    assert clients["a"]["rounds_participated"] == 1
    assert clients["b"]["total_samples"] == 300


def test_metrics_eta_estimation():
    c = MetricsCollector()
    t0 = time.time()
    for r in range(6):
        c.start_round(r)
        c.complete_round(r, 1.0 - 0.1 * r, 0.5 + 0.05 * r, 0.1)
    eta = c.get_training_progress()["estimated_completion"]
    # rounds here complete in ~0s, so the ETA can land within rounding of
    # "now" — assert it's sane, not strictly in the future (flaky under
    # machine load otherwise)
    assert eta is None or eta >= t0


def test_metrics_system_sample_and_export(tmp_path):
    c = MetricsCollector()
    s = c.record_system_sample()
    assert s.timestamp > 0
    out = tmp_path / "metrics.json"
    c.export_json(str(out))
    assert out.exists() and out.stat().st_size > 10


def test_metrics_tracker_thread():
    t = MetricsTracker(interval_s=0.05)
    t.start()
    # poll instead of a fixed sleep: under full-suite load the sampler
    # thread may be scheduled late
    deadline = time.time() + 10.0
    while time.time() < deadline and not t.collector.system_metrics:
        time.sleep(0.05)
    t.stop()
    assert len(t.collector.system_metrics) >= 1


# --- failure handler -----------------------------------------------------------

def test_policy_table_actions():
    f = FailureHandler()
    assert f.handle_failure("c1", FailureType.CONNECTION_LOST) == \
        FailureAction.RETRY
    assert f.handle_failure("c2", FailureType.TIMEOUT) == \
        FailureAction.EXCLUDE_ROUND
    assert f.handle_failure("c3", FailureType.RESOURCE_EXHAUSTION) == \
        FailureAction.REDUCE_LOAD


def test_privacy_violation_is_permanent():
    """ref: failure_handler.py:543-544."""
    f = FailureHandler()
    action = f.handle_failure("evil", FailureType.PRIVACY_VIOLATION)
    assert action == FailureAction.EXCLUDE_PERMANENT
    assert "evil" in f.get_excluded_clients()
    assert f.get_healthy_clients(["evil", "good"]) == ["good"]


def test_pattern_escalation():
    """3 same-type failures in the window escalate RETRY→EXCLUDE_TEMPORARY
    (ref: failure_handler.py:181-211)."""
    f = FailureHandler()
    a1 = f.handle_failure("flaky", FailureType.TRAINING_ERROR)
    a2 = f.handle_failure("flaky", FailureType.TRAINING_ERROR)
    a3 = f.handle_failure("flaky", FailureType.TRAINING_ERROR)
    assert a1 == FailureAction.RETRY
    assert a3 == FailureAction.EXCLUDE_TEMPORARY
    del a2


def test_temporary_exclusion_expires():
    f = FailureHandler(temporary_exclusion_s=0.1)
    f.handle_failure("slow", FailureType.PROTOCOL_ERROR)
    assert "slow" in f.get_excluded_clients()
    time.sleep(0.15)
    assert "slow" not in f.get_excluded_clients()


def test_manual_include_exclude():
    f = FailureHandler()
    f.exclude_client("ops", permanent=True)
    assert "ops" in f.get_excluded_clients()
    f.include_client("ops")
    assert "ops" not in f.get_excluded_clients()


def test_success_recovers_health():
    f = FailureHandler()
    f.handle_failure("c", FailureType.TIMEOUT)
    low = f.tracker.get_health("c")["health_score"]
    for _ in range(5):
        f.record_success("c")
    assert f.tracker.get_health("c")["health_score"] > low


def test_failure_statistics():
    f = FailureHandler()
    f.handle_failure("a", FailureType.TIMEOUT)
    f.handle_failure("b", FailureType.PRIVACY_VIOLATION)
    stats = f.get_failure_statistics()
    assert stats["total_failures"] == 2
    assert stats["by_type"]["timeout"] == 1
    assert "exclude_permanent" in stats["by_action"]
