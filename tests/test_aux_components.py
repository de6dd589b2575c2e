"""Tests for auxiliary subsystems: privacy config manager, logging,
monitoring/alerts, error tracking, database persistence, capability
adaptation."""

import json
import logging
import time

import pytest

from fl_tpu.core.types import ComputePowerLevel, PrivacyConfig
from fl_tpu.fl.privacy_config import (
    PRIVACY_PRESETS,
    PrivacyConfigManager,
    PrivacyLevel,
    compare_privacy_configs,
    create_privacy_config_for_dataset,
)
from fl_tpu.services.capability_adapter import (
    CapabilityAdapter,
    ResourceMetrics,
)
from fl_tpu.services.database import init_database
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.utils.error_tracking import (
    ErrorCategory,
    ErrorHandler,
    ErrorSeverity,
    ErrorTracker,
)
from fl_tpu.utils.logging_config import (
    JSONFormatter,
    MetricsLogger,
    log_federated_event,
    setup_logging,
)
from fl_tpu.utils.monitoring import (
    AlertManager,
    AlertRule,
    PerformanceMonitor,
    collect_system_metrics,
)


# --- privacy config -----------------------------------------------------------

def test_presets_match_reference():
    """HIGH(0.5,1e-6)/MEDIUM(1.0,1e-5)/LOW(3.0,1e-4)
    (ref privacy_config.py:44-63)."""
    assert PRIVACY_PRESETS[PrivacyLevel.HIGH]["epsilon"] == 0.5
    assert PRIVACY_PRESETS[PrivacyLevel.HIGH]["delta"] == 1e-6
    assert PRIVACY_PRESETS[PrivacyLevel.MEDIUM]["epsilon"] == 1.0
    assert PRIVACY_PRESETS[PrivacyLevel.LOW]["epsilon"] == 3.0
    mgr = PrivacyConfigManager()
    cfg = mgr.create_config(PrivacyLevel.HIGH)
    assert cfg.epsilon == 0.5 and cfg.noise_multiplier == 2.0


def test_create_config_with_overrides():
    mgr = PrivacyConfigManager()
    cfg = mgr.create_config(PrivacyLevel.MEDIUM, epsilon=0.7)
    assert cfg.epsilon == 0.7 and cfg.delta == 1e-5


def test_optimize_for_accuracy_scales_down_with_rounds():
    mgr = PrivacyConfigManager()
    few = mgr.optimize_for_accuracy(0.91, 60_000, num_rounds=4)
    many = mgr.optimize_for_accuracy(0.91, 60_000, num_rounds=100)
    assert many.epsilon < few.epsilon


def test_tradeoff_analysis_monotone():
    mgr = PrivacyConfigManager()
    rows = mgr.analyze_privacy_utility_tradeoff([0.5, 1.0, 5.0])
    sigmas = [r["noise_sigma"] for r in rows]
    assert sigmas[0] > sigmas[1] > sigmas[2]
    assert rows[0]["privacy_strength"] == "strong"


def test_validate_config():
    mgr = PrivacyConfigManager()
    ok = mgr.validate_config(PrivacyConfig(1.0, 1e-5))
    assert ok["valid"] and not ok["issues"]
    weak = mgr.validate_config(PrivacyConfig(20.0, 1e-2))
    assert weak["valid"] and len(weak["warnings"]) >= 2


@pytest.mark.parametrize("suffix", [".yaml", ".json"])
def test_save_load_roundtrip(tmp_path, suffix):
    mgr = PrivacyConfigManager()
    cfg = mgr.create_config(PrivacyLevel.LOW)
    path = str(tmp_path / f"privacy{suffix}")
    mgr.save_config(cfg, path)
    loaded = PrivacyConfigManager().load_config(path)
    assert loaded == cfg


def test_dataset_config_and_comparison():
    mnist = create_privacy_config_for_dataset("mnist")
    cifar = create_privacy_config_for_dataset("cifar10")
    assert cifar.epsilon > mnist.epsilon  # harder task gets more budget
    cmp = compare_privacy_configs({"mnist": mnist, "cifar": cifar})
    assert cmp["strongest"] == "mnist"


# --- logging --------------------------------------------------------------------

def test_json_formatter_carries_context():
    fmt = JSONFormatter("test-svc")
    rec = logging.LogRecord("fl.x", logging.INFO, __file__, 1, "hello %s",
                            ("world",), None)
    rec.client_id = "c9"
    rec.round_number = 4
    out = json.loads(fmt.format(rec))
    assert out["message"] == "hello world"
    assert out["client_id"] == "c9" and out["round_number"] == 4
    assert out["service"] == "test-svc"


def test_setup_logging_writes_rotating_files(tmp_path):
    log_file = tmp_path / "svc.log"
    root = setup_logging(level="INFO", log_file=str(log_file),
                         service_name="t")
    logger = logging.getLogger("fl.test")
    log_federated_event(logger, "round_started", client_id="c1",
                        round_number=2, loss=0.5)
    logger.error("boom")
    for h in root.handlers:
        h.flush()
    assert log_file.exists()
    lines = [json.loads(line) for line in
             log_file.read_text().strip().splitlines()]
    assert any("round_started" in ln["message"] for ln in lines)
    err_file = log_file.with_suffix(".error.log")
    assert err_file.exists()
    # reset handlers so later tests log normally
    setup_logging(level="WARNING")


def test_metrics_logger(tmp_path):
    path = tmp_path / "metrics.jsonl"
    ml = MetricsLogger(str(path))
    ml.log_round_metrics(3, {"loss": 0.5, "accuracy": 0.9})
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["tags"]["round"] == 3


# --- monitoring -------------------------------------------------------------------

def test_system_metrics_sample():
    m = collect_system_metrics()
    assert m.timestamp > 0
    assert 0 <= m.cpu_percent <= 100


def test_alert_rules_fire_and_callback():
    mgr = AlertManager()
    fired = []
    mgr.on_alert(fired.append)
    alerts = mgr.evaluate({"cpu_percent": 95.0, "memory_percent": 10.0,
                           "disk_percent": 10.0, "latency_ms": 9000.0})
    names = {a.name for a in alerts}
    assert names == {"high_cpu", "high_latency"}
    assert len(fired) == 2
    assert not mgr.evaluate({"cpu_percent": 10.0})


def test_custom_alert_rule():
    mgr = AlertManager(rules=[])
    mgr.add_rule(AlertRule("low_acc", "accuracy", 0.5, comparator="lt"))
    assert mgr.evaluate({"accuracy": 0.3})
    assert not mgr.evaluate({"accuracy": 0.9})


def test_performance_monitor_check():
    pm = PerformanceMonitor(interval_s=100)
    alerts = pm.check()
    assert isinstance(alerts, list)


# --- error tracking -----------------------------------------------------------------

def test_error_categorization():
    t = ErrorTracker()
    e1 = t.track_error(ConnectionError("connection refused by peer"))
    assert e1.category == ErrorCategory.NETWORK
    e2 = t.track_error(ValueError("privacy budget exhausted"))
    assert e2.category == ErrorCategory.PRIVACY
    assert e2.severity == ErrorSeverity.CRITICAL


def test_error_dedup_and_patterns():
    t = ErrorTracker()
    for _ in range(5):
        t.track_error(TimeoutError("connection timeout"), client_id="c")
    summary = t.get_error_summary()
    assert summary["unique_errors"] == 1
    assert summary["total_errors"] == 5
    patterns = t.detect_error_patterns()
    assert patterns and patterns[0].count == 5


def test_error_handler_context_manager():
    h = ErrorHandler()
    with pytest.raises(RuntimeError):
        with h.capture(client_id="cx", round_number=1):
            raise RuntimeError("training diverged with nan loss")
    assert h.tracker.get_error_summary()["total_errors"] == 1


# --- database --------------------------------------------------------------------------

def test_database_round_and_update_crud(tmp_path):
    repo = init_database(f"sqlite:///{tmp_path}/fl.db")
    repo.save_round(0, "in_progress", started_at=time.time())
    repo.save_client_update("a", 0, 100, 0.9)
    repo.save_client_update("b", 0, 300, 0.7)
    repo.save_round(0, "completed", completed_at=time.time(),
                    participating_clients=2, total_samples=400,
                    avg_training_loss=0.75, global_accuracy=0.8)
    rnd = repo.get_round(0)
    assert rnd["status"] == "completed"
    assert len(repo.get_round_updates(0)) == 2
    assert repo.list_rounds()[0]["round_number"] == 0


def test_database_clients_failures_models(tmp_path):
    repo = init_database(f"sqlite:///{tmp_path}/fl.db")
    repo.upsert_client("c1", compute_power="high", available_samples=500)
    repo.increment_participation("c1")
    assert repo.get_client("c1")["rounds_participated"] == 1
    repo.save_failure("c1", "timeout", action_taken="exclude_round",
                      round_number=2)
    assert repo.list_failures("c1")[0]["failure_type"] == "timeout"
    repo.save_global_model(3, "/models/round3.npz",
                           {"test_accuracy": 0.9}, 0.05)
    latest = repo.get_latest_global_model()
    assert latest["round_number"] == 3
    assert latest["model_path"].endswith(".npz")


def test_database_rejects_non_sqlite():
    with pytest.raises(ValueError, match="sqlite"):
        init_database("postgresql://host/db")


# --- capability adapter -------------------------------------------------------------------

def test_adapter_halves_batch_under_cpu_pressure():
    """ref: _adapt_for_cpu, capability_adapter.py:351-368."""
    adapter = CapabilityAdapter()
    cfg = FederatedTrainingConfig(batch_size=64, local_epochs=5)
    hot = ResourceMetrics(timestamp=0, cpu_percent=95.0, memory_percent=20.0)
    out = adapter.adapt_training_config(cfg, hot)
    assert out.batch_size == 32
    cool = ResourceMetrics(timestamp=0, cpu_percent=10.0, memory_percent=20.0)
    out2 = adapter.adapt_training_config(cfg, cool)
    assert out2.batch_size == 64


def test_adapter_memory_pressure_cuts_epochs():
    adapter = CapabilityAdapter()
    cfg = FederatedTrainingConfig(batch_size=32, local_epochs=5)
    out = adapter.adapt_training_config(
        cfg, ResourceMetrics(timestamp=0, cpu_percent=10.0,
                             memory_percent=95.0))
    assert out.batch_size == 16 and out.local_epochs == 4


def test_compute_power_assessment():
    adapter = CapabilityAdapter()
    small = ResourceMetrics(timestamp=0, cpu_cores=2)
    assert adapter.assess_compute_power(small) == ComputePowerLevel.LOW
    big = ResourceMetrics(timestamp=0, cpu_cores=16)
    assert adapter.assess_compute_power(big) == ComputePowerLevel.HIGH
    stressed = ResourceMetrics(timestamp=0, cpu_cores=16, cpu_percent=99.0)
    assert adapter.assess_compute_power(stressed) == ComputePowerLevel.MEDIUM
