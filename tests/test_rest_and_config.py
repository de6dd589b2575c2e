"""REST management API route tests + YAML config system tests + CLI
entry-point construction tests."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from fl_tpu.core.types import ModelUpdate, RoundConfig
from fl_tpu.orchestration.failure import FailureHandler, FailureType
from fl_tpu.orchestration.metrics import MetricsCollector
from fl_tpu.orchestration.round_manager import RoundManager
from fl_tpu.services.config import (
    DEFAULT_CLIENT_CONFIG,
    DEFAULT_COORDINATOR_CONFIG,
    apply_env_overrides,
    load_config,
    round_config_from,
    training_config_from,
)
from fl_tpu.services.rest_api import CoordinatorAPI


@pytest.fixture(scope="module")
def api():
    rm = RoundManager(round_config=RoundConfig(min_clients=2,
                                               timeout_seconds=60))
    rm.register_client("a")
    rm.register_client("b")
    api = CoordinatorAPI(round_manager=rm, metrics=MetricsCollector(),
                         failure_handler=FailureHandler(),
                         host="127.0.0.1", port=0)
    port = api.start_server()
    yield api, port
    api.stop_server()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=5) as r:
        return r.status, json.load(r)


def _post(port, path, body=None):
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                                 method="POST",
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.load(r)


def test_health_and_status(api):
    _, port = api
    code, body = _get(port, "/health")
    assert code == 200 and body["status"] == "healthy"
    code, body = _get(port, "/status")
    assert body["training"]["registered_clients"] == 2


def test_training_lifecycle_over_rest(api):
    instance, port = api
    code, body = _post(port, "/training/start")
    assert code == 200 and body["started"]
    rm = instance.round_manager
    rnd = rm.current_round.round_number
    rm.submit_update(ModelUpdate(
        client_id="a", round_number=rnd,
        model_weights={"w": np.ones(4, np.float32)}, num_samples=10,
        training_loss=0.5))
    rm.submit_update(ModelUpdate(
        client_id="b", round_number=rnd,
        model_weights={"w": np.zeros(4, np.float32)}, num_samples=10,
        training_loss=0.5))
    code, body = _get(port, "/training/rounds")
    assert body["rounds"][-1]["state"] == "completed"
    # stopping with no round in progress is a 409
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/training/stop")
    assert e.value.code == 409


def test_client_routes(api):
    _, port = api
    code, body = _get(port, "/clients")
    assert set(body["clients"]) >= {"a", "b"}
    code, body = _get(port, "/clients/a")
    assert body["client_id"] == "a"
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/clients/ghost")
    assert e.value.code == 404
    _post(port, "/clients/a/exclude")
    code, body = _get(port, "/clients/a/health")
    assert body["excluded"]
    _post(port, "/clients/a/include")
    code, body = _get(port, "/clients/a/health")
    assert not body["excluded"]


def test_config_routes(api):
    _, port = api
    code, body = _get(port, "/config")
    assert body["min_clients"] == 2
    code, body = _post(port, "/config/privacy",
                       {"epsilon": 2.0, "delta": 1e-6})
    assert body["epsilon"] == 2.0
    code, body = _get(port, "/config/privacy")
    assert body["epsilon"] == 2.0
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/config/privacy", {"epsilon": -1.0, "delta": 1e-6})
    assert e.value.code == 400


def test_failures_and_admin_routes(api):
    instance, port = api
    instance.failure_handler.handle_failure("a", FailureType.TIMEOUT)
    code, body = _get(port, "/failures")
    assert body["failures"][-1]["type"] == "timeout"
    code, body = _get(port, "/failures/statistics")
    assert body["total_failures"] >= 1
    code, body = _post(port, "/admin/reset")
    assert body["reset"]
    code, body = _get(port, "/admin/logs")
    assert isinstance(body["logs"], list)


def test_prometheus_exposition(api):
    _, port = api
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/metrics/prometheus", timeout=5
    ) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    assert "fl_current_round" in text
    assert "# TYPE fl_registered_clients gauge" in text


def test_unknown_route_404(api):
    _, port = api
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/teapot")
    assert e.value.code == 404


# --- config system ----------------------------------------------------------------

def test_load_config_merges_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("training:\n  min_clients: 7\nserver:\n  grpc_port: 6000\n")
    cfg = load_config(str(p), DEFAULT_COORDINATOR_CONFIG)
    assert cfg["training"]["min_clients"] == 7
    assert cfg["server"]["grpc_port"] == 6000
    assert cfg["training"]["max_clients"] == 50  # default preserved


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("CLIENT_ID", "env-client")
    monkeypatch.setenv("COORDINATOR_HOST", "10.0.0.5")
    monkeypatch.setenv("COORDINATOR_PORT", "6001")
    cfg = apply_env_overrides(DEFAULT_CLIENT_CONFIG, "client")
    assert cfg["client"]["id"] == "env-client"
    assert cfg["client"]["coordinator_host"] == "10.0.0.5"
    assert cfg["client"]["coordinator_port"] == 6001


def test_round_and_training_config_builders():
    rc = round_config_from(DEFAULT_COORDINATOR_CONFIG)
    assert rc.min_clients == 2 and rc.local_epochs == 5
    assert rc.privacy_config is not None
    assert rc.privacy_config.epsilon == 1.0
    tc = training_config_from(DEFAULT_CLIENT_CONFIG)
    assert tc.batch_size == 32 and tc.optimizer_type == "adam"


def test_ships_reference_schema_yamls():
    """The shipped config files honor the reference schema + defaults
    (config/coordinator.yaml:1-40, config/client.yaml:1-39)."""
    cfg = load_config("config/coordinator.yaml", DEFAULT_COORDINATOR_CONFIG)
    assert cfg["server"]["grpc_port"] == 50051
    assert cfg["server"]["http_port"] == 8080
    assert cfg["training"]["max_clients"] == 50
    assert cfg["privacy"]["epsilon"] == 1.0
    ccfg = load_config("config/client.yaml", DEFAULT_CLIENT_CONFIG)
    assert ccfg["model"]["name"] == "simple_cnn"
    assert ccfg["training"]["local_epochs"] == 5
    assert ccfg["checkpoints"]["every_rounds"] == 5
